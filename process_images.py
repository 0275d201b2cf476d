"""Image munging utilities for paper figures and relit outputs.

Generic, path-parameterized replacement for the reference's one-off scripts
(`process_map.py`: split a vertically stacked vis grid into per-panel images
with max-normalization; `process_enerf_relit.py`: batch resize + crop of
relit frame folders — both hardcode absolute paths and crop constants).

Usage:
    python process_images.py split-grid 020000_env.png --rows 2 --padding 10
    python process_images.py crop <in_dir> <out_dir> \
        --downscale 4 --crop 115 25 85 35 [--suffix _for_paper]
"""

import argparse
import os

import numpy as np
from PIL import Image


def split_grid(args):
    img = np.asarray(Image.open(args.image).convert("RGB"), np.float32) / 255.0
    h_total, w = img.shape[:2]
    pad = args.padding
    h_each = (h_total - (args.rows + 1) * pad) // args.rows
    base = os.path.splitext(args.image)[0]
    for r in range(args.rows):
        top = pad + r * (h_each + pad)
        panel = img[top:top + h_each, pad:w - pad]
        if args.normalize and r > 0:
            panel = panel / max(panel.max(), 1e-8)
        out = f"{base}_panel{r}.png"
        Image.fromarray((np.clip(panel, 0, 1) * 255).astype(np.uint8)).save(out)
        print("wrote", out)


def crop(args):
    left, top, right, bottom = args.crop
    os.makedirs(args.out_dir, exist_ok=True)
    n = 0
    for root, _, files in os.walk(args.in_dir):
        for fn in sorted(files):
            if not fn.lower().endswith((".png", ".jpg", ".jpeg")):
                continue
            with Image.open(os.path.join(root, fn)) as im:
                if args.downscale > 1:
                    im = im.resize((im.width // args.downscale,
                                    im.height // args.downscale), Image.LANCZOS)
                im = im.crop((left, top, im.width - right, im.height - bottom))
                im.save(os.path.join(args.out_dir, fn))
                n += 1
    print(f"processed {n} images -> {args.out_dir}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("split-grid")
    g.add_argument("image")
    g.add_argument("--rows", type=int, default=2)
    g.add_argument("--padding", type=int, default=10)
    g.add_argument("--normalize", action="store_true", default=True)
    g.set_defaults(fn=split_grid)
    c = sub.add_parser("crop")
    c.add_argument("in_dir")
    c.add_argument("out_dir")
    c.add_argument("--downscale", type=int, default=1)
    c.add_argument("--crop", type=int, nargs=4, default=(0, 0, 0, 0),
                   metavar=("LEFT", "TOP", "RIGHT", "BOTTOM"))
    c.set_defaults(fn=crop)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
