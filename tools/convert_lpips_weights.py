"""Convert VGG16 + LPIPS weights to the npz irgs_tpu.eval.metrics consumes.

This image has no network egress and ships neither torchvision nor the
pretrained weights, so run this once on any machine that has them:

    python tools/convert_lpips_weights.py --out lpips_vgg.npz \
        [--vgg16 /path/to/vgg16-397923af.pth] [--lin /path/to/vgg.pth]

With no paths given it tries `torchvision.models.vgg16(weights=IMAGENET1K_V1)`
and the lpips v0.1 linear weights from the PerceptualSimilarity repo (the
same URL lpipsPyTorch/modules/utils.py:11-19 downloads). Then:

    IRGS_TPU_VGG16_NPZ=lpips_vgg.npz python render.py -m <model>

npz layout: conv{i}_w [O,I,3,3], conv{i}_b [O] for the 13 VGG16 convs in
features order; lin{i}_w [C_i] for the 5 lpips 1x1 linear layers.
"""

import argparse

import numpy as np
import torch

LIN_URL = ("https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
           "master/lpips/weights/v0.1/vgg.pth")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--vgg16", default="", help="vgg16 state_dict .pth")
    ap.add_argument("--lin", default="", help="lpips v0.1 vgg.pth")
    args = ap.parse_args()

    if args.vgg16:
        sd = torch.load(args.vgg16, map_location="cpu")
        if "state_dict" in sd:
            sd = sd["state_dict"]
    else:
        from torchvision import models
        sd = models.vgg16(weights=models.VGG16_Weights.IMAGENET1K_V1).state_dict()

    out = {}
    conv_keys = sorted(
        (k for k in sd if k.startswith("features.") and k.endswith(".weight")),
        key=lambda k: int(k.split(".")[1]))
    for i, wk in enumerate(conv_keys):
        bk = wk.replace("weight", "bias")
        out[f"conv{i}_w"] = sd[wk].numpy().astype(np.float32)
        out[f"conv{i}_b"] = sd[bk].numpy().astype(np.float32)
    assert len(conv_keys) == 13, f"expected 13 VGG16 convs, got {len(conv_keys)}"

    if args.lin:
        lin_sd = torch.load(args.lin, map_location="cpu")
    else:
        lin_sd = torch.hub.load_state_dict_from_url(LIN_URL, map_location="cpu")
    # keys like 'lin0.model.1.weight' [1, C, 1, 1]
    for i in range(5):
        key = next(k for k in lin_sd if k.startswith(f"lin{i}"))
        out[f"lin{i}_w"] = lin_sd[key].numpy().reshape(-1).astype(np.float32)

    np.savez(args.out, **out)
    print(f"wrote {args.out}: {len(out)} arrays")


if __name__ == "__main__":
    main()
