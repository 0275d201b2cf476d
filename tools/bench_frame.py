"""Time ONE full-resolution NVS eval frame end-to-end (VERDICT r2 item #1:
"a measured sec/frame for one 800^2 NVS frame").

Renders one 800x800 view of the 100k-surfel toy sphere scene through the
production eval path (render_ir_eval: fg-compacted chunks, shipping eval
tracer budgets, reference sample counts diffuse 512 + light 256) and reports
wall-clock + effective Mrays/s. Per-chunk dispatch means a device fault
costs one chunk, not the frame.

Run solo on the TPU:  python tools/bench_frame.py [--img 800] [--spp 512 256]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

import irgs_tpu  # noqa: F401
from irgs_tpu.config import Config
from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.render.eval import EvalConfig, render_ir_eval
from irgs_tpu.scene import toy

ap = argparse.ArgumentParser()
ap.add_argument("--img", type=int, default=800)
ap.add_argument("--n", type=int, default=100_000)
ap.add_argument("--spp", type=int, nargs=2, default=(512, 256),
                metavar=("DIFFUSE", "LIGHT"))
args = ap.parse_args()

print("devices:", jax.devices(), flush=True)

params, aux = toy.make_sphere_scene(n_surface=args.n, n_capacity=2 ** 17,
                                    env_resolution=128)
cams = toy.make_ring_cameras(1, width=args.img, height_px=args.img)
cam = cams[0].params()

pipe = Config().pipe
ecfg = EvalConfig(img_w=args.img, img_h=args.img, active_sh_degree=3,
                  diffuse_sample_num=args.spp[0], light_sample_num=args.spp[1],
                  tracer=gt.TracerConfig.from_pipe(pipe, eval=True))
grid = gt.build_grid_from_gaussians(params, aux, ecfg.tracer)
jax.block_until_ready(grid.cell_meta)
print("grid built, overflow:", int(grid.overflow), flush=True)

# cold frame (includes every compile)
t0 = time.time()
out = render_ir_eval(params, aux, grid, cam, ecfg)
np.asarray(out["render"])
cold = time.time() - t0

# warm frame
t0 = time.time()
out = render_ir_eval(params, aux, grid, cam, ecfg)
render = np.asarray(out["render"])
warm = time.time() - t0

fg = int((np.asarray(out["rend_alpha"][..., 0]) > 0).sum())
rays = fg * sum(args.spp)
res = {
    "frame_img": args.img,
    "fg_pixels": fg,
    "rays_per_frame": rays,
    "cold_s": round(cold, 1),
    "warm_s": round(warm, 1),
    "mrays_per_sec": round(rays / warm / 1e6, 3),
}
print(json.dumps(res), flush=True)
