"""Stage-1 TPU bench: per-phase step throughput at the reference workload.

Times each stage-1 phase (initial / volume / surfel) as chained jitted steps
(the axon backend memoizes repeated identical dispatches, so each iteration
must consume the previous state), plus one densify_and_prune and one TSDF
reconstruct+extract, at 400x400 / 100k-gaussian scale (the same workload
class as the stage-2 bench; reference runs 50k stage-1 iters,
train_refgaussian.py:101-255).

Run solo on the TPU:  python tools/bench_stage1.py [--img 400] [--n 100000]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import irgs_tpu  # noqa: F401
from irgs_tpu.config import stage1_config
from irgs_tpu.scene import cubemap as cm
from irgs_tpu.scene import ref_gaussians as rgs
from irgs_tpu.scene import toy
from irgs_tpu.train import densify as D
from irgs_tpu.train import stage1_full as s1

ap = argparse.ArgumentParser()
ap.add_argument("--img", type=int, default=400)
ap.add_argument("--n", type=int, default=100_000)
ap.add_argument("--iters", type=int, default=10)
args = ap.parse_args()

cfg = stage1_config()
opt = cfg.opt
IMG = args.img

rs = np.random.RandomState(0)
pts = rs.uniform(-1.2, 1.2, (args.n, 3)).astype(np.float32)
colors = rs.uniform(0.2, 0.8, (args.n, 3)).astype(np.float32)
params, aux = rgs.init_ref_from_pcd(
    pts, colors, 2 ** 17, 3, env_res=128,
    init_metallic=opt.init_metallic_value,
    init_roughness=opt.init_roughness_value)
optimizer = s1.make_ref_optimizer(opt, 3.3)
state0 = s1.Stage1State(params, aux, optimizer.init(params), jnp.int32(0))
cams = toy.make_ring_cameras(8, width=IMG, height_px=IMG)
cam_params = [c.params() for c in cams]
gt = jnp.full((IMG, IMG, 3), 0.5)
fg_lut = cm.compute_fg_lut()

results = {}
for phase in ("initial", "volume", "surfel"):
    st = s1.Stage1FullStatic(
        img_w=IMG, img_h=IMG, active_sh_degree=3, white_background=False,
        phase=phase, use_indirect=False, dup_capacity=2 ** 20,
        lambda_dssim=opt.lambda_dssim,
        lambda_normal_render_depth=opt.lambda_normal_render_depth,
        lambda_normal_smooth=opt.lambda_normal_smooth)
    state, _ = s1.stage1_full_step(state0, cam_params[0], gt, None, fg_lut,
                                   None, st=st, optimizer=optimizer)
    jax.block_until_ready(state.params.xyz)
    np.asarray(state.params.xyz[0])  # force materialization
    t0 = time.time()
    for i in range(1, args.iters + 1):
        state, metrics = s1.stage1_full_step(
            state, cam_params[i % len(cams)], gt, None, fg_lut, None,
            st=st, optimizer=optimizer)
    np.asarray(state.params.xyz.ravel()[0])
    dt = (time.time() - t0) / args.iters
    results[f"stage1_{phase}_iters_per_sec"] = round(1.0 / dt, 3)
    print(f"{phase}: {dt*1e3:.0f} ms/step ({1/dt:.2f} iter/s)", flush=True)

# densify (host-level op between steps, every 100 iters in the schedule)
t0 = time.time()
p2, a2, o2, stats = D.densify_and_prune(
    state.params, state.aux, state.opt_state, jax.random.PRNGKey(1),
    grad_threshold=opt.densify_grad_threshold,
    min_opacity=opt.prune_opacity_threshold, extent=3.3,
    max_screen_size=20, percent_dense=opt.percent_dense)
np.asarray(p2.xyz.ravel()[0])
dt_d = time.time() - t0
print(f"densify_and_prune: {dt_d*1e3:.0f} ms (incl. compile)", flush=True)

t0 = time.time()
p3, a3, o3, stats = D.densify_and_prune(
    p2, a2, o2, jax.random.PRNGKey(2),
    grad_threshold=opt.densify_grad_threshold,
    min_opacity=opt.prune_opacity_threshold, extent=3.3,
    max_screen_size=20, percent_dense=opt.percent_dense)
np.asarray(p3.xyz.ravel()[0])
dt_d = time.time() - t0
results["stage1_densify_ms"] = round(dt_d * 1e3, 1)
print(f"densify_and_prune warm: {dt_d*1e3:.0f} ms", flush=True)

# TSDF refresh (every mesh_interval=2000 iters in the reference schedule,
# train_refgaussian.py:236-249): render all train views + fuse + no extract
t0 = time.time()
vol = s1.reconstruct_tsdf(p3, a3, cams, img_w=IMG, img_h=IMG,
                          active_sh_degree=3, mesh_res=128,
                          cameras_extent=3.3, dup_capacity=2 ** 20)
np.asarray(vol.tsdf.ravel()[0])
dt_t = time.time() - t0
results["stage1_tsdf_refresh_s"] = round(dt_t, 2)
print(f"tsdf refresh ({len(cams)} views, 128^3): {dt_t:.1f} s "
      "(incl. compile)", flush=True)

print(json.dumps(results), flush=True)
