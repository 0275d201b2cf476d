"""DP cost accounting (VERDICT r3 item #10): measure the serial per-iter
grid rebuild (train.py `if lr_scale > 0` path) against the DP step itself
on the virtual 8-device mesh.

Context: stage-2's DEFAULT is lr_scale = 0.0 (matching reference
arguments/__init__.py:117) — geometry is frozen and the grid is built ONCE,
so the rebuild cost is zero on the shipping path. This measures the
geometry-refining variant (lr_scale > 0), where the reference refits its
OptiX GAS every iteration (train.py:150-154) and we rebuild the uniform
grid: the rebuild is one jitted XLA dispatch (not host compute), but it is
SERIAL between DP steps.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python tools/_prof_dp_grid.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

# the axon plugin ignores the JAX_PLATFORMS env var; force via config
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import irgs_tpu  # noqa: F401
from irgs_tpu.config import Config
from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.parallel import dp as dpm
from irgs_tpu.scene import toy
from irgs_tpu.scene.cameras import stack_camera_params
from irgs_tpu.train import stage2 as s2

N_DEV = len(jax.devices())
print("devices:", N_DEV, jax.devices()[0].platform, flush=True)

params, aux = toy.make_sphere_scene(n_surface=20_000, n_capacity=2 ** 15,
                                    env_resolution=64)
cams = toy.make_ring_cameras(N_DEV, width=128, height_px=128)
cfg = Config()
cfg.pipe.diffuse_sample_num = 32
cfg.opt.trace_num_rays = 2 ** 13
cfg.pipe.tracer_grid_res = 24
cfg.pipe.dup_capacity = 2 ** 18
st = s2.from_configs(cfg, img_w=128, img_h=128)
import dataclasses
st = dataclasses.replace(st, tracer=dataclasses.replace(
    st.tracer, pair_capacity=2 ** 18))

state, optimizer = s2.init_state(params, aux, cfg.opt)
mesh = dpm.make_mesh(N_DEV)
dp_step = dpm.stage2_dp_step(mesh, st, optimizer)

cam_b = stack_camera_params(cams)
gt_b = jnp.stack([jnp.full((128, 128, 3), 0.4)] * N_DEV)
grid = gt.build_grid_from_gaussians(state.params, state.aux, st.tracer)
jax.block_until_ready(grid.cell_meta)


def timed(fn, n=6, tag=""):
    fn()  # warm/compile
    t0 = time.time()
    last = None
    for _ in range(n):
        last = fn()
    for leaf in jax.tree.leaves(last):
        np.asarray(leaf).ravel()[:1]
    dt = (time.time() - t0) / n
    print(f"{tag}: {dt*1e3:8.1f} ms", flush=True)
    return dt


keys = jax.random.split(jax.random.PRNGKey(0), N_DEV)
stref = [state]


def step_fn():
    s, m = dp_step(stref[0], grid, cam_b, gt_b, keys)
    stref[0] = s
    return m


def rebuild_fn():
    # perturbed params each call (memoization-safe chained timing)
    p = dataclasses.replace(stref[0].params,
                            xyz=stref[0].params.xyz * (1 + 1e-7))
    g = gt.build_grid_from_gaussians(p, stref[0].aux, st.tracer)
    return g.cell_meta


t_step = timed(step_fn, tag=f"dp_step ({N_DEV}-dev mesh)")
t_grid = timed(rebuild_fn, tag="grid rebuild (serial)")
print(f"rebuild / step = {t_grid / t_step:.2%} "
      f"(shipping path lr_scale=0 rebuilds never)", flush=True)
