"""Focused on-device A/B: tiled select cost after the pair-table width pad
(224 -> 256 lanes), at the shipping eval budget, for 8k and 32k ray
dispatches. CHAINED timing (see _prof_eval_tracer.py).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

import irgs_tpu  # noqa
from irgs_tpu.config import Config
from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.render import ir
from irgs_tpu.scene import toy
from irgs_tpu.utils import math3d

print("devices:", jax.devices(), flush=True)

params, aux = toy.make_sphere_scene(n_surface=100_000, n_capacity=2 ** 17,
                                    env_resolution=128)
tc = gt.TracerConfig.from_pipe(Config().pipe, eval=True)
grid = gt.build_grid_from_gaussians(params, aux, tc)
jax.block_until_ready(grid.cell_meta)
print("grid done, overflow:", int(grid.overflow), "tile cfg:",
      tc.select_tiles, tc.tile, flush=True)

s = params.get_scaling()
Rm = math3d.quat_to_rotmat(params.rotation)
inputs = gt.TraceInputs(
    means3d=params.xyz,
    opacity=jnp.where(aux.alive, params.get_opacity()[:, 0], 0.0),
    ru=Rm[:, :, 0] / s[:, 0:1], rv=Rm[:, :, 1] / s[:, 1:2],
    normals=params.world_normals(cam_pos=jnp.zeros(3)),
    shs=params.get_features(), features=jnp.zeros((2 ** 17, 0)))
pair_tab = gt.pack_pair_table(grid, inputs, tc.tile)
print("pair_tab shape:", pair_tab.shape, flush=True)


def bench_chain(step, state0, n=6, tag="", rays=0):
    st = step(state0)
    np.asarray(jax.tree.leaves(st)[0].ravel()[0])
    t0 = time.time()
    for _ in range(n):
        st = step(st)
    for leaf in jax.tree.leaves(st):
        np.asarray(leaf.ravel()[0])
    dt = (time.time() - t0) / n
    print(f"{tag}: {dt*1e3:7.1f} ms/{rays} rays ({rays/dt/1e6:.3f} Mrays/s)",
          flush=True)
    return dt


for R in (2 ** 13, 2 ** 15):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    idx = jax.random.randint(k1, (R,), 0, 100_000)
    ro0 = params.xyz[idx] + 0.05 * jax.random.normal(k2, (R, 3))
    rd0 = jax.random.normal(k3, (R, 3))
    rd0 /= jnp.linalg.norm(rd0, axis=-1, keepdims=True)

    def perturb(ro, sig):
        return ro + 1e-7 * sig

    @jax.jit
    def step_collect(st):
        ro, _ = st
        cells = gt.collect_cells(ro, rd0, grid, tc)
        sig = jnp.sum(cells.tin[:, 0]) * 1e-6
        return (perturb(ro, sig), sig)

    @jax.jit
    def step_select(st):
        ro, _ = st
        cells = gt.collect_cells(ro, rd0, grid, tc)
        hits = gt.select_hits_tiled(ro, rd0, grid, cells, pair_tab, tc, False)
        sig = jnp.sum(hits.t_last) * 1e-6
        return (perturb(ro, sig), sig)

    @jax.jit
    def step_blend(st):
        ro, _ = st
        cells = gt.collect_cells(ro, rd0, grid, tc)
        hits = gt.select_hits_tiled(ro, rd0, grid, cells, pair_tab, tc, False)
        out = gt.blend_hits(ro, rd0, inputs, hits.gs, hits.valid, tc, 3)
        sig = jnp.sum(out.alpha) * 1e-6
        return (perturb(ro, sig), sig)

    st0 = (ro0, jnp.float32(0))
    d1 = bench_chain(step_collect, st0, tag=f"[pad R={R}] collect", rays=R)
    d2 = bench_chain(step_select, st0, tag=f"[pad R={R}] +select", rays=R)
    d3 = bench_chain(step_blend, st0, tag=f"[pad R={R}] +blend", rays=R)
    print(f"[pad R={R}] -> select ~{1e3*(d2-d1):.1f} ms, "
          f"blend ~{1e3*(d3-d2):.1f} ms", flush=True)

# full production eval trace at 2^16
R2 = 2 ** 16
k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
idx = jax.random.randint(k1, (R2,), 0, 100_000)
ro2 = params.xyz[idx] + 0.05 * jax.random.normal(k2, (R2, 3))
rd2 = jax.random.normal(k3, (R2, 3))
rd2 /= jnp.linalg.norm(rd2, axis=-1, keepdims=True)
env = jnp.ones((64, 128, 3))


@jax.jit
def step_full(st):
    ro, _ = st
    out = gt.trace_segments(ro, rd2, grid, inputs, cfg=tc, sh_deg=3)
    sig = jnp.sum(out.alpha) * 1e-6
    return (ro + 1e-7 * sig, sig)


st0 = (ro2, jnp.float32(0))
bench_chain(step_full, st0, tag="[pad FULL eval] trace_segments", rays=R2)
