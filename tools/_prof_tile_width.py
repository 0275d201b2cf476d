"""On-device speed ladder: tiled select cost vs tile width (16/32/64) and
segment-list mode (packed / direct), at eval budgets, 32k-ray dispatch.
Coverage held at ~768-1024 candidate lanes per ray. CHAINED timing.
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

import irgs_tpu  # noqa
from irgs_tpu.config import Config
from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.scene import toy
from irgs_tpu.utils import math3d

print("devices:", jax.devices(), flush=True)

params, aux = toy.make_sphere_scene(n_surface=100_000, n_capacity=2 ** 17,
                                    env_resolution=128)
base = gt.TracerConfig.from_pipe(Config().pipe, eval=True)
s = params.get_scaling()
Rm = math3d.quat_to_rotmat(params.rotation)
inputs = gt.TraceInputs(
    means3d=params.xyz,
    opacity=jnp.where(aux.alive, params.get_opacity()[:, 0], 0.0),
    ru=Rm[:, :, 0] / s[:, 0:1], rv=Rm[:, :, 1] / s[:, 1:2],
    normals=params.world_normals(cam_pos=jnp.zeros(3)),
    shs=params.get_features(), features=jnp.zeros((2 ** 17, 0)))

R = 2 ** 15
k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
idx = jax.random.randint(k1, (R,), 0, 100_000)
ro0 = params.xyz[idx] + 0.05 * jax.random.normal(k2, (R, 3))
rd0 = jax.random.normal(k3, (R, 3))
rd0 /= jnp.linalg.norm(rd0, axis=-1, keepdims=True)


def bench_chain(step, state0, n=6, tag=""):
    st = step(state0)
    np.asarray(jax.tree.leaves(st)[0].ravel()[0])
    t0 = time.time()
    for _ in range(n):
        st = step(st)
    for leaf in jax.tree.leaves(st):
        np.asarray(leaf.ravel()[0])
    dt = (time.time() - t0) / n
    print(f"{tag}: {dt*1e3:7.1f} ms/{R} rays ({R/dt/1e6:.3f} Mrays/s)",
          flush=True)
    return dt


VARIANTS = [
    ("t16x48 packed", dataclasses.replace(base, tile=16, select_tiles=48,
                                          tiled_direct=False)),
    ("t16x48 direct", dataclasses.replace(base, tile=16, select_tiles=48,
                                          tiled_direct=True)),
    ("t32x24 direct", dataclasses.replace(base, tile=32, select_tiles=24,
                                          tiled_direct=True)),
    ("t32x32 direct", dataclasses.replace(base, tile=32, select_tiles=32,
                                          tiled_direct=True)),
    ("t64x12 direct", dataclasses.replace(base, tile=64, select_tiles=12,
                                          tiled_direct=True)),
    ("t64x16 direct", dataclasses.replace(base, tile=64, select_tiles=16,
                                          tiled_direct=True)),
    ("t64x16 dir+topk", dataclasses.replace(base, tile=64, select_tiles=16,
                                            tiled_direct=True,
                                            select_topk=True)),
    ("t128x6 direct", dataclasses.replace(base, tile=128, select_tiles=6,
                                          tiled_direct=True)),
    ("t128x8 direct", dataclasses.replace(base, tile=128, select_tiles=8,
                                          tiled_direct=True)),
]

grid = gt.build_grid_from_gaussians(params, aux, base)
jax.block_until_ready(grid.cell_meta)
print("grid done, overflow:", int(grid.overflow), flush=True)

for name, tc in VARIANTS:
    pair_tab = jax.jit(gt.pack_pair_table,
                       static_argnames=("tile",))(grid, inputs, tc.tile)
    jax.block_until_ready(pair_tab)

    @jax.jit
    def step_sel(st, tc=tc, pair_tab=pair_tab):
        ro, _ = st
        cells = gt.collect_cells(ro, rd0, grid, tc)
        hits = gt.select_hits_tiled(ro, rd0, grid, cells, pair_tab, tc,
                                    False)
        sig = jnp.sum(hits.t_last) * 1e-6
        return (ro + 1e-7 * sig, sig)

    @jax.jit
    def step_blend(st, tc=tc, pair_tab=pair_tab):
        ro, _ = st
        cells = gt.collect_cells(ro, rd0, grid, tc)
        hits = gt.select_hits_tiled(ro, rd0, grid, cells, pair_tab, tc,
                                    False)
        out = gt.blend_hits(ro, rd0, inputs, hits.gs, hits.valid, tc, 3)
        sig = jnp.sum(out.alpha) * 1e-6
        return (ro + 1e-7 * sig, sig)

    st0 = (ro0, jnp.float32(0))
    d1 = bench_chain(step_sel, st0, tag=f"[{name}] collect+select")
    d2 = bench_chain(step_blend, st0, tag=f"[{name}] +blend")
