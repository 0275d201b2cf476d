"""Why does tile=32 bias 2/256 stress-scene rays that tile=16 gets exact?

Reproduces the audit setup (tools/audit_train_budget.py), finds the rays
where the t32 trace disagrees with the cached oracle, then dumps their
per-segment select bookkeeping at t16 vs t32.

CPU-runnable:  python tools/_diag_t32.py
"""
import dataclasses
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import irgs_tpu  # noqa: F401
from irgs_tpu.config import Config
from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.render import ir
from irgs_tpu.scene import toy
from irgs_tpu.utils import math3d

N_RAYS = 256
params, aux = toy.make_sphere_scene(n_surface=100_000, n_capacity=2 ** 17,
                                    env_resolution=64)
k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
idx = jax.random.randint(k1, (N_RAYS,), 0, 100_000)
ro = params.xyz[idx] + 0.05 * jax.random.normal(k2, (N_RAYS, 3))
rd = jax.random.normal(k3, (N_RAYS, 3))
rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

s = params.get_scaling()
Rm = math3d.quat_to_rotmat(params.rotation)
inputs = gt.TraceInputs(
    means3d=params.xyz,
    opacity=jnp.where(aux.alive, params.get_opacity()[:, 0], 0.0),
    ru=Rm[:, :, 0] / s[:, 0:1], rv=Rm[:, :, 1] / s[:, 1:2],
    normals=params.world_normals(cam_pos=jnp.zeros(3)),
    shs=params.get_features(), features=jnp.zeros((2 ** 17, 0)))

z = np.load("/tmp/audit_oracle_cpu_256.npz")
ref = gt.TraceOut(*[jnp.asarray(z[f]) for f in gt.TraceOut._fields])

cfg = Config()
tc32 = gt.TracerConfig.from_pipe(cfg.pipe)
tc16 = dataclasses.replace(tc32, tile=16, select_tiles=48,
                           retrace_select_tiles=48)

grid = gt.build_grid_from_gaussians(params, aux, tc32)
out32 = ir.make_trace_fn(params, aux, grid, tc32, jnp.zeros(3), 3)(ro, rd)
d = np.asarray(jnp.abs(out32.color - ref.color).max(-1))
bad = np.nonzero(d > 0.05)[0]
print("bad rays:", bad, "d:", d[bad])

for b in bad[:2]:
    rob = ro[b:b + 1]
    rdb = rd[b:b + 1]
    for name, tc in (("t16", tc16), ("t32", tc32)):
        print(f"\n===== ray {b} {name} =====")
        pair_tab = gt.pack_pair_table(grid, inputs, tc.tile)
        t_start = None
        skip = None
        t0 = None
        for seg in range(4):
            cells = gt.collect_cells(rob, rdb, grid, tc, t_start=t_start)
            hits = gt.select_hits_tiled(rob, rdb, grid, cells, pair_tab, tc,
                                        False, t_start=t_start,
                                        cand_skip=skip)
            out = gt.blend_hits(rob, rdb, inputs, hits.gs, hits.valid, tc, 3,
                                t0=t0)
            TILE = tc.tile
            counts = np.asarray(cells.counts[0])
            starts = np.asarray(cells.starts[0])
            nz = counts > 0
            tcnt = np.where(nz, (starts % TILE + counts + TILE - 1) // TILE,
                            0)
            print(f"seg{seg}: nonzero_cells={int(nz.sum())} "
                  f"cand={int(counts.sum())} tiles_needed={int(tcnt.sum())} "
                  f"ST={tc.select_tiles} trunc={bool(cells.truncated[0])} "
                  f"resume={float(cells.resume[0]):.4f}")
            print(f"   more={bool(hits.more[0])} "
                  f"t_last={float(hits.t_last[0]):.4f} "
                  f"t_cell={float(hits.t_cell[0]):.4f} "
                  f"cand_skip={int(hits.cand_skip[0])} "
                  f"n_valid={int(hits.valid[0].sum())} "
                  f"alpha={float(out.alpha[0]):.4f} "
                  f"trans={float(out.trans[0]):.4f}")
            t_start = hits.t_cell
            skip = hits.cand_skip
            t0 = out.trans if t0 is None else t0 * out.trans
            if not bool(hits.more[0]):
                break
        print(f" oracle alpha={float(ref.alpha[b]):.4f} "
              f"color={np.asarray(ref.color[b])} ")
        print(f" prod({name}) via trace_fn full:")
    o16 = ir.make_trace_fn(params, aux, grid, tc16, jnp.zeros(3), 3)(rob, rdb)
    print(f" full t16 alpha={float(o16.alpha[0]):.4f} "
          f"t32 alpha={float(out32.alpha[b]):.4f}")
