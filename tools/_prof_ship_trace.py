"""FULL shipping trace_fn throughput (train + eval budgets), f32 vs bf16
pair table. Chained timing (the axon backend memoizes repeated dispatches);
run SOLO on the real chip: python tools/_prof_ship_trace.py"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

import irgs_tpu  # noqa
from irgs_tpu.config import Config
from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.render import ir
from irgs_tpu.scene import toy
from irgs_tpu.utils import math3d

print("devices:", jax.devices(), flush=True)
params, aux = toy.make_sphere_scene(n_surface=100_000, n_capacity=2**17,
                                    env_resolution=128)
tc0 = gt.TracerConfig.from_pipe(Config().pipe, eval=True)
grid = gt.build_grid_from_gaussians(params, aux, tc0)
jax.block_until_ready(grid.cell_meta)
print("grid done, overflow:", int(grid.overflow), flush=True)

k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
R2 = 2**16
idx = jax.random.randint(k1, (R2,), 0, 100_000)
roL = params.xyz[idx] + 0.05 * jax.random.normal(k2, (R2, 3))
rdL = jax.random.normal(k3, (R2, 3))
rdL /= jnp.linalg.norm(rdL, axis=-1, keepdims=True)


def bench_chain(step, state0, n=4, tag="", rays=R2):
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


variants = []
for ev in (False, True):
    tc = gt.TracerConfig.from_pipe(Config().pipe, eval=ev)
    name = "SHIP_eval" if ev else "SHIP_train"
    variants.append((name, tc))
    variants.append((name + "_bf16", dataclasses.replace(tc, table_bf16=True)))
# eval ladder A/B at equal lane budgets: tile width 64 (half the gather
# rows), top_k k-buffer extraction, and both
tc_e = gt.TracerConfig.from_pipe(Config().pipe, eval=True)
variants += [
    ("EVAL_tile64", dataclasses.replace(
        tc_e, tile=64, select_tiles=tc_e.select_tiles // 2,
        retrace_select_tiles=tc_e.retrace_select_tiles // 2)),
    ("EVAL_topk", dataclasses.replace(tc_e, select_topk=True)),
    ("EVAL_tile64_topk_bf16", dataclasses.replace(
        tc_e, tile=64, select_tiles=tc_e.select_tiles // 2,
        retrace_select_tiles=tc_e.retrace_select_tiles // 2,
        select_topk=True, table_bf16=True)),
]

for name, tc in variants:
    fn = ir.make_trace_fn(params, aux, grid, tc, jnp.zeros(3), 3)

    @jax.jit
    def step_full(st, fn=fn):
        ro, _ = st
        out = fn(ro, rdL)
        sig = jnp.sum(out.alpha) * 1e-6
        return ro * (1.0 + 1e-6 * jnp.tanh(sig)), sig

    bench_chain(step_full, (roL, jnp.float32(0)), tag=f"[{name}] FULL trace_fn")
