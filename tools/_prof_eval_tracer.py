"""Component profile of the tracer at EVAL budgets — CHAINED timing.

The axon backend memoizes repeated executions and block_until_ready does not
synchronize, so every timed iteration perturbs its input with a value derived
from the previous output, and a final host fetch closes the chain.

Run solo on the real chip:  python tools/_prof_eval_tracer.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
import irgs_tpu  # noqa
from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.scene import toy
from irgs_tpu.utils import math3d

print("devices:", jax.devices(), flush=True)

params, aux = toy.make_sphere_scene(n_surface=100_000, n_capacity=2**17,
                                    env_resolution=128)
tc_eval = gt.TracerConfig(grid_res=48, pair_capacity=2**21, max_cells=24,
                          max_hits=256, hit_budget=32, max_crossings=0,
                          n_segments=3, retrace_frac=0.5)
tc_train = gt.TracerConfig(grid_res=48, pair_capacity=2**21, max_cells=12,
                           max_hits=40, hit_budget=16, max_crossings=24,
                           n_segments=2, retrace_frac=0.125)
grid = gt.build_grid_from_gaussians(params, aux, tc_eval)
jax.block_until_ready(grid.cell_meta)
print("grid done, overflow:", int(grid.overflow), flush=True)

k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
R = 2**13
idx = jax.random.randint(k1, (R,), 0, 100_000)
ro0 = params.xyz[idx] + 0.05 * jax.random.normal(k2, (R, 3))
rd0 = jax.random.normal(k3, (R, 3))
rd0 /= jnp.linalg.norm(rd0, axis=-1, keepdims=True)
s = params.get_scaling()
Rm = math3d.quat_to_rotmat(params.rotation)
inputs = gt.TraceInputs(
    means3d=params.xyz,
    opacity=jnp.where(aux.alive, params.get_opacity()[:, 0], 0.0),
    ru=Rm[:, :, 0] / s[:, 0:1], rv=Rm[:, :, 1] / s[:, 1:2],
    normals=params.world_normals(cam_pos=jnp.zeros(3)),
    shs=params.get_features(), features=jnp.zeros((2**17, 0)))
geom = gt._pack_geom(inputs)


def bench_chain(step, state0, n=6, tag="", rays=R):
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


def perturb(ro, sig):
    # tiny deterministic perturbation derived from an output scalar
    return ro * (1.0 + 1e-6 * jnp.tanh(sig))


for name, tc in (("eval", tc_eval), ("train", tc_train)):
    @jax.jit
    def step_collect(st, tc=tc):
        ro, _ = st
        cells = gt.collect_cells(ro, rd0, grid, tc)
        sig = jnp.sum(cells.tin[:, 0]) * 1e-6
        return perturb(ro, sig), sig

    @jax.jit
    def step_select(st, tc=tc):
        ro, _ = st
        cells = gt.collect_cells(jax.lax.stop_gradient(ro), rd0, grid, tc)
        hits = gt.select_hits(ro, rd0, grid.sorted_gauss, cells, geom, tc, False)
        sig = jnp.sum(hits.t_last) * 1e-6
        return perturb(ro, sig), sig

    @jax.jit
    def step_blend(st, tc=tc):
        ro, _ = st
        cells = gt.collect_cells(ro, rd0, grid, tc)
        hits = gt.select_hits(ro, rd0, grid.sorted_gauss, cells, geom, tc, False)
        out = gt.blend_hits(ro, rd0, inputs, hits.gs, hits.valid, tc, 3)
        sig = jnp.sum(out.alpha) * 1e-6
        return perturb(ro, sig), sig

    st0 = (ro0, jnp.float32(0))
    d1 = bench_chain(step_collect, st0, tag=f"[{name}] collect")
    d2 = bench_chain(step_select, st0, tag=f"[{name}] collect+select")
    d3 = bench_chain(step_blend, st0, tag=f"[{name}] collect+select+blend")
    print(f"[{name}]   -> select ~{1e3*(d2-d1):.1f} ms, blend ~{1e3*(d3-d2):.1f} ms",
          flush=True)

# component split of the SHIPPING TILED first pass (collect / +tiled-select
# / +blend) — the loop above splits the OLD per-candidate select only
from irgs_tpu.config import Config as _Cfg
tc_ship = gt.TracerConfig.from_pipe(_Cfg().pipe, eval=True)
pair_tab = gt.pack_pair_table(grid, inputs, tc_ship.tile)


@jax.jit
def step_collect_ship(st):
    ro, _ = st
    cells = gt.collect_cells(ro, rd0, grid, tc_ship)
    sig = jnp.sum(cells.tin[:, 0]) * 1e-6
    return perturb(ro, sig), sig


@jax.jit
def step_select_ship(st):
    ro, _ = st
    cells = gt.collect_cells(ro, rd0, grid, tc_ship)
    hits = gt.select_hits_tiled(ro, rd0, grid, cells, pair_tab, tc_ship, False)
    sig = jnp.sum(hits.t_last) * 1e-6
    return perturb(ro, sig), sig


@jax.jit
def step_blend_ship(st):
    ro, _ = st
    cells = gt.collect_cells(ro, rd0, grid, tc_ship)
    hits = gt.select_hits_tiled(ro, rd0, grid, cells, pair_tab, tc_ship, False)
    out = gt.blend_hits(ro, rd0, inputs, hits.gs, hits.valid, tc_ship, 3)
    sig = jnp.sum(out.alpha) * 1e-6
    return perturb(ro, sig), sig


st0 = (ro0, jnp.float32(0))
d1 = bench_chain(step_collect_ship, st0, tag="[SHIP_eval pass1] collect")
d2 = bench_chain(step_select_ship, st0, tag="[SHIP_eval pass1] +tiled select")
d3 = bench_chain(step_blend_ship, st0, tag="[SHIP_eval pass1] +blend")
print(f"[SHIP_eval pass1] -> tiled select ~{1e3*(d2-d1):.1f} ms, "
      f"blend ~{1e3*(d3-d2):.1f} ms", flush=True)

# full production trace_fn at 2^16 rays, chained
from irgs_tpu.render import ir
R2 = 2**16
idx = jax.random.randint(k1, (R2,), 0, 100_000)
roL = params.xyz[idx] + 0.05 * jax.random.normal(k2, (R2, 3))
rdL = jax.random.normal(k3, (R2, 3))
rdL /= jnp.linalg.norm(rdL, axis=-1, keepdims=True)

for name, tc in (("eval", tc_eval), ("train", tc_train)):
    fn = ir.make_trace_fn(params, aux, grid, tc, jnp.zeros(3), 3)

    @jax.jit
    def step_full(st, fn=fn):
        ro, _ = st
        out = fn(ro, rdL)
        sig = jnp.sum(out.alpha) * 1e-6
        return perturb(ro, sig), sig

    bench_chain(step_full, (roL, jnp.float32(0)), n=3,
                tag=f"[{name}] FULL trace_fn", rays=R2)

# tiled-select configs (round 3): contiguous tile-block gathers
import dataclasses
tc_eval_tiled = dataclasses.replace(
    tc_eval, select_tiles=32, tile=16, retrace_select_tiles=128,
    max_cells=12, n_segments=6, retrace_frac=0.5, retrace_decay=0.5,
    retrace_max_cells=24, max_crossings=24, retrace_max_crossings=0)
tc_train_tiled = dataclasses.replace(
    tc_train, select_tiles=32, tile=16, n_segments=3, retrace_frac=0.25)

for name, tc in (("eval_tiled", tc_eval_tiled), ("train_tiled", tc_train_tiled)):
    fn = ir.make_trace_fn(params, aux, grid, tc, jnp.zeros(3), 3)

    @jax.jit
    def step_full(st, fn=fn):
        ro, _ = st
        out = fn(ro, rdL)
        sig = jnp.sum(out.alpha) * 1e-6
        return perturb(ro, sig), sig

    bench_chain(step_full, (roL, jnp.float32(0)), n=3,
                tag=f"[{name}] FULL trace_fn", rays=R2)

# head-to-head: select architectures at equal candidate coverage (512)
tc_train_pf = dataclasses.replace(
    tc_train, prefilter_width=512, n_segments=3, retrace_frac=0.25)
tc_eval_tiled2 = dataclasses.replace(
    tc_eval, select_tiles=48, tile=16, retrace_select_tiles=96,
    max_cells=16, n_segments=4, retrace_frac=0.5, retrace_decay=0.5,
    retrace_max_cells=24, max_crossings=24, retrace_max_crossings=32)
# the SHIPPING defaults (config.py) and their top_k k-buffer A/B
from irgs_tpu.config import Config
tc_ship_train = gt.TracerConfig.from_pipe(Config().pipe, eval=False)
tc_ship_eval = gt.TracerConfig.from_pipe(Config().pipe, eval=True)
for name, tc in (("train_pf512", tc_train_pf),
                 ("eval_tiled2", tc_eval_tiled2),
                 ("SHIP_train", tc_ship_train),
                 ("SHIP_train_topk",
                  dataclasses.replace(tc_ship_train, select_topk=True)),
                 ("SHIP_eval", tc_ship_eval),
                 ("SHIP_eval_topk",
                  dataclasses.replace(tc_ship_eval, select_topk=True))):
    fn = ir.make_trace_fn(params, aux, grid, tc, jnp.zeros(3), 3)

    @jax.jit
    def step_full(st, fn=fn):
        ro, _ = st
        out = fn(ro, rdL)
        sig = jnp.sum(out.alpha) * 1e-6
        return perturb(ro, sig), sig

    bench_chain(step_full, (roL, jnp.float32(0)), n=3,
                tag=f"[{name}] FULL trace_fn", rays=R2)
