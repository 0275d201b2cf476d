"""Component split of the TRAINING tracer at the bench workload, measured
the way the step actually runs (chunked select + chunked differentiable
blend via make_trace_fn). CHAINED timing with host-fetch closure.

Rows (per 2^18 rays, shipping TRAIN config):
  collect            DDA only, 16k-ray calls x 16
  +select            collect + tiled select
  trace fwd          full make_trace_fn forward (incl. re-trace rounds)
  trace fwd+bwd      value_and_grad of sum(trace outputs) wrt means3d
  raster fwd+bwd     the rasterizer at 400^2 (for scale)

Run solo:  python tools/_prof_train_split.py [row-filter]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from irgs_tpu.config import Config
from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.render import ir
from irgs_tpu.scene import toy
from irgs_tpu.utils import math3d

print("devices:", jax.devices(), flush=True)

params, aux = toy.make_sphere_scene(n_surface=100_000, n_capacity=2 ** 17,
                                    env_resolution=128)
tc = gt.TracerConfig.from_pipe(Config().pipe)
grid = gt.build_grid_from_gaussians(params, aux, tc)
jax.block_until_ready(grid.cell_meta)

R = 2 ** 18
k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
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
    shs=params.get_features(), features=jnp.zeros((2 ** 17, 0)))
geom = jax.lax.stop_gradient(gt._pack_geom(inputs))
pair_tab = gt._pair_tab_from_geom(grid, geom, tc.tile)
jax.block_until_ready(pair_tab)

SEL_RAYS = 2 ** 14   # matches make_trace_fn's target at 768-lane width


def bench_chain(step, state0, n=4, tag=""):
    stt = step(state0)
    np.asarray(jax.tree.leaves(stt)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        stt = step(stt)
    for leaf in jax.tree.leaves(stt):
        np.asarray(leaf.ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{tag:20s} {dt * 1e3:8.1f} ms / 2^18 rays", flush=True)
    return dt


def perturb(x, sig):
    return x * (1.0 + 1e-6 * jnp.tanh(sig))


def chunked(f, ro, rd):
    rc = ro.reshape(-1, SEL_RAYS, 3)
    dc = rd.reshape(-1, SEL_RAYS, 3)
    return jax.lax.map(lambda ab: f(ab[0], ab[1]), (rc, dc))


@jax.jit
def step_collect(stt):
    ro, _ = stt
    out = chunked(lambda a, b: gt.collect_cells(a, b, grid, tc).tin[:, 0],
                  ro, rd0)
    sig = jnp.sum(out) * 1e-6
    return perturb(ro, sig), sig


@jax.jit
def step_select(stt):
    ro, _ = stt

    def f(a, b):
        cl = gt.collect_cells(a, b, grid, tc)
        h = gt.select_hits(a, b, grid.sorted_gauss, cl, geom, tc, False,
                           grid=grid, pair_tab=pair_tab)
        return h.t_last

    out = chunked(f, ro, rd0)
    sig = jnp.sum(out) * 1e-6
    return perturb(ro, sig), sig


tf = ir.make_trace_fn(params, aux, grid, tc, jnp.zeros(3), 3)


@jax.jit
def step_fwd(stt):
    ro, _ = stt
    out = tf(jax.lax.stop_gradient(ro), rd0)
    sig = jnp.sum(out.alpha) * 1e-6
    return perturb(ro, sig), sig


@jax.jit
def step_fwdbwd(stt):
    ro, _ = stt

    def f(xyz):
        import dataclasses as dc
        tf2 = ir.make_trace_fn(dc.replace(params, xyz=xyz), aux, grid, tc,
                               jnp.zeros(3), 3)
        o = tf2(ro, rd0)
        return jnp.sum(o.color) + jnp.sum(o.alpha)

    val, g = jax.value_and_grad(f)(params.xyz)
    sig = (val + jnp.sum(g)) * 1e-9
    return perturb(ro, sig), sig


@jax.jit
def step_pairtab(stt):
    ro, _ = stt
    sig = jnp.sum(ro[0]) * 1e-6
    tab = gt._pair_tab_from_geom(grid, geom * (1 + 1e-6 * jnp.tanh(sig)),
                                 tc.tile)
    sig = sig + tab[0, 0] * 1e-6
    return perturb(ro, sig), sig


import dataclasses as _dc

tc_nc = _dc.replace(tc, coarse_scan=False)


@jax.jit
def step_collect_nocoarse(stt):
    ro, _ = stt
    out = chunked(lambda a, b: gt.collect_cells(a, b, grid, tc_nc).tin[:, 0],
                  ro, rd0)
    sig = jnp.sum(out) * 1e-6
    return perturb(ro, sig), sig


tc_cr16 = _dc.replace(tc, max_crossings=16)


@jax.jit
def step_collect_cr16(stt):
    ro, _ = stt
    out = chunked(lambda a, b: gt.collect_cells(a, b, grid, tc_cr16).tin[:, 0],
                  ro, rd0)
    sig = jnp.sum(out) * 1e-6
    return perturb(ro, sig), sig


tf_d5 = ir.make_trace_fn(params, aux, grid,
                         _dc.replace(tc, retrace_decay=0.5),
                         jnp.zeros(3), 3)


@jax.jit
def step_fwd_decay(stt):
    ro, _ = stt
    out = tf_d5(jax.lax.stop_gradient(ro), rd0)
    sig = jnp.sum(out.alpha) * 1e-6
    return perturb(ro, sig), sig


rows = [
    ("collect", step_collect),
    ("+select", step_select),
    ("trace fwd", step_fwd),
    ("trace fwd+bwd", step_fwdbwd),
    ("pair_tab build", step_pairtab),
    ("collect nocoarse", step_collect_nocoarse),
    ("collect cr16", step_collect_cr16),
    ("trace fwd decay0.5", step_fwd_decay),
]
only = sys.argv[1] if len(sys.argv) > 1 else ""
st0 = (ro0, jnp.float32(0))
for tag, fn in rows:
    if only and only not in tag:
        continue
    bench_chain(fn, st0, tag=tag)
