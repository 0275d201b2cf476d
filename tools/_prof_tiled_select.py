"""Chained micro-profile of the tiled-select pieces on the real chip.

Isolates: block gather (vmap dynamic_slice) vs per-element gathers of equal
volume, the [R, S1] two-key sort, and the full select_hits_tiled.

Run solo:  python tools/_prof_tiled_select.py
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import irgs_tpu  # noqa: F401
from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.scene import toy
from irgs_tpu.utils import math3d

print("devices:", jax.devices(), flush=True)

params, aux = toy.make_sphere_scene(n_surface=100_000, n_capacity=2 ** 17,
                                    env_resolution=128)
tc = gt.TracerConfig(grid_res=48, pair_capacity=2 ** 21, max_cells=12,
                     max_hits=40, hit_budget=16, max_crossings=24,
                     select_tiles=32, tile=16)
grid = gt.build_grid_from_gaussians(params, aux, tc)
jax.block_until_ready(grid.cell_meta)
print("grid overflow:", int(grid.overflow), flush=True)

k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
R = 2 ** 13
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
geom = gt._pack_geom(inputs)
pair_tab = gt._pair_tab_from_geom(grid, geom)
jax.block_until_ready(pair_tab)
P = grid.sorted_gauss.shape[0]
TILE, ST = tc.tile, tc.select_tiles
S1 = ST * TILE


def bench(step, state0, n=6, tag=""):
    st = step(state0)
    np.asarray(jax.tree.leaves(st)[0].ravel()[0])
    t0 = time.time()
    for _ in range(n):
        st = step(st)
    for leaf in jax.tree.leaves(st):
        np.asarray(leaf.ravel()[0])
    dt = (time.time() - t0) / n
    print(f"{tag}: {dt*1e3:7.1f} ms/{R} rays", flush=True)
    return dt


def perturb(ro, sig):
    return ro * (1.0 + 1e-6 * jnp.tanh(sig))


@jax.jit
def step_collect(st):
    ro, _ = st
    cells = gt.collect_cells(ro, rd0, grid, tc)
    sig = jnp.sum(cells.tin[:, 0]) * 1e-6
    return perturb(ro, sig), sig


cells0 = gt.collect_cells(ro0, rd0, grid, tc)


@jax.jit
def step_rowgather(st):
    """tile enumeration + ONE [R, ST] tile-row gather, reduced."""
    ro, _ = st
    cells = gt.collect_cells(ro, rd0, grid, tc)
    starts, counts = cells.starts, cells.counts
    tcnt = jnp.where(counts > 0, (starts % TILE + counts + TILE - 1) // TILE, 0)
    cumT = jnp.cumsum(tcnt, -1)
    exclT = cumT - tcnt
    ss = jnp.arange(ST, dtype=jnp.int32)[None]
    cidx = jnp.zeros((R, ST), jnp.int32)
    for c in range(tc.max_cells):
        cidx = cidx + (cumT[:, c:c + 1] <= ss).astype(jnp.int32)
    out = jnp.broadcast_to(starts[:, -1:], cidx.shape)
    exc = jnp.broadcast_to(exclT[:, -1:], cidx.shape)
    for c in range(tc.max_cells - 1):
        out = jnp.where(cidx == c, starts[:, c:c + 1], out)
        exc = jnp.where(cidx == c, exclT[:, c:c + 1], exc)
    row_idx = jnp.clip(out // TILE + (ss - exc), 0, pair_tab.shape[0] - 1)
    rows = pair_tab[row_idx]
    sig = jnp.sum(rows[:, :, 3]) * 1e-9
    return perturb(ro, sig), sig


@jax.jit
def step_sort(st):
    """[R, S1] two-key payload sort alone."""
    ro, _ = st
    cells = gt.collect_cells(ro, rd0, grid, tc)
    d_key = cells.tin[:, 0:1] + jnp.arange(S1, dtype=jnp.float32)[None]
    pos = jnp.broadcast_to(jnp.arange(S1, dtype=jnp.int32)[None], (R, S1))
    d_s, p_s = jax.lax.sort((d_key, pos), num_keys=2, dimension=-1,
                            is_stable=False)
    sig = jnp.sum(d_s[:, 0]) * 1e-6
    return perturb(ro, sig), sig


@jax.jit
def step_select(st):
    ro, _ = st
    cells = gt.collect_cells(ro, rd0, grid, tc)
    hits = gt.select_hits_tiled(ro, rd0, grid, cells, pair_tab, tc, False)
    sig = jnp.sum(hits.t_last) * 1e-6
    return perturb(ro, sig), sig


st0 = (ro0, jnp.float32(0))
d_col = bench(step_collect, st0, tag="collect")
bench(step_rowgather, st0, tag="collect+tile-enum+row gather")
bench(step_sort, st0, tag="collect+[R,S1] 2-key sort")
bench(step_select, st0, tag="collect+select_hits_tiled full")
