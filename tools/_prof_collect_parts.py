"""Decompose collect_cells cost (chained timing) + test Pallas VMEM gather."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
import irgs_tpu  # noqa
from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.scene import toy

print("devices:", jax.devices(), flush=True)
params, aux = toy.make_sphere_scene(n_surface=100_000, n_capacity=2**17,
                                    env_resolution=128)
tc = gt.TracerConfig(grid_res=48, pair_capacity=2**21, max_cells=12,
                     max_hits=40, hit_budget=16, max_crossings=24)
grid = gt.build_grid_from_gaussians(params, aux, tc)
jax.block_until_ready(grid.cell_meta)

k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
R = 2**13
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
    print(f"{tag}: {dt*1e3:7.2f} ms", flush=True)
    return dt


g = tc.grid_res
k_ax = min(tc.max_crossings if tc.max_crossings > 0 else g, g)
S = 3 * k_ax
print(f"R={R} S={S}", flush=True)


def setup(ro):
    return gt._ray_setup(ro, rd0, grid, g)


def stage_a(ro):
    cell0, sgn, tdelta, tmax, t_enter, t_exit, hit_box = setup(ro)
    return jnp.sum(tmax) + jnp.sum(t_enter)


def stage_b(ro):
    cell0, sgn, tdelta, tmax, t_enter, t_exit, hit_box = setup(ro)
    k = jnp.arange(k_ax, dtype=jnp.float32)
    times = (tmax[:, :, None] + k[None, None, :] * tdelta[:, :, None]).reshape(R, S)
    axis_lbl = jnp.broadcast_to(
        jnp.arange(3, dtype=jnp.int32)[None, :, None], (R, 3, k_ax)).reshape(R, S)
    t_sorted, ax_sorted = jax.lax.sort((times, axis_lbl), num_keys=1,
                                       dimension=-1, is_stable=False)
    return jnp.sum(t_sorted) + jnp.sum(ax_sorted)


def stage_c(ro):
    cell0, sgn, tdelta, tmax, t_enter, t_exit, hit_box = setup(ro)
    k = jnp.arange(k_ax, dtype=jnp.float32)
    times = (tmax[:, :, None] + k[None, None, :] * tdelta[:, :, None]).reshape(R, S)
    axis_lbl = jnp.broadcast_to(
        jnp.arange(3, dtype=jnp.int32)[None, :, None], (R, 3, k_ax)).reshape(R, S)
    t_sorted, ax_sorted = jax.lax.sort((times, axis_lbl), num_keys=1,
                                       dimension=-1, is_stable=False)
    onehot = jax.nn.one_hot(ax_sorted, 3, dtype=jnp.int32)
    steps = jnp.cumsum(onehot, axis=1)
    cells_j = jnp.concatenate(
        [cell0[:, None], cell0[:, None] + sgn[:, None] * steps], axis=1)
    return jnp.sum(cells_j) + jnp.sum(t_sorted)


def stage_d(ro):
    cell0, sgn, tdelta, tmax, t_enter, t_exit, hit_box = setup(ro)
    k = jnp.arange(k_ax, dtype=jnp.float32)
    times = (tmax[:, :, None] + k[None, None, :] * tdelta[:, :, None]).reshape(R, S)
    axis_lbl = jnp.broadcast_to(
        jnp.arange(3, dtype=jnp.int32)[None, :, None], (R, 3, k_ax)).reshape(R, S)
    t_sorted, ax_sorted = jax.lax.sort((times, axis_lbl), num_keys=1,
                                       dimension=-1, is_stable=False)
    onehot = jax.nn.one_hot(ax_sorted, 3, dtype=jnp.int32)
    steps = jnp.cumsum(onehot, axis=1)
    cells_j = jnp.concatenate(
        [cell0[:, None], cell0[:, None] + sgn[:, None] * steps], axis=1)
    cc = jnp.clip(cells_j, 0, g - 1)
    cid = (cc[..., 2] * g + cc[..., 1]) * g + cc[..., 0]
    meta = grid.cell_meta[cid]
    return jnp.sum(meta) + jnp.sum(t_sorted)


def full(ro):
    cells = gt.collect_cells(ro, rd0, grid, tc)
    return (jnp.sum(cells.tin) + jnp.sum(cells.counts).astype(jnp.float32)
            + jnp.sum(cells.starts).astype(jnp.float32))


for tag, f in (("a _ray_setup", stage_a), ("b +times+sort", stage_b),
               ("c +onehot/cumsum/cells", stage_c), ("d +meta gather", stage_d),
               ("e full collect", full)):
    @jax.jit
    def step(st, f=f):
        ro, _ = st
        sig = f(ro) * 1e-9
        return ro * (1.0 + 1e-7 * jnp.tanh(sig)), sig
    bench_chain(step, (ro0, jnp.float32(0)), tag=tag)

# ---- Pallas: can Mosaic gather from a VMEM-resident table? ----
print("--- pallas vmem gather test ---", flush=True)
try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(tab_ref, idx_ref, out_ref):
        idx = idx_ref[:]                       # [128] int32
        out_ref[:] = tab_ref[idx]              # vector gather along sublanes?

    tab = jax.random.normal(k1, (1024, 128), jnp.float32)
    iv = jax.random.randint(k2, (128,), 0, 1024)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, iv)
    ref = tab[iv]
    print("pallas row gather from VMEM works, max err",
          float(jnp.max(jnp.abs(out - ref))), flush=True)
except Exception as e:
    print("pallas row gather FAILED:", str(e)[:500], flush=True)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern2(tab_ref, idx_ref, out_ref):
        idx = idx_ref[:]                       # [8, 128] int32
        out_ref[:] = jnp.take(tab_ref[:], idx, axis=0)  # elementwise gather

    tab = jax.random.normal(k1, (110592,), jnp.float32)
    iv = jax.random.randint(k2, (8, 128), 0, 110592)
    out = pl.pallas_call(
        kern2,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, iv)
    ref = tab[iv]
    print("pallas flat elem gather works, max err",
          float(jnp.max(jnp.abs(out - ref))), flush=True)
except Exception as e:
    print("pallas flat elem gather FAILED:", str(e)[:500], flush=True)
