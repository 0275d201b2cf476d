"""Pallas DMA row-gather (ops/gather_pallas.py) vs XLA gather.

Interpret-mode parity on the CPU mesh; the on-device A/B lives in
tools/_prof_gather.py (run solo on the chip).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irgs_tpu.ops.gather_pallas import gather_rows


@pytest.mark.parametrize("shape", [(513, 224), (64, 896), (2048, 56)])
def test_gather_rows_matches_xla(shape):
    T, W = shape
    k1, k2 = jax.random.split(jax.random.PRNGKey(shape[1]))
    tab = jax.random.normal(k1, (T, W), jnp.float32)
    idx = jax.random.randint(k2, (3 * T + 7,), 0, T)
    out = gather_rows(tab, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(tab[idx]))


def test_gather_rows_small_batch():
    # M < block_rows: single partial block, window shorter than inflight
    tab = jnp.arange(40.0).reshape(10, 4)
    idx = jnp.array([3, 3, 9, 0, 7], jnp.int32)
    out = gather_rows(tab, idx, block_rows=256, inflight=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(tab[idx]))


def test_tiled_select_pallas_gather_interpret():
    """select_hits_tiled(pallas_gather) == select_hits_tiled(XLA gather) on
    the same scene, pinning the wiring in grid_tracer.py."""
    import dataclasses

    from irgs_tpu.ops import grid_tracer as gt
    from irgs_tpu.scene import toy
    from irgs_tpu.utils import math3d

    params, aux = toy.make_sphere_scene(n_surface=2000, n_capacity=2048,
                                        env_resolution=16)
    cfg = gt.TracerConfig(grid_res=16, pair_capacity=2 ** 15, max_cells=8,
                          select_tiles=8, tile=16, hit_budget=8,
                          max_crossings=12)
    grid = gt.build_grid_from_gaussians(params, aux, cfg)
    s = params.get_scaling()
    Rm = math3d.quat_to_rotmat(params.rotation)
    inputs = gt.TraceInputs(
        means3d=params.xyz,
        opacity=jnp.where(aux.alive, params.get_opacity()[:, 0], 0.0),
        ru=Rm[:, :, 0] / s[:, 0:1], rv=Rm[:, :, 1] / s[:, 1:2],
        normals=params.world_normals(cam_pos=jnp.zeros(3)),
        shs=params.get_features(), features=jnp.zeros((2048, 0)))
    pair_tab = gt.pack_pair_table(grid, inputs, cfg.tile)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    R = 64
    ro = params.xyz[jax.random.randint(k1, (R,), 0, 2000)] * 1.5
    rd = jax.random.normal(k2, (R, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    cells = gt.collect_cells(ro, rd, grid, cfg)

    base = gt.select_hits_tiled(ro, rd, grid, cells, pair_tab, cfg, False)

    # monkeypatch the kernel to interpret mode (no TPU in CI)
    import irgs_tpu.ops.gather_pallas as gp
    orig = gp.gather_rows
    try:
        gp.gather_rows = lambda t, i, **kw: orig(t, i, interpret=True)
        cfg_p = dataclasses.replace(cfg, pallas_gather=8)
        got = gt.select_hits_tiled(ro, rd, grid, cells, pair_tab, cfg_p,
                                   False)
    finally:
        gp.gather_rows = orig

    np.testing.assert_array_equal(np.asarray(base.gs), np.asarray(got.gs))
    np.testing.assert_array_equal(np.asarray(base.valid),
                                  np.asarray(got.valid))
    np.testing.assert_allclose(np.asarray(base.t_last),
                               np.asarray(got.t_last), rtol=1e-6)
