"""Oversize-surfel (span_cap) stress tests — VERDICT r4 #7.

In their original home at the END of tests/test_tracer.py these tests
segfaulted the XLA:CPU compiler (backend_compile_and_load) when run after
the full suite's ~90 accumulated compilations, while passing in ANY
shorter prefix tried (solo, after test_raster, after test_parallel, after
test_golden — the round-5 bisect). The file is named to collect FIRST so
the big trace_segments compile happens before the compiler state
degrades; the crash is an XLA:CPU bug, not repo logic (same programs are
oracle-exact here and on TPU).
"""
import jax
import jax.numpy as jnp
import numpy as np

from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.utils import math3d

from test_tracer import CFG, make_inputs

def _floor_scene(n_small=24):
    """A floor disk spanning the whole scene + small surfels above it
    (VERDICT r4 #7: the span_cap truncation stress case)."""
    key = jax.random.PRNGKey(7)
    inputs, scales = make_inputs(key, n=n_small)
    # append one huge horizontal disk at z = -0.8 covering [-2, 2]^2
    floor_scale = jnp.asarray([[2.0, 2.0]])
    means = jnp.concatenate([inputs.means3d, jnp.asarray([[0.0, 0.0, -0.8]])])
    ru = jnp.concatenate([inputs.ru, jnp.asarray([[1.0, 0.0, 0.0]]) / 2.0])
    rv = jnp.concatenate([inputs.rv, jnp.asarray([[0.0, 1.0, 0.0]]) / 2.0])
    nrm = jnp.concatenate([inputs.normals, jnp.asarray([[0.0, 0.0, 1.0]])])
    opac = jnp.concatenate([inputs.opacity, jnp.asarray([0.95])])
    shs = jnp.concatenate([inputs.shs,
                           jnp.full((1,) + inputs.shs.shape[1:], 0.4)])
    feats = jnp.concatenate([inputs.features,
                             jnp.full((1, inputs.features.shape[1]), 0.6)])
    big = gt.TraceInputs(means3d=means, opacity=opac, ru=ru, rv=rv,
                         normals=nrm, shs=shs, features=feats)
    scales_all = jnp.concatenate([scales, floor_scale])
    return big, scales_all


def test_span_cap_truncation_detected_and_fixable():
    """A gaussian spanning more cells than span_cap must be (a) counted
    loudly in Grid.oversize, and (b) traced EXACTLY once span_cap covers
    its true span (the documented mitigation knob)."""
    inputs, scales = _floor_scene()
    n = inputs.means3d.shape[0]
    alive = jnp.ones(n, bool)
    radius = gt.bounding_radius(inputs.opacity, scales, CFG.alpha_min)

    # rays straight down onto the floor, far from its center — exactly the
    # rays a centered truncation window loses
    xs = jnp.linspace(-1.8, 1.8, 8)
    ox, oy = jnp.meshgrid(xs, xs, indexing="ij")
    ro = jnp.stack([ox.reshape(-1), oy.reshape(-1),
                    jnp.full(64, 2.0)], axis=-1)
    rd = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (64, 1))
    ref = gt.trace_reference(ro, rd, inputs, alive, sh_deg=3,
                             transmittance_min=CFG.transmittance_min)
    assert float(ref.alpha.min()) > 0.3  # every ray hits the floor

    # (a) small span_cap: truncation detected + visible bias
    cfg_small = gt.TracerConfig(grid_res=16, pair_capacity=2 ** 15,
                                max_cells=48, max_hits=192, hit_budget=192,
                                span_cap=4)
    grid_small = gt.build_grid(inputs.means3d, radius, alive,
                               grid_res=16, pair_capacity=2 ** 15,
                               span_cap=4, normals=inputs.normals)
    assert int(grid_small.oversize) >= 1
    out_small = gt.trace(ro, rd, grid_small, inputs, cfg=cfg_small, sh_deg=3)
    # the centered window misses far rays: bias exists and is DETECTED,
    # not silent (this pins the documented deviation)
    assert float(jnp.abs(out_small.alpha - ref.alpha).max()) > 0.1

    # (b) span_cap covering the true span: oracle-exact again
    cfg_big = gt.TracerConfig(grid_res=16, pair_capacity=2 ** 15,
                              max_cells=48, max_hits=192, hit_budget=192,
                              span_cap=16)
    grid_big = gt.build_grid(inputs.means3d, radius, alive,
                             grid_res=16, pair_capacity=2 ** 15,
                             span_cap=16, normals=inputs.normals)
    assert int(grid_big.oversize) == 0
    assert int(grid_big.overflow) == 0
    out_big = gt.trace(ro, rd, grid_big, inputs, cfg=cfg_big, sh_deg=3)
    np.testing.assert_allclose(out_big.alpha, ref.alpha, atol=3e-5)
    np.testing.assert_allclose(out_big.color, ref.color, atol=3e-5)


def test_oversize_merge_exact():
    """With oversize_cap > 0 the floor LEAVES the grid and is brute-force
    depth-merged into every blend — oracle-exact at small span_cap, single
    pass and segmented re-trace both."""
    inputs, scales = _floor_scene()
    n = inputs.means3d.shape[0]
    alive = jnp.ones(n, bool)
    radius = gt.bounding_radius(inputs.opacity, scales, CFG.alpha_min)

    xs = jnp.linspace(-1.8, 1.8, 8)
    ox, oy = jnp.meshgrid(xs, xs, indexing="ij")
    ro = jnp.stack([ox.reshape(-1), oy.reshape(-1),
                    jnp.full(64, 2.0)], axis=-1)
    rd = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (64, 1))
    # oblique rays too (graze the floor through many cells)
    ro2 = jnp.tile(jnp.asarray([[2.5, 0.3, 1.5]]), (64, 1))
    import jax as _jax
    rd2 = math3d.safe_normalize(
        jnp.stack([-1.0 - 0.3 * _jax.random.uniform(_jax.random.PRNGKey(3), (64,)),
                   -0.2 * _jax.random.uniform(_jax.random.PRNGKey(4), (64,)),
                   -0.9 + 0.4 * _jax.random.uniform(_jax.random.PRNGKey(5), (64,))],
                  axis=-1))
    ro = jnp.concatenate([ro, ro2]); rd = jnp.concatenate([rd, rd2])
    ref = gt.trace_reference(ro, rd, inputs, alive, sh_deg=3,
                             transmittance_min=CFG.transmittance_min)

    cfg = gt.TracerConfig(grid_res=8, pair_capacity=2 ** 15, max_cells=48,
                          max_hits=192, hit_budget=192, span_cap=6,
                          oversize_cap=8)
    grid = gt.build_grid(inputs.means3d, radius, alive, grid_res=8,
                         pair_capacity=2 ** 15, span_cap=6,
                         normals=inputs.normals, oversize_cap=8)
    # the floor (last id) is out of the grid, in the oversize list
    assert int(grid.oversize) == 0
    ids = np.asarray(grid.oversize_ids)
    assert (n - 1) in ids[ids >= 0]
    assert int(jnp.sum(grid.sorted_gauss[
        :int(jnp.sum(gt.unpack_cell_meta(grid.cell_meta)[1]))] == n - 1)) == 0

    out = gt.trace(ro, rd, grid, inputs, cfg=cfg, sh_deg=3)
    np.testing.assert_allclose(out.alpha, ref.alpha, atol=3e-5)
    np.testing.assert_allclose(out.color, ref.color, atol=3e-5)
    np.testing.assert_allclose(out.depth, ref.depth, atol=1e-4)

    # segmented re-trace with tight budgets: oversize windows must
    # partition across rounds (no double blend, no loss)
    cfg2 = gt.TracerConfig(grid_res=8, pair_capacity=2 ** 15, max_cells=8,
                           max_hits=16, hit_budget=8, span_cap=6,
                           oversize_cap=8, n_segments=4, retrace_frac=1.0,
                           max_crossings=12)
    out2 = gt.trace_segments(ro, rd, grid, inputs, cfg=cfg2, sh_deg=3)
    np.testing.assert_allclose(out2.alpha, ref.alpha, atol=2e-3)
    np.testing.assert_allclose(out2.color, ref.color, atol=2e-3)

    # gradients flow to the oversize gaussian through the merged blend
    def loss(op):
        inp = inputs._replace(opacity=op)
        return gt.trace(ro, rd, grid, inp, cfg=cfg, sh_deg=3).color.sum()
    g = jax.grad(loss)(inputs.opacity)
    assert float(jnp.abs(g[n - 1])) > 0.0
