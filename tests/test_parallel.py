"""Multi-device parity: the data-parallel stage-2 step must equal the
single-device step on the averaged gradient, and the MC-sample-sharded eval
must equal the full-sample estimator (VERDICT round-1 item #8).

Runs on the virtual 8-device CPU mesh set up by conftest.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.parallel import dp
from irgs_tpu.scene import toy
from irgs_tpu.scene.cameras import stack_camera_params
from irgs_tpu.train import stage2 as s2


@pytest.fixture(scope="module")
def setup():
    params, aux = toy.make_sphere_scene(n_surface=256, n_capacity=512,
                                          env_resolution=16)
    cams = toy.make_ring_cameras(8, width=32, height_px=32)
    st = s2.Stage2Static(
        img_w=32, img_h=32, active_sh_degree=1, diffuse_sample_num=8,
        light_sample_num=0, trace_num_rays=256, light_t_min=0.05,
        wo_indirect=False, detach_indirect=False, white_background=False,
        dup_capacity=2 ** 12,
        tracer=gt.TracerConfig(grid_res=16, pair_capacity=2 ** 14,
                               max_cells=8, max_hits=16, hit_budget=8))
    return params, aux, cams, st


def test_dp_step_equals_single_device(setup):
    params, aux, cams, st = setup
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest should provide 8 virtual devices"

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    state = s2.TrainState(params, aux, opt_state, jnp.int32(0))
    grid = gt.build_grid_from_gaussians(params, aux, st.tracer)

    batched = stack_camera_params(cams)
    gts = jnp.stack([jnp.full((32, 32, 3), 0.25 + 0.05 * i)
                     for i in range(n_dev)])
    keys = jax.random.split(jax.random.PRNGKey(0), n_dev)

    mesh = dp.make_mesh()
    step = dp.stage2_dp_step(mesh, st, optimizer)
    new_state, metrics = step(state, grid, batched, gts, keys)

    # single-device: mean of per-camera grads, one optimizer update
    def loss_i(p, i):
        cam = jax.tree.map(lambda x: x[i], batched)
        return s2.stage2_forward_loss(p, aux, grid, cam, gts[i], None,
                                      keys[i], state.step, st)

    grads = None
    losses = []
    for i in range(n_dev):
        (l, m), g = jax.value_and_grad(loss_i, has_aux=True)(params, i)
        losses.append(float(l))
        grads = g if grads is None else jax.tree.map(jnp.add, grads, g)
    grads = jax.tree.map(lambda x: x / n_dev, grads)
    updates, _ = optimizer.update(grads, opt_state, params)
    ref_params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(metrics["loss"]), np.mean(losses),
                               rtol=1e-5, atol=1e-6)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(new_state.params),
            jax.tree_util.tree_leaves_with_path(ref_params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
            err_msg=f"DP mismatch at {jax.tree_util.keystr(pa)}")
    # something actually moved
    assert float(jnp.abs(new_state.params.base_color - params.base_color).max()) > 0


def test_eval_mc_sharded_equals_full_estimator():
    n_dev = len(jax.devices())
    mesh = dp.make_mesh()

    def shade_fn(pixels, key):
        # per-device MC estimate over its local sample subset
        s = jax.random.uniform(key, (pixels.shape[0], 4))
        return {"radiance": (pixels[:, None] * s).mean(axis=1)}

    sharded = dp.eval_mc_sharded(mesh, shade_fn)
    pixels = jnp.linspace(0.0, 1.0, 16)
    keys = jax.random.split(jax.random.PRNGKey(1), n_dev)
    out = sharded(pixels, keys)

    # full estimator: average the per-device estimates
    full = jnp.stack([shade_fn(pixels, keys[i])["radiance"]
                      for i in range(n_dev)]).mean(axis=0)
    np.testing.assert_allclose(np.asarray(out["radiance"]), np.asarray(full),
                               rtol=1e-6, atol=1e-7)


def test_sample_sharded_eval_matches_single_device(setup):
    """The REAL eval path (render_ir_eval + rendering_equation + grid
    tracer) with the sample axis sharded over the 8-device mesh must equal
    the single-device render (VERDICT r2 weak #5: no more stub-only
    coverage)."""
    from irgs_tpu.render.eval import EvalConfig, render_ir_eval

    params, aux, cams, st = setup
    mesh = dp.make_mesh()
    ecfg = EvalConfig(img_w=32, img_h=32, active_sh_degree=1,
                      diffuse_sample_num=16, light_sample_num=8,
                      dup_capacity=2 ** 12, tracer=st.tracer)
    grid = gt.build_grid_from_gaussians(params, aux, ecfg.tracer)
    cam = cams[0].params()

    single = jax.jit(lambda p, g, c: render_ir_eval(p, aux, g, c, ecfg))(
        params, grid, cam)
    sharded = jax.jit(lambda p, g, c: render_ir_eval(p, aux, g, c, ecfg,
                                                     mesh=mesh))(
        params, grid, cam)
    for k in ("render", "diffuse", "specular", "visibility", "light"):
        np.testing.assert_allclose(
            np.asarray(sharded[k]), np.asarray(single[k]),
            rtol=2e-4, atol=2e-5, err_msg=f"sharded eval mismatch in {k}")


def test_compact_fg_eval_matches_full(setup):
    """The eager foreground-compacted chunk loop must reproduce the
    all-pixels (traced) eval path: fg pixels shade identically, background
    pixels compose from bg/env with zero MC contribution (≙ reference
    mask = render_alpha[0] > 0, __init__.py:215-216).

    Exact in both sampling modes: cosine-hemisphere draws are per-pixel
    deterministic from the normal, and light importance draws are a pure
    function of the pixel id (sample_light_dirs pixel_ids) — unlike the
    reference's global-RNG torch.multinomial, results are invariant to
    chunk composition."""
    from irgs_tpu.render.eval import EvalConfig, render_ir_eval

    params, aux, cams, st = setup
    ecfg = EvalConfig(img_w=32, img_h=32, active_sh_degree=1,
                      diffuse_sample_num=16, light_sample_num=0,
                      dup_capacity=2 ** 12, tracer=st.tracer)
    grid = gt.build_grid_from_gaussians(params, aux, ecfg.tracer)
    cam = cams[0].params()

    full = render_ir_eval(params, aux, grid, cam, ecfg, compact_fg=False)
    compact = render_ir_eval(params, aux, grid, cam, ecfg, compact_fg=True)
    assert float(full["rend_alpha"].max()) > 0.5  # scene covers some pixels
    assert float(full["rend_alpha"].min()) == 0.0  # and leaves background
    for k in ("render", "diffuse", "specular", "visibility", "light",
              "render_env", "light_indirect"):
        np.testing.assert_allclose(
            np.asarray(compact[k]), np.asarray(full[k]),
            rtol=2e-4, atol=2e-5, err_msg=f"compact eval mismatch in {k}")

    # with light importance sampling: draws are a pure function of the
    # pixel id (sample_light_dirs pixel_ids), so compaction is still exact
    ecfg_l = EvalConfig(img_w=32, img_h=32, active_sh_degree=1,
                        diffuse_sample_num=16, light_sample_num=8,
                        dup_capacity=2 ** 12, tracer=st.tracer)
    full_l = render_ir_eval(params, aux, grid, cam, ecfg_l, compact_fg=False)
    comp_l = render_ir_eval(params, aux, grid, cam, ecfg_l, compact_fg=True)
    for k in ("render", "diffuse", "specular"):
        np.testing.assert_allclose(
            np.asarray(comp_l[k]), np.asarray(full_l[k]),
            rtol=2e-4, atol=2e-5, err_msg=f"light-sampled mismatch in {k}")


def test_compact_fg_eval_sharded_matches_full(setup):
    """compact_fg + mesh: the per-chunk shard_map path agrees too (exact
    with per-pixel-deterministic cosine sampling)."""
    from irgs_tpu.render.eval import EvalConfig, render_ir_eval

    params, aux, cams, st = setup
    mesh = dp.make_mesh()
    ecfg = EvalConfig(img_w=32, img_h=32, active_sh_degree=1,
                      diffuse_sample_num=16, light_sample_num=0,
                      dup_capacity=2 ** 12, tracer=st.tracer)
    grid = gt.build_grid_from_gaussians(params, aux, ecfg.tracer)
    cam = cams[0].params()

    full = render_ir_eval(params, aux, grid, cam, ecfg, compact_fg=False)
    compact = render_ir_eval(params, aux, grid, cam, ecfg, mesh=mesh,
                             compact_fg=True)
    for k in ("render", "diffuse", "specular"):
        np.testing.assert_allclose(
            np.asarray(compact[k]), np.asarray(full[k]),
            rtol=2e-4, atol=2e-5, err_msg=f"sharded compact mismatch in {k}")
