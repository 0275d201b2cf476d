import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.utils import math3d

CFG = gt.TracerConfig(grid_res=16, pair_capacity=2 ** 15, max_cells=48,
                      max_hits=192, hit_budget=192, span_cap=8)


def make_inputs(key, n=48, s=4, sh_coeffs=16):
    ks = jax.random.split(key, 8)
    means = jax.random.uniform(ks[0], (n, 3), minval=-1.0, maxval=1.0)
    scales = jnp.exp(jax.random.uniform(ks[1], (n, 2), minval=-3.0, maxval=-1.8))
    quats = math3d.quat_normalize(jax.random.normal(ks[2], (n, 4)))
    R = math3d.quat_to_rotmat(quats)
    opac = jax.nn.sigmoid(jax.random.normal(ks[3], (n,)) + 1.0)
    inputs = gt.TraceInputs(
        means3d=means,
        opacity=opac,
        ru=R[:, :, 0] / scales[:, 0:1],
        rv=R[:, :, 1] / scales[:, 1:2],
        normals=R[:, :, 2],
        shs=jax.random.normal(ks[4], (n, sh_coeffs, 3)) * 0.3,
        features=jax.random.uniform(ks[5], (n, s)),
    )
    scales_full = scales
    return inputs, scales_full


def make_rays(key, r=64):
    k1, k2 = jax.random.split(key)
    # origins on a sphere of radius 2.5 shooting inward with jitter
    d = math3d.safe_normalize(jax.random.normal(k1, (r, 3)))
    o = -2.5 * d
    jitter = 0.3 * jax.random.normal(k2, (r, 3))
    d = math3d.safe_normalize(d + 0.1 * jitter)
    return o, d


@pytest.fixture(scope="module")
def setup():
    inputs, scales = make_inputs(jax.random.PRNGKey(0))
    alive = jnp.ones(inputs.means3d.shape[0], bool)
    radius = gt.bounding_radius(inputs.opacity, scales, CFG.alpha_min)
    grid = gt.build_grid(inputs.means3d, radius, alive,
                         grid_res=CFG.grid_res, pair_capacity=CFG.pair_capacity,
                         span_cap=CFG.span_cap)
    rays_o, rays_d = make_rays(jax.random.PRNGKey(1))
    return inputs, alive, grid, rays_o, rays_d


def test_grid_build(setup):
    inputs, alive, grid, *_ = setup
    assert int(grid.overflow) == 0
    assert int(jnp.sum(gt.unpack_cell_meta(grid.cell_meta)[1])) > 0
    # every alive gaussian's center cell contains it
    g = CFG.grid_res
    cc = jnp.clip(jnp.floor((inputs.means3d - grid.bb_min) * grid.inv_cell
                            ).astype(jnp.int32), 0, g - 1)
    cid = (cc[:, 2] * g + cc[:, 1]) * g + cc[:, 0]
    for i in range(8):
        start, cnt = (int(x[cid[i]]) for x in gt.unpack_cell_meta(grid.cell_meta))
        members = np.asarray(grid.sorted_gauss[start:start + cnt])
        assert i in members


def test_forward_matches_brute_force(setup):
    inputs, alive, grid, rays_o, rays_d = setup
    out = gt.trace(rays_o, rays_d, grid, inputs, cfg=CFG, sh_deg=3)
    ref = gt.trace_reference(rays_o, rays_d, inputs, alive, sh_deg=3,
                             transmittance_min=CFG.transmittance_min)
    assert float(ref.alpha.max()) > 0.5  # rays actually hit things
    np.testing.assert_allclose(out.alpha, ref.alpha, atol=3e-5)
    np.testing.assert_allclose(out.color, ref.color, atol=3e-5)
    np.testing.assert_allclose(out.normal, ref.normal, atol=3e-5)
    np.testing.assert_allclose(out.feature, ref.feature, atol=3e-5)
    np.testing.assert_allclose(out.depth, ref.depth, atol=1e-4)


def test_gradients_match_brute_force(setup):
    inputs, alive, grid, rays_o, rays_d = setup
    cot_key = jax.random.PRNGKey(5)
    ks = jax.random.split(cot_key, 5)
    r, s = rays_o.shape[0], inputs.features.shape[-1]
    cot = gt.TraceOut(
        color=jax.random.normal(ks[0], (r, 3)),
        normal=jax.random.normal(ks[1], (r, 3)),
        feature=jax.random.normal(ks[2], (r, s)),
        depth=jax.random.normal(ks[3], (r,)),
        alpha=jax.random.normal(ks[4], (r,)),
        trans=jnp.zeros((r,)),   # cotangent on T not part of the parity set
    )

    def loss_prod(inp, ro, rd):
        out = gt.trace(ro, rd, grid, inp, cfg=CFG, sh_deg=3)
        return sum(jnp.vdot(a, b) for a, b in zip(out, cot))

    def loss_ref(inp, ro, rd):
        out = gt.trace_reference(ro, rd, inp, alive, sh_deg=3,
                                 transmittance_min=CFG.transmittance_min)
        return sum(jnp.vdot(a, b) for a, b in zip(out, cot))

    g1 = jax.grad(loss_prod, argnums=(0, 1, 2))(inputs, rays_o, rays_d)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(inputs, rays_o, rays_d)
    for (a, b, name) in [
        (g1[0].means3d, g2[0].means3d, "means3d"),
        (g1[0].opacity, g2[0].opacity, "opacity"),
        (g1[0].ru, g2[0].ru, "ru"),
        (g1[0].rv, g2[0].rv, "rv"),
        (g1[0].normals, g2[0].normals, "normals"),
        (g1[0].shs, g2[0].shs, "shs"),
        (g1[0].features, g2[0].features, "features"),
        (g1[1], g2[1], "rays_o"),
        (g1[2], g2[2], "rays_d"),
    ]:
        scale = np.maximum(np.abs(np.asarray(b)).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4 * scale, rtol=2e-3,
                                   err_msg=f"grad mismatch: {name}")


def test_single_surfel_analytic():
    # one axis-aligned surfel at origin, ray straight down the z axis:
    # alpha = opacity, depth = distance, normal flipped toward ray origin
    inputs = gt.TraceInputs(
        means3d=jnp.zeros((1, 3)),
        opacity=jnp.array([0.7]),
        ru=jnp.array([[10.0, 0, 0]]),
        rv=jnp.array([[0, 10.0, 0]]),
        normals=jnp.array([[0.0, 0, 1.0]]),
        shs=jnp.zeros((1, 16, 3)),
        features=jnp.ones((1, 2)),
    )
    alive = jnp.ones(1, bool)
    radius = gt.bounding_radius(inputs.opacity, jnp.array([[0.1, 0.1]]), CFG.alpha_min)
    grid = gt.build_grid(inputs.means3d, radius, alive, grid_res=8,
                         pair_capacity=256, span_cap=4)
    cfg = gt.TracerConfig(grid_res=8, pair_capacity=256, max_cells=8, max_hits=16, hit_budget=16)
    ro = jnp.array([[0.0, 0.0, -2.0], [0.03, 0.0, -2.0], [5.0, 5.0, -2.0]])
    rd = jnp.array([[0.0, 0.0, 1.0]] * 3)
    out = gt.trace(ro, rd, grid, inputs, cfg=cfg, sh_deg=0)
    np.testing.assert_allclose(out.alpha[0], 0.7, atol=1e-6)
    np.testing.assert_allclose(out.depth[0], 0.7 * 2.0, atol=1e-5)   # w * d
    np.testing.assert_allclose(out.normal[0], [0, 0, -0.7], atol=1e-6)
    # offset ray: alpha = 0.7 * exp(-0.5*(0.3)^2)
    np.testing.assert_allclose(out.alpha[1], 0.7 * np.exp(-0.5 * 0.3 ** 2), rtol=1e-5)
    # miss
    np.testing.assert_allclose(out.alpha[2], 0.0, atol=1e-7)


def test_normalize_trace_saturation():
    out = gt.TraceOut(color=jnp.array([[0.5, 0.5, 0.5]]), normal=jnp.zeros((1, 3)),
                      feature=jnp.zeros((1, 0)), depth=jnp.array([1.0]),
                      alpha=jnp.array([0.98]), trans=jnp.array([0.02]))
    norm = gt.normalize_trace(out, transmittance_min=0.03)
    np.testing.assert_allclose(norm.alpha[0], 1.0)
    np.testing.assert_allclose(norm.color[0], np.array([0.5] * 3) / 0.98, rtol=1e-6)


def _dense_setup(n=192, r=96):
    """Dense scene where tight budgets truncate rays that are still
    transmissive — the regime the segmented re-trace exists for."""
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 8)
    means = jax.random.uniform(ks[0], (n, 3), minval=-1.0, maxval=1.0)
    scales = jnp.exp(jax.random.uniform(ks[1], (n, 2), minval=-3.2, maxval=-2.2))
    quats = math3d.quat_normalize(jax.random.normal(ks[2], (n, 4)))
    R = math3d.quat_to_rotmat(quats)
    # low opacity so transmittance stays above 0.03 through many hits
    inputs = gt.TraceInputs(
        means3d=means, opacity=jnp.full((n,), 0.35),
        ru=R[:, :, 0] / scales[:, 0:1], rv=R[:, :, 1] / scales[:, 1:2],
        normals=R[:, :, 2],
        shs=jax.random.normal(ks[4], (n, 16, 3)) * 0.3,
        features=jax.random.uniform(ks[5], (n, 4)))
    alive = jnp.ones(n, bool)
    radius = gt.bounding_radius(inputs.opacity, scales, 1.0 / 255.0)
    cfg = gt.TracerConfig(grid_res=16, pair_capacity=2 ** 16, max_cells=12,
                          max_hits=32, hit_budget=6, span_cap=8,
                          n_segments=8, retrace_frac=1.0)
    grid = gt.build_grid(inputs.means3d, radius, alive, grid_res=cfg.grid_res,
                         pair_capacity=cfg.pair_capacity, span_cap=cfg.span_cap)
    rays_o, rays_d = make_rays(jax.random.PRNGKey(9), r=r)
    return inputs, alive, grid, rays_o, rays_d, cfg


def test_retrace_reduces_truncation_bias():
    """trace_segments must approach the unbounded oracle where the
    single-pass budgets truncate (≙ 're-trace until T < 0.03',
    gaussiantrace_forward.cu:27-103)."""
    import dataclasses
    inputs, alive, grid, rays_o, rays_d, cfg = _dense_setup()

    ref = gt.trace_reference(rays_o, rays_d, inputs, alive, sh_deg=3)
    one = gt.trace(rays_o, rays_d, grid, inputs,
                   cfg=dataclasses.replace(cfg, n_segments=1), sh_deg=3)
    seg = gt.trace_segments(rays_o, rays_d, grid, inputs, cfg=cfg, sh_deg=3)

    err1 = float(jnp.abs(one.color - ref.color).mean())
    errs = float(jnp.abs(seg.color - ref.color).mean())
    # the single-pass trace must actually be truncating for this test to
    # mean anything, and the re-trace must recover most of it (each segment
    # blends at most hit_budget more hits, like the CUDA 16-slot k-buffer)
    assert err1 > 5e-2, f"scene not dense enough: err1={err1}"
    assert errs < err1 * 0.1, f"retrace err {errs} vs single {err1}"
    assert float(jnp.abs(seg.alpha - ref.alpha).mean()) < 0.02
    assert float(jnp.abs(seg.trans - ref.trans).mean()) < 0.02


def test_retrace_gradients_match_oracle():
    """Gradients through the re-trace (carried T is differentiable) must
    match the unbounded oracle's."""
    inputs, alive, grid, rays_o, rays_d, cfg = _dense_setup(n=128, r=48)
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    r, s = rays_o.shape[0], inputs.features.shape[-1]
    cot = gt.TraceOut(
        color=jax.random.normal(ks[0], (r, 3)),
        normal=jax.random.normal(ks[1], (r, 3)),
        feature=jax.random.normal(ks[2], (r, s)),
        depth=0.1 * jax.random.normal(ks[3], (r,)),
        alpha=jax.random.normal(ks[4], (r,)),
        trans=jnp.zeros((r,)),
    )

    def loss_seg(inp, ro, rd):
        out = gt.trace_segments(ro, rd, grid, inp, cfg=cfg, sh_deg=2)
        return sum(jnp.vdot(a, b) for a, b in zip(out, cot))

    def loss_ref(inp, ro, rd):
        out = gt.trace_reference(ro, rd, inp, alive, sh_deg=2)
        return sum(jnp.vdot(a, b) for a, b in zip(out, cot))

    g1 = jax.grad(loss_seg, argnums=(0, 1, 2))(inputs, rays_o, rays_d)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(inputs, rays_o, rays_d)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        scale = np.maximum(np.abs(np.asarray(b)).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3 * scale, rtol=2e-2)


def test_make_trace_fn_chunked_retrace_matches_direct():
    """The chunked make_trace_fn path (coherence sort + per-chunk blends +
    global re-trace rounds) must equal the direct trace_segments result."""
    import dataclasses
    from irgs_tpu.render import ir
    from irgs_tpu.scene import toy

    params, aux = toy.make_sphere_scene(n_surface=512, n_capacity=1024,
                                        env_resolution=8)
    cfg = gt.TracerConfig(grid_res=16, pair_capacity=2 ** 15, max_cells=8,
                          max_hits=16, hit_budget=6, n_segments=3,
                          retrace_frac=1.0)
    grid = gt.build_grid_from_gaussians(params, aux, cfg)
    rays_o, rays_d = make_rays(jax.random.PRNGKey(11), r=1024)

    # chunked: ray_chunk=256 forces the sort/chunk/retrace code path
    tf = ir.make_trace_fn(params, aux, grid, cfg, jnp.zeros(3), sh_deg=3,
                          ray_chunk=256)
    out_chunked = tf(rays_o, rays_d)

    # direct (no chunking)
    from irgs_tpu.utils import math3d as m3
    s = params.get_scaling()
    R = m3.quat_to_rotmat(params.rotation)
    inputs = gt.TraceInputs(
        means3d=params.xyz,
        opacity=jnp.where(aux.alive, params.get_opacity()[:, 0], 0.0),
        ru=R[:, :, 0] / s[:, 0:1], rv=R[:, :, 1] / s[:, 1:2],
        normals=params.world_normals(cam_pos=jnp.zeros(3)),
        shs=params.get_features(),
        features=jnp.zeros((params.n_capacity, 0), jnp.float32))
    direct = gt.normalize_trace(
        gt.trace_segments(rays_o, rays_d, grid, inputs, cfg=cfg, sh_deg=3),
        cfg.transmittance_min)

    np.testing.assert_allclose(np.asarray(out_chunked.alpha),
                               np.asarray(direct.alpha), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_chunked.color),
                               np.asarray(direct.color), atol=1e-5)
    assert float(direct.alpha.max()) > 0.5


def test_trace_reference_coplanar_tie_order():
    """Coplanar splats produce EXACT depth ties; the oracle must blend them
    in stable index order (the grid tracer's select tie-break) or its output
    becomes backend-dependent — an unstable single-key payload sort cost
    26 dB of oracle parity on the shadow scene (round 3)."""
    n = 6
    # n coplanar unit disks at z=0, all covering the origin, alphas distinct
    inputs = gt.TraceInputs(
        means3d=jnp.zeros((n, 3)),
        opacity=jnp.linspace(0.2, 0.9, n),
        ru=jnp.tile(jnp.array([[8.0, 0, 0]]), (n, 1)),
        rv=jnp.tile(jnp.array([[0, 8.0, 0]]), (n, 1)),
        normals=jnp.tile(jnp.array([[0.0, 0, 1.0]]), (n, 1)),
        shs=jnp.arange(n, dtype=jnp.float32)[:, None, None]
            * jnp.ones((n, 16, 3)) * 0.05,
        features=jnp.zeros((n, 0)),
    )
    alive = jnp.ones(n, bool)
    ro = jnp.array([[0.0, 0.0, -2.0]])
    rd = jnp.array([[0.0, 0.0, 1.0]])
    out = gt.trace_reference(ro, rd, inputs, alive, sh_deg=0)

    # hand-rolled stable front-to-back blend in index order
    a = np.asarray(inputs.opacity)
    T = np.cumprod(np.concatenate([[1.0], 1.0 - a]))[:-1]
    w = a * T
    w[T <= 0.03] = 0.0
    base = np.maximum(np.asarray(inputs.shs)[:, 0, :] * 0.282095 + 0.5, 0.0)
    np.testing.assert_allclose(np.asarray(out.color[0]), w @ base, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.alpha[0]), w.sum(), rtol=1e-5)


@pytest.mark.parametrize("topk", [False, True])
def test_tiled_select_coplanar_tie_order(topk):
    """The production select paths must blend EXACT coplanar depth ties in
    gaussian-index order, matching the oracle (both k-buffer extraction
    modes: the two-key sort's pair_pos key, and top_k's lower-index-first
    stability over the pair-ordered lane axis)."""
    n = 6
    inputs = gt.TraceInputs(
        means3d=jnp.zeros((n, 3)),
        opacity=jnp.linspace(0.2, 0.9, n),
        ru=jnp.tile(jnp.array([[8.0, 0, 0]]), (n, 1)),
        rv=jnp.tile(jnp.array([[0, 8.0, 0]]), (n, 1)),
        normals=jnp.tile(jnp.array([[0.0, 0, 1.0]]), (n, 1)),
        shs=jnp.arange(n, dtype=jnp.float32)[:, None, None]
            * jnp.ones((n, 16, 3)) * 0.05,
        features=jnp.zeros((n, 0)),
    )
    alive = jnp.ones(n, bool)
    cfgt = gt.TracerConfig(grid_res=8, pair_capacity=2 ** 12, max_cells=8,
                           span_cap=8, select_tiles=4, tile=8, hit_budget=8,
                           select_topk=topk, tiled_direct=topk)
    grid = gt.build_grid(inputs.means3d,
                         gt.bounding_radius(inputs.opacity,
                                            jnp.full((n, 2), 1 / 8.0),
                                            cfgt.alpha_min),
                         alive, grid_res=cfgt.grid_res,
                         pair_capacity=cfgt.pair_capacity,
                         normals=inputs.normals, span_cap=cfgt.span_cap)
    ro = jnp.array([[0.0, 0.0, -2.0]])
    rd = jnp.array([[0.0, 0.0, 1.0]])
    out = gt.trace(ro, rd, grid, inputs, cfg=cfgt, sh_deg=0)
    ref = gt.trace_reference(ro, rd, inputs, alive, sh_deg=0)
    np.testing.assert_allclose(np.asarray(out.color[0]),
                               np.asarray(ref.color[0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.alpha[0]),
                               np.asarray(ref.alpha[0]), rtol=1e-5)


def test_two_tier_prefilter_matches_brute_force(setup):
    """Two-tier select (wide cheap screen -> narrow exact slots) must stay
    oracle-exact: the tier-1 ray-line-distance test is conservative (a
    rejected candidate provably has alpha < alpha_min), and with segments
    the re-trace resumes exactly where the examined width E ended."""
    inputs, alive, grid, rays_o, rays_d = setup
    cfg2 = gt.TracerConfig(
        grid_res=16, pair_capacity=2 ** 15, max_cells=48, span_cap=8,
        prefilter_width=192, max_hits=32, hit_budget=32,
        n_segments=6, retrace_frac=1.0)
    out = gt.trace_segments(rays_o, rays_d, grid, inputs,
                            cfg=cfg2, sh_deg=3)
    ref = gt.trace_reference(rays_o, rays_d, inputs, alive, sh_deg=3,
                             transmittance_min=cfg2.transmittance_min)
    np.testing.assert_allclose(out.alpha, ref.alpha, atol=3e-5)
    np.testing.assert_allclose(out.color, ref.color, atol=3e-5)
    np.testing.assert_allclose(out.feature, ref.feature, atol=3e-5)


def test_two_tier_gradients_match_oracle(setup):
    """Gradients through the two-tier path (fixed replayed hit list) must
    match the brute-force oracle's."""
    inputs, alive, grid, rays_o, rays_d = setup
    cfg2 = gt.TracerConfig(
        grid_res=16, pair_capacity=2 ** 15, max_cells=48, span_cap=8,
        prefilter_width=192, max_hits=48, hit_budget=48,
        n_segments=4, retrace_frac=1.0)

    def loss(ins, ro, rd, fn):
        out = fn(ro, rd, ins)
        return (jnp.sum(out.color ** 2) + jnp.sum(out.alpha)
                + 0.1 * jnp.sum(out.feature))

    g1 = jax.grad(loss, argnums=(0, 1, 2))(
        inputs, rays_o, rays_d,
        lambda ro, rd, ins: gt.trace_segments(ro, rd, grid, ins, cfg=cfg2,
                                              sh_deg=3))
    g2 = jax.grad(loss, argnums=(0, 1, 2))(
        inputs, rays_o, rays_d,
        lambda ro, rd, ins: gt.trace_reference(
            ro, rd, ins, alive, sh_deg=3,
            transmittance_min=cfg2.transmittance_min))
    for a, b, name in [(g1[0].means3d, g2[0].means3d, "means"),
                       (g1[0].opacity, g2[0].opacity, "opacity"),
                       (g1[0].shs, g2[0].shs, "shs"),
                       (g1[1], g2[1], "ray_o"), (g1[2], g2[2], "ray_d")]:
        scale = max(float(jnp.abs(b).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   atol=2e-4, err_msg=name)


@pytest.mark.parametrize("topk,direct", [(False, False), (True, False),
                                         (False, True), (True, True)])
def test_tiled_select_matches_brute_force(setup, topk, direct):
    """Tiled select (contiguous tile-block gathers + hit-cell dedup) must
    stay oracle-exact through the segmented re-trace — in both k-buffer
    extraction modes (full two-key sort / stable top_k) and in both
    segment-list modes (packed max_cells / direct unpacked)."""
    inputs, alive, grid, rays_o, rays_d = setup
    cfgt = gt.TracerConfig(
        grid_res=16, pair_capacity=2 ** 15, max_cells=48, span_cap=8,
        select_tiles=8, tile=64, hit_budget=32, select_topk=topk,
        tiled_direct=direct, n_segments=8, retrace_frac=1.0)
    out = gt.trace_segments(rays_o, rays_d, grid, inputs,
                            cfg=cfgt, sh_deg=3)
    ref = gt.trace_reference(rays_o, rays_d, inputs, alive, sh_deg=3,
                             transmittance_min=cfgt.transmittance_min)
    np.testing.assert_allclose(out.alpha, ref.alpha, atol=3e-5)
    np.testing.assert_allclose(out.color, ref.color, atol=3e-5)
    np.testing.assert_allclose(out.feature, ref.feature, atol=3e-5)
    np.testing.assert_allclose(out.normal, ref.normal, atol=3e-5)


def test_tiled_select_back_culling_flipped_normals(setup):
    """back_culling in the tiled select must use the STORED (camera-flipped)
    normal's sign, not raw ru x rv: the pair-table build folds the flip into
    ru's sign (_pair_tab_from_geom). Negate half the stored normals (the
    flip_align_view situation) and pin against the brute-force oracle."""
    inputs, alive, _, rays_o, rays_d = setup
    n = inputs.means3d.shape[0]
    sign = jnp.where(jnp.arange(n) % 2 == 0, -1.0, 1.0)[:, None]
    flipped = inputs._replace(normals=inputs.normals * sign)
    radius = gt.bounding_radius(
        flipped.opacity,
        jnp.stack([1.0 / jnp.linalg.norm(flipped.ru, axis=-1),
                   1.0 / jnp.linalg.norm(flipped.rv, axis=-1)], -1),
        CFG.alpha_min)
    grid = gt.build_grid(flipped.means3d, radius, alive,
                         grid_res=CFG.grid_res,
                         pair_capacity=CFG.pair_capacity,
                         span_cap=CFG.span_cap)
    cfgt = gt.TracerConfig(
        grid_res=16, pair_capacity=2 ** 15, max_cells=48, span_cap=8,
        select_tiles=8, tile=64, hit_budget=32, tiled_direct=True,
        n_segments=8, retrace_frac=1.0)
    out = gt.trace_segments(rays_o, rays_d, grid, flipped, cfg=cfgt,
                            sh_deg=3, back_culling=True)
    ref = gt.trace_reference(rays_o, rays_d, flipped, alive, sh_deg=3,
                             transmittance_min=cfgt.transmittance_min,
                             back_culling=True)
    assert float(ref.alpha.max()) > 0.3
    # culling must actually remove something vs the uncull trace
    ref_nocull = gt.trace_reference(rays_o, rays_d, flipped, alive, sh_deg=3,
                                    transmittance_min=cfgt.transmittance_min)
    assert float(jnp.abs(ref.alpha - ref_nocull.alpha).max()) > 1e-3
    np.testing.assert_allclose(out.alpha, ref.alpha, atol=3e-5)
    np.testing.assert_allclose(out.color, ref.color, atol=3e-5)


@pytest.mark.parametrize("direct", [False, True])
def test_tiled_select_gradients_match_oracle(setup, direct):
    inputs, alive, grid, rays_o, rays_d = setup
    cfgt = gt.TracerConfig(
        grid_res=16, pair_capacity=2 ** 15, max_cells=48, span_cap=8,
        select_tiles=8, tile=64, hit_budget=48, tiled_direct=direct,
        n_segments=8, retrace_frac=1.0)

    def loss(ins, ro, rd, fn):
        out = fn(ro, rd, ins)
        return (jnp.sum(out.color ** 2) + jnp.sum(out.alpha)
                + 0.1 * jnp.sum(out.feature))

    g1 = jax.grad(loss, argnums=(0, 1, 2))(
        inputs, rays_o, rays_d,
        lambda ro, rd, ins: gt.trace_segments(ro, rd, grid, ins, cfg=cfgt,
                                              sh_deg=3))
    g2 = jax.grad(loss, argnums=(0, 1, 2))(
        inputs, rays_o, rays_d,
        lambda ro, rd, ins: gt.trace_reference(
            ro, rd, ins, alive, sh_deg=3,
            transmittance_min=cfgt.transmittance_min))
    for a, b, name in [(g1[0].means3d, g2[0].means3d, "means"),
                       (g1[0].opacity, g2[0].opacity, "opacity"),
                       (g1[0].shs, g2[0].shs, "shs"),
                       (g1[1], g2[1], "ray_o"), (g1[2], g2[2], "ray_d")]:
        scale = max(float(jnp.abs(b).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   atol=2e-4, err_msg=name)
