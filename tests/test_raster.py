import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irgs_tpu.ops import surfel_raster as sr
from irgs_tpu.ops.surfel_raster_ref import rasterize_reference
from irgs_tpu.scene.cameras import Camera


def make_camera(w=64, h=64):
    # camera at z=-4 looking toward +z (c2w rotation = identity)
    R = np.eye(3)
    T = np.array([0.0, 0.0, 4.0])
    return Camera(0, R, T, fovx=0.8, fovy=0.8, image=None, width=w, height=h)


def make_scene(key, n=64, s=4):
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    means = jax.random.uniform(k1, (n, 3), minval=-1.0, maxval=1.0)
    scales = jnp.exp(jax.random.uniform(k2, (n, 2), minval=-3.0, maxval=-1.5))
    quats = jax.random.normal(k3, (n, 4))
    opac = jax.nn.sigmoid(jax.random.normal(k4, (n, 1)) + 1.0)
    shs = jax.random.normal(k5, (n, 16, 3)) * 0.3
    feats = jax.random.uniform(k6, (n, s))
    return means, scales, quats, opac, shs, feats


@pytest.fixture(scope="module")
def scene():
    return make_scene(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def cam():
    return make_camera()


def run_both(scene, cam, deg=3):
    means, scales, quats, opac, shs, feats = scene
    cp = cam.params()
    bg = jnp.array([0.1, 0.2, 0.3])
    off = jnp.zeros((means.shape[0], 2))
    kwargs = dict(img_w=cam.width, img_h=cam.height, active_sh_degree=deg)
    out = sr.rasterize(means, scales, quats, opac, shs, feats, off, cp, bg,
                       dup_capacity=2 ** 14, chunk=32, block=4, **kwargs)
    ref = rasterize_reference(means, scales, quats, opac, shs, feats, cp, bg,
                              means2d_offset=off, **kwargs)
    return out, ref


def test_forward_matches_reference(scene, cam):
    out, ref = run_both(scene, cam)
    assert int(out.overflow) == 0
    np.testing.assert_allclose(out.color, ref.color, atol=2e-5)
    np.testing.assert_allclose(out.feature, ref.feature, atol=2e-5)
    np.testing.assert_allclose(out.alpha, ref.alpha, atol=2e-5)
    np.testing.assert_allclose(out.depth, ref.depth, atol=1e-4)
    np.testing.assert_allclose(out.depth2, ref.depth2, atol=5e-4)
    np.testing.assert_allclose(out.depth_median, ref.depth_median, atol=1e-5)
    np.testing.assert_allclose(out.normal, ref.normal, atol=2e-5)
    np.testing.assert_allclose(out.distortion, ref.distortion, atol=1e-4, rtol=1e-3)
    assert float(out.alpha.max()) > 0.3  # scene actually renders something
    # the scene must actually exercise the median path
    assert float(jnp.abs(ref.depth_median).max()) > 0.1


def test_median_depth_gradient_routing(scene, cam):
    """dL/d(median depth) must flow only to the median contributor's depth
    (≙ backward.cu:372-373), for both production and oracle."""
    means, scales, quats, opac, shs, feats = scene
    cp = cam.params()
    bg = jnp.zeros(3)
    kwargs = dict(img_w=cam.width, img_h=cam.height, active_sh_degree=1)
    off = jnp.zeros((means.shape[0], 2))

    def loss_prod(m):
        out = sr.rasterize(m, scales, quats, opac, shs, feats, off, cp, bg,
                           dup_capacity=2 ** 14, chunk=32, block=4, **kwargs)
        return jnp.sum(out.depth_median)

    def loss_ref(m):
        out = rasterize_reference(m, scales, quats, opac, shs, feats, cp, bg,
                                  means2d_offset=off, **kwargs)
        return jnp.sum(out.depth_median)

    g1 = jax.grad(loss_prod)(means)
    g2 = jax.grad(loss_ref)(means)
    assert float(jnp.abs(g2).max()) > 1e-6  # gradient actually flows
    scale = np.maximum(np.abs(np.asarray(g2)).max(), 1e-8)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=2e-4 * scale, rtol=1e-3)


def test_preprocess_vs_independent_oracle(scene, cam):
    """sr.preprocess vs a from-scratch numpy re-derivation (quat via
    outer+skew identity, projection via focal lengths, AABB via dense 3σ
    boundary sampling, SH via a written-out polynomial table)."""
    from irgs_tpu.ops.surfel_raster_ref import preprocess_reference

    means, scales, quats, opac, shs, feats = scene
    cp = cam.params()
    prep = sr.preprocess(means, scales, quats, opac, shs, cp,
                         cam.width, cam.height, 3)
    oracle = preprocess_reference(means, scales, quats, opac, shs, cp,
                                  cam.width, cam.height, 3)

    valid = np.asarray(prep.valid)
    assert valid.sum() > 10
    np.testing.assert_allclose(np.asarray(prep.M)[valid],
                               oracle["M"][valid], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(prep.depth)[valid],
                               oracle["depth"][valid], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(prep.normal)[valid],
                               oracle["normal"][valid], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(prep.rgb)[valid],
                               oracle["rgb"][valid], rtol=1e-4, atol=1e-4)
    # AABB: production center within a pixel of the sampled conic midpoint;
    # production radius covers (and doesn't wildly exceed) the sampled extent
    c_err = np.abs(np.asarray(prep.center)[valid] - oracle["center"][valid])
    assert c_err.max() < 1.0, f"center err {c_err.max()}"
    ext = oracle["extent"][valid].max(axis=1)
    rad = np.asarray(prep.radius)[valid]
    assert np.all(rad >= ext - 1e-3)
    assert np.all(rad <= np.ceil(ext) + 1.0)


def test_gradients_match_reference(scene, cam):
    means, scales, quats, opac, shs, feats = scene
    cp = cam.params()
    bg = jnp.zeros(3)
    kwargs = dict(img_w=cam.width, img_h=cam.height, active_sh_degree=2)

    tgt = jax.random.uniform(jax.random.PRNGKey(7), (cam.height, cam.width, 3))

    def loss_prod(m, s, q, o, c, f, off):
        out = sr.rasterize(m, s, q, o, c, f, off, cp, bg,
                           dup_capacity=2 ** 14, chunk=32, block=4, **kwargs)
        return (jnp.abs(out.color - tgt).mean()
                + out.feature.mean() + 0.1 * out.distortion.mean()
                + out.normal.mean() + 0.01 * out.depth.mean())

    def loss_ref(m, s, q, o, c, f, off):
        out = rasterize_reference(m, s, q, o, c, f, cp, bg, means2d_offset=off, **kwargs)
        return (jnp.abs(out.color - tgt).mean()
                + out.feature.mean() + 0.1 * out.distortion.mean()
                + out.normal.mean() + 0.01 * out.depth.mean())

    off = jnp.zeros((means.shape[0], 2))
    args = (means, scales, quats, opac, shs, feats, off)
    g1 = jax.grad(loss_prod, argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    names = ["means", "scales", "quats", "opacity", "shs", "features", "means2d"]
    for a, b, nm in zip(g1, g2, names):
        scale = np.maximum(np.abs(np.asarray(b)).max(), 1e-8)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4 * scale,
                                   rtol=1e-3, err_msg=f"grad mismatch: {nm}")


def test_finite_difference_gradcheck(cam):
    # tiny scene, check d(loss)/d(opacity raw) against central differences.
    # fp64 needed: the fp32 loss (~1e3) rounds away the eps-sized perturbation.
    with jax.enable_x64():
        scene = jax.tree.map(lambda x: x.astype(jnp.float64),
                             make_scene(jax.random.PRNGKey(3), n=8))
        means, scales, quats, opac, shs, feats = scene
        cp = jax.tree.map(lambda x: x.astype(jnp.float64), cam.params())
        bg = jnp.zeros(3, jnp.float64)
        kwargs = dict(img_w=cam.width, img_h=cam.height, active_sh_degree=1)

        def loss(o):
            out = sr.rasterize(means, scales, quats, o, shs, feats,
                               jnp.zeros((8, 2), jnp.float64), cp, bg,
                               dup_capacity=2 ** 12, chunk=16, block=4, **kwargs)
            return jnp.sum(out.color ** 2)

        g = jax.grad(loss)(opac)
        eps = 1e-5
        for i in range(4):
            e = jnp.zeros_like(opac).at[i, 0].set(eps)
            fd = (loss(opac + e) - loss(opac - e)) / (2 * eps)
            np.testing.assert_allclose(g[i, 0], fd, rtol=1e-4, atol=1e-7)


def test_pallas_backend_interpret_parity():
    """blend_tiles fwd+bwd parity vs the XLA backend, run through Pallas
    INTERPRET mode on CPU — the CI guard for device-only kernel bugs of the
    bff0341 class (uninitialized padding, bad DMA windows)."""
    from irgs_tpu.ops import raster_pallas as rp

    cam = make_camera(w=32, h=32)
    scene = make_scene(jax.random.PRNGKey(5), n=48, s=4)
    means, scales, quats, opac, shs, feats = scene
    cp = cam.params()
    bg = jnp.array([0.2, 0.1, 0.4])
    off = jnp.zeros((means.shape[0], 2))
    kwargs = dict(img_w=32, img_h=32, active_sh_degree=2,
                  dup_capacity=2 ** 12)

    old = rp.INTERPRET
    rp.INTERPRET = True
    try:
        def run(backend):
            return sr.rasterize(means, scales, quats, opac, shs, feats, off,
                                cp, bg, chunk=32, block=4, backend=backend,
                                **kwargs)

        out_p = run("pallas")
        out_x = run("xla")
        for name in ("color", "feature", "alpha", "depth", "depth2",
                     "depth_median", "normal", "distortion"):
            np.testing.assert_allclose(
                np.asarray(getattr(out_p, name)),
                np.asarray(getattr(out_x, name)),
                atol=5e-5, rtol=1e-4, err_msg=f"pallas fwd mismatch: {name}")
        assert float(out_p.alpha.max()) > 0.2

        tgt = jax.random.uniform(jax.random.PRNGKey(11), (32, 32, 3))

        def loss(backend, m, s, q, o, c, f):
            out = sr.rasterize(m, s, q, o, c, f, off, cp, bg,
                               chunk=32, block=4, backend=backend, **kwargs)
            return (jnp.abs(out.color - tgt).mean() + out.feature.mean()
                    + 0.1 * out.distortion.mean() + out.normal.mean()
                    + 0.01 * out.depth.mean()
                    + 0.01 * out.depth_median.mean())

        args = (means, scales, quats, opac, shs, feats)
        gp = jax.grad(lambda *a: loss("pallas", *a), argnums=tuple(range(6)))(*args)
        gx = jax.grad(lambda *a: loss("xla", *a), argnums=tuple(range(6)))(*args)
        names = ["means", "scales", "quats", "opacity", "shs", "features"]
        for a, b, nm in zip(gp, gx, names):
            scale = np.maximum(np.abs(np.asarray(b)).max(), 1e-8)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4 * scale, rtol=2e-3,
                err_msg=f"pallas grad mismatch: {nm}")
    finally:
        rp.INTERPRET = old


def test_alive_mask_culls(scene, cam):
    means, scales, quats, opac, shs, feats = scene
    cp = cam.params()
    bg = jnp.zeros(3)
    kwargs = dict(img_w=cam.width, img_h=cam.height, active_sh_degree=0)
    off = jnp.zeros((means.shape[0], 2))
    dead = jnp.zeros(means.shape[0], bool)
    out = sr.rasterize(means, scales, quats, opac, shs, feats, off, cp, bg,
                       dup_capacity=2 ** 13, chunk=32, block=4, alive=dead, **kwargs)
    np.testing.assert_allclose(out.alpha, 0.0, atol=1e-7)
    assert int(out.radii.max()) == 0
