import jax
import jax.numpy as jnp
import numpy as np

from irgs_tpu.scene import envlight
from irgs_tpu.render.sampling import fibonacci_sphere_sampling
from irgs_tpu.utils.math3d import safe_normalize


def test_pdf_normalized_and_integrates():
    env = jax.random.normal(jax.random.PRNGKey(0), (32, 64, 3))
    pdf = envlight.build_pdf(env)
    np.testing.assert_allclose(float(pdf.sum()), 1.0, rtol=1e-5)
    # MC estimate of ∫ pdf dω over the sphere should be ~1:
    # E_uniform[pdf(ω)] * 4π ≈ 1
    dirs = safe_normalize(jax.random.normal(jax.random.PRNGKey(1), (1, 200000, 3)))
    vals = envlight.light_pdf(pdf, dirs)[0, :, 0]
    est = float(vals.mean() * 4 * np.pi)
    assert abs(est - 1.0) < 0.05, est


def test_sample_light_dirs_consistent_with_pdf():
    # sharp one-blob env: sampled dirs should concentrate where pdf is high
    env = np.full((16, 32, 3), -10.0, np.float32)
    env[8, 10] = 3.0
    env = jnp.asarray(env)
    pdf = envlight.build_pdf(env)
    dirs, prob = envlight.sample_light_dirs(jax.random.PRNGKey(2), pdf, 4, 256,
                                            training=False)
    assert dirs.shape == (4, 256, 3)
    # all sampled dirs map back to high pdf
    assert float(prob.min()) > 0
    # radiance at sampled dirs should be the blob value
    rad = envlight.query_env(env, dirs)
    frac_hot = float((rad[..., 0] > 1.0).mean())
    assert frac_hot > 0.95


def test_query_env_roundtrip_texel_centers():
    # positive values: query_env clamps negatives like the reference
    # (light.py:328 .clamp_min(0.0))
    env = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (16, 32, 3)))
    dirs = envlight.env_image_dirs(16, 32)
    out = envlight.query_env(env, dirs, activation="none")
    np.testing.assert_allclose(out, env, atol=1e-4)


def test_fibonacci_sampling_hemisphere():
    key = jax.random.PRNGKey(4)
    normals = safe_normalize(jax.random.normal(key, (32, 3)))
    dirs, areas = fibonacci_sphere_sampling(normals, 64, key=None)
    assert dirs.shape == (32, 64, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(dirs), axis=-1), 1.0, atol=1e-5)
    cos = jnp.sum(dirs * normals[:, None], axis=-1)
    assert float(cos.min()) > 0.0  # all in upper hemisphere (z clamped at sin10°)
    np.testing.assert_allclose(np.asarray(areas), 2 * np.pi)


def test_mc_white_furnace():
    # uniform env radiance 1: integral of V·L·cosθ/π over hemisphere == 1
    # with fibonacci sampling areas 2π and f_d = 1/π:
    # mean(L * area * cosθ / π) ≈ 1 for dense samples
    normals = jnp.array([[0.0, 0.0, 1.0]])
    dirs, areas = fibonacci_sphere_sampling(normals, 4096, key=None)
    cos = jnp.clip(jnp.sum(dirs * normals[:, None], -1, keepdims=True), 0, None)
    est = float(jnp.mean(1.0 * areas * cos / np.pi))
    # the reference clamps z at sin(10°) (graphics_utils.py:27) which biases
    # the estimator to ~1.030 deterministically; we reproduce that exactly
    assert abs(est - 1.030) < 0.005, est
