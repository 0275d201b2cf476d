"""Trainable lat-long environment light, pure JAX.

≙ reference `EnvLight` (scene/light.py:132-328): raw [H, W, 3] grid with
exp/sigmoid/none activation, equirect bilinear queries, a luminance·sin(θ)
pdf for importance sampling, categorical direction draws with in-texel
jitter, and the solid-angle-weighted pdf lookup used by the balance
heuristic. nvdiffrast's `dr.texture` is replaced by a hand-rolled bilinear
gather (wrap in longitude, clamp in latitude).

Direction convention (matches reference sample_light_directions,
light.py:181-205): for texel (u∈[0,1), v∈[0,1]),
  θ = vπ, φ = (2u-1)π,  dir = (sinθ·sinφ, cosθ, -sinθ·cosφ).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def activate(env_raw, activation: str):
    if activation == "exp":
        return jnp.exp(env_raw)
    if activation == "sigmoid":
        return jax.nn.sigmoid(env_raw)
    if activation == "softplus":
        # ≙ DirectLightMap (scene/light.py:379-406): softplus lat-long grid
        return jax.nn.softplus(env_raw)
    if activation == "none":
        return env_raw
    raise NotImplementedError(activation)


def init_env(resolution: int, init_value: float, activation: str = "exp"):
    h, w = resolution // 2, resolution
    if activation == "exp":
        raw = math.log(init_value)
    elif activation == "sigmoid":
        raw = math.log(init_value / (1 - init_value))
    elif activation == "softplus":
        raw = math.log(math.expm1(max(init_value, 1e-6)))
    else:
        raw = init_value
    return jnp.full((h, w, 3), raw, jnp.float32)


def init_direct_light(key, max_res: int = 16, init_value: float = 0.5):
    """≙ DirectLightMap.__init__ (light.py:381-387): uniform random
    [H=max_res, W=2·max_res, 3] raw grid, softplus activation.

    The full DirectLightMap surface = this init + query_env(...,
    activation="softplus") + build_pdf(..., activation="softplus"); wire it
    into training with --envmap_activation softplus (Stage2Static/EvalConfig
    env_activation). Note the reference class itself is dead code there —
    its only reference is a commented-out `as EnvLight` alias import
    (gaussian_model.py:9) — so this functional form is the complete parity
    surface, made reachable end-to-end."""
    return init_value * jax.random.uniform(key, (max_res, max_res * 2, 3))


def dirs_to_uv(dirs):
    """[..., 3] unit dirs -> equirect uv in [0, 1]² (light.py:309-312)."""
    u = jnp.arctan2(dirs[..., 0], -dirs[..., 2]) / (2.0 * jnp.pi) + 0.5
    v = jnp.arccos(jnp.clip(dirs[..., 1], -1 + 1e-6, 1 - 1e-6)) / jnp.pi
    return jnp.clip(jnp.nan_to_num(u), 0.0, 1.0), jnp.clip(v, 0.0, 1.0)


def bilinear_latlong(img, u, v):
    """Bilinear fetch from [H, W, C]: wrap in u (longitude), clamp in v."""
    h, w = img.shape[0], img.shape[1]
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    fx = fx[..., None]
    fy = fy[..., None]
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    return (v00 * (1 - fx) + v01 * fx) * (1 - fy) + (v10 * (1 - fx) + v11 * fx) * fy


def query_env(env_raw, dirs, activation: str = "exp", transform=None):
    """Radiance along world directions (mode='pure_env'; light.py:292-328)."""
    if transform is not None:
        dirs = dirs @ transform.T
    u, v = dirs_to_uv(dirs)
    light = bilinear_latlong(env_raw, u, v)
    return jnp.maximum(activate(light, activation), 0.0)


# ---------------------------------------------------------------------------
# Importance sampling (light.py:174-223)
# ---------------------------------------------------------------------------

def build_pdf(env_raw, activation: str = "exp"):
    """Normalized texel pdf: max-channel radiance × sin(θ) (light.py:174-179)."""
    h, w = env_raw.shape[:2]
    v = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    pdf = jnp.max(jnp.maximum(activate(env_raw, activation), 0.0), axis=-1)
    pdf = pdf * jnp.sin(v * jnp.pi)[:, None]
    return pdf / jnp.maximum(jnp.sum(pdf), 1e-20)


def _texel_to_dir(gx, gy):
    sinth, costh = jnp.sin(gy * jnp.pi), jnp.cos(gy * jnp.pi)
    sinph, cosph = jnp.sin(gx * jnp.pi), jnp.cos(gx * jnp.pi)
    return jnp.stack([sinth * sinph, costh, -sinth * cosph], axis=-1)


def sample_light_dirs(key, pdf, batch: int, sample_num: int, training: bool,
                      transform=None, pixel_ids=None):
    """Draw (batch, sample_num) directions ∝ pdf; returns dirs + pdf values.

    ≙ EnvLight.sample_light_directions (light.py:181-205): multinomial draw
    over flat texels, jittered inside the texel when training.

    `pixel_ids` [batch] int32: when given, each pixel's draws come from
    `fold_in(key, pixel_id)` — a pure function of the pixel's identity, not
    its batch slot, so results are invariant to chunking/compaction/eval
    order. (The reference's torch.multinomial consumes the global RNG
    sequentially and IS batch-slot-coupled; this is a strict improvement.)
    """
    h, w = pdf.shape
    logits = jnp.log(jnp.maximum(pdf.reshape(-1), 1e-30))
    if pixel_ids is not None:
        keys = jax.vmap(lambda p: jax.random.fold_in(key, p))(pixel_ids)
        idx = jax.vmap(
            lambda k: jax.random.categorical(k, logits, shape=(sample_num,))
        )(keys).reshape(-1)
    else:
        idx = jax.random.categorical(key, logits, shape=(batch * sample_num,))
    gx = ((idx % w).astype(jnp.float32) + 0.5) / w * 2.0 - 1.0
    gy = ((idx // w).astype(jnp.float32) + 0.5) / h
    if training:
        if pixel_ids is not None:
            jk = jax.vmap(lambda p: jax.random.fold_in(key, p + (1 << 24)))(
                pixel_ids)
            u = jax.vmap(lambda k: jax.random.uniform(k, (sample_num, 2)))(jk)
            u = u.reshape(-1, 2)
            gx = gx + (u[:, 0] - 0.5) / w * 2.0
            gy = gy + (u[:, 1] - 0.5) / h
        else:
            k1, k2 = jax.random.split(jax.random.fold_in(key, 1))
            gx = gx + (jax.random.uniform(k1, gx.shape) - 0.5) / w * 2.0
            gy = gy + (jax.random.uniform(k2, gy.shape) - 0.5) / h
    dirs = _texel_to_dir(gx, gy)
    if transform is not None:
        dirs = dirs @ transform
    dirs = dirs.reshape(batch, sample_num, 3)
    prob = light_pdf(pdf, dirs, transform=transform)
    return dirs, prob


def light_pdf(pdf, dirs, transform=None):
    """pdf value (per steradian) of directions [..., S, 3] -> [..., S, 1].

    ≙ EnvLight.light_pdf (light.py:207-223): texel probability × H·W/(2π²sinθ).
    """
    h, w = pdf.shape
    flat = dirs.reshape(-1, 3)
    if transform is not None:
        flat = flat @ transform.T
    u = jnp.nan_to_num(jnp.arctan2(flat[:, 0], -flat[:, 2])) / (2.0 * jnp.pi) + 0.5
    v = jnp.arccos(jnp.clip(flat[:, 1], -1 + 1e-6, 1 - 1e-6)) / jnp.pi
    ui = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    vi = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    weight = h * w / (2.0 * jnp.pi ** 2 * jnp.maximum(jnp.sin(v * jnp.pi), 1e-6))
    prob = pdf[vi, ui] * weight
    return prob.reshape(*dirs.shape[:-1], 1)


def env_image_dirs(h: int, w: int):
    """[H, W, 3] direction grid for rendering the envmap itself
    (≙ get_env_direction1, scene/gaussian_model.py:22-33)."""
    gy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    gx = -1.0 + 1.0 / w + (2.0 / w) * jnp.arange(w, dtype=jnp.float32)
    gyy, gxx = jnp.meshgrid(gy, gx, indexing="ij")
    return _texel_to_dir(gxx, gyy)
