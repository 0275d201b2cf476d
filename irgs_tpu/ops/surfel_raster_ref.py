"""Brute-force per-pixel reference rasterizer (test oracle).

Evaluates every Gaussian at every pixel in global depth order, with the same
masks and blend semantics as the production two-pass rasterizer. O(H·W·N) —
only for tiny test scenes. This mirrors the reference's "python twin" test
pattern (scene/renderutils/ops.py use_python paths).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import surfel_raster as sr


def rasterize_reference(means3d, scales, quats, opacities, shs, features,
                        cam, bg_color, *, img_w, img_h, active_sh_degree,
                        alive=None, means2d_offset=None):
    prep = sr.preprocess(means3d, scales, quats, opacities, shs, cam,
                         img_w, img_h, active_sh_degree,
                         means2d_offset=means2d_offset, alive=alive)
    n = means3d.shape[0]
    order = jnp.argsort(prep.depth)

    M = prep.M[order]
    center = prep.center[order]
    opa = jnp.where(prep.valid, prep.opacity, 0.0)[order]
    rgb = prep.rgb[order]
    feat = features[order]
    normal = prep.normal[order]
    rect_min = prep.rect_min[order]
    rect_max = prep.rect_max[order]

    px = jnp.arange(img_w, dtype=jnp.float32)[None, :].repeat(img_h, 0).reshape(-1)
    py = jnp.arange(img_h, dtype=jnp.float32)[:, None].repeat(img_w, 1).reshape(-1)
    tx = (px // sr.TILE).astype(jnp.int32)
    ty = (py // sr.TILE).astype(jnp.int32)

    # [P, N] pairwise
    Tu, Tv, Tw = M[:, 0], M[:, 1], M[:, 2]
    k = px[:, None, None] * Tw[None] - Tu[None]
    l = py[:, None, None] * Tw[None] - Tv[None]
    p = jnp.cross(k, l)
    pz = p[..., 2]
    pz_safe = jnp.where(pz == 0, 1.0, pz)
    sx, sy = p[..., 0] / pz_safe, p[..., 1] / pz_safe
    rho3d = sx * sx + sy * sy
    dx = center[None, :, 0] - px[:, None]
    dy = center[None, :, 1] - py[:, None]
    rho2d = sr.FILTER_INV_SQUARE * (dx * dx + dy * dy)
    rho = jnp.minimum(rho3d, rho2d)
    depth = jnp.where(rho3d <= rho2d,
                      sx * Tw[None, :, 0] + sy * Tw[None, :, 1] + Tw[None, :, 2],
                      Tw[None, :, 2])

    in_rect = ((tx[:, None] >= rect_min[None, :, 0]) & (tx[:, None] < rect_max[None, :, 0])
               & (ty[:, None] >= rect_min[None, :, 1]) & (ty[:, None] < rect_max[None, :, 1]))
    alpha = jnp.minimum(0.99, opa[None, :] * jnp.exp(-0.5 * rho))
    bad = (pz == 0) | (depth < sr.NEAR_N) | (alpha < sr.ALPHA_EPS) | ~in_rect
    alpha = jnp.where(bad, 0.0, alpha)

    lg = jnp.log1p(-alpha)
    T = jnp.exp(jnp.cumsum(lg, axis=1) - lg)              # incoming transmittance
    w = alpha * T
    w = jnp.where(T * (1 - alpha) < sr.T_DONE, 0.0, w)

    color = w @ rgb
    feature = w @ feat
    nrm = w @ normal
    a = jnp.sum(w, axis=1)
    d = jnp.sum(w * depth, axis=1)
    d2 = jnp.sum(w * depth * depth, axis=1)

    m = sr.FAR_N / (sr.FAR_N - sr.NEAR_N) * (1 - sr.NEAR_N / jnp.maximum(depth, 1e-6))
    mw, m2w = m * w, m * m * w
    A = jnp.cumsum(w, 1) - w
    M1 = jnp.cumsum(mw, 1) - mw
    M2 = jnp.cumsum(m2w, 1) - m2w
    dist = jnp.sum(m * m * w * A + w * M2 - 2 * m * w * M1, axis=1)

    color = color + (1 - a)[:, None] * bg_color[None]

    def img(x):
        return x.reshape(img_h, img_w, -1) if x.ndim == 2 else x.reshape(img_h, img_w)

    return sr.RasterOut(
        color=img(color), feature=img(feature), alpha=img(a),
        depth=img(d), depth2=img(d2), normal=img(nrm), distortion=img(dist),
        radii=prep.radius.astype(jnp.int32), overflow=jnp.int32(0),
    )
