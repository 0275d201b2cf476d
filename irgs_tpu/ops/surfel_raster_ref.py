"""Brute-force per-pixel reference rasterizer (test oracle).

Evaluates every Gaussian at every pixel in global depth order, with the same
masks and blend semantics as the production two-pass rasterizer. O(H·W·N) —
only for tiny test scenes. This mirrors the reference's "python twin" test
pattern (scene/renderutils/ops.py use_python paths).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from . import surfel_raster as sr


def preprocess_reference(means3d, scales, quats, opacities, shs, cam,
                         img_w: int, img_h: int, active_sh_degree: int,
                         n_boundary: int = 4096):
    """INDEPENDENT per-Gaussian preprocess oracle (numpy, looped).

    Re-derives the observable semantics of compute_transmat / compute_aabb /
    computeColorFromSH (forward.cu:77-159, :22-73) from first principles —
    quaternion via the outer-product+skew identity, the pixel projection via
    focal lengths instead of the composed P@V matrix, and the screen AABB by
    densely sampling the 3σ ellipse boundary — so it shares no code path
    with `sr.preprocess` (which a sign/convention bug could otherwise make
    self-consistent).

    Returns dict(M, center_lo, center_hi, depth, normal, rgb, radius_min)
    where [center_lo, center_hi] brackets the sampled per-axis pixel extent
    and radius_min is the sampled max half-extent (production radius must be
    >= radius_min and center must sit inside the bracket midpoint ± tol).
    """
    means3d = np.asarray(means3d, np.float64)
    scales = np.asarray(scales, np.float64)
    quats = np.asarray(quats, np.float64)
    shs = np.asarray(shs, np.float64)
    w2c = np.asarray(cam.w2c, np.float64)
    cam_pos = np.asarray(cam.cam_pos, np.float64)
    fx, fy = float(cam.fx), float(cam.fy)
    cx, cy = (img_w - 1) / 2.0, (img_h - 1) / 2.0
    n = means3d.shape[0]

    def pix_lin(p):           # linear part of the pixel-homogeneous map
        return np.array([fx * p[0] + cx * p[2], fy * p[1] + cy * p[2], p[2]])

    theta = np.linspace(0.0, 2.0 * np.pi, n_boundary, endpoint=False)
    bu, bv = 3.0 * np.cos(theta), 3.0 * np.sin(theta)

    M = np.zeros((n, 3, 3))
    ctr_mid = np.zeros((n, 2))
    ext = np.zeros((n, 2))
    depth = np.zeros(n)
    normal = np.zeros((n, 3))
    rgb = np.zeros((n, 3))
    for i in range(n):
        q = quats[i] / np.linalg.norm(quats[i])
        w, v = q[0], q[1:]
        skew = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        R = (w * w - v @ v) * np.eye(3) + 2.0 * np.outer(v, v) + 2.0 * w * skew
        tu = scales[i, 0] * R[:, 0]
        tv = scales[i, 1] * R[:, 1]

        Rv, tcam = w2c[:3, :3], w2c[:3, 3]
        mean_v = Rv @ means3d[i] + tcam
        tu_v, tv_v = Rv @ tu, Rv @ tv
        Lu, Lv, Lc = pix_lin(tu_v), pix_lin(tv_v), pix_lin(mean_v)
        # row r of M = coefficients of pixel-homogeneous coordinate r over (u,v,1)
        M[i] = np.stack([np.stack([Lu[r], Lv[r], Lc[r]]) for r in range(3)])

        # boundary of the 3σ disk, projected: [2, n_boundary]
        hom = (np.outer(Lu, bu) + np.outer(Lv, bv) + Lc[:, None])
        pix = hom[:2] / hom[2:3]
        ctr_mid[i] = (pix.max(axis=1) + pix.min(axis=1)) / 2.0
        ext[i] = (pix.max(axis=1) - pix.min(axis=1)) / 2.0

        depth[i] = mean_v[2]
        nrm_v = Rv @ R[:, 2]
        normal[i] = nrm_v if -(mean_v @ nrm_v) > 0 else -nrm_v

        # SH -> RGB: real spherical harmonics written out from the standard
        # table (different code path from utils/sh.py's eval_sh)
        d = means3d[i] - cam_pos
        d = d / np.linalg.norm(d)
        x, y, z = d
        basis = [0.28209479177387814]
        if active_sh_degree >= 1:
            basis += [-0.4886025119029199 * y, 0.4886025119029199 * z,
                      -0.4886025119029199 * x]
        if active_sh_degree >= 2:
            basis += [1.0925484305920792 * x * y, -1.0925484305920792 * y * z,
                      0.31539156525252005 * (2 * z * z - x * x - y * y),
                      -1.0925484305920792 * x * z,
                      0.5462742152960396 * (x * x - y * y)]
        if active_sh_degree >= 3:
            basis += [-0.5900435899266435 * y * (3 * x * x - y * y),
                      2.890611442640554 * x * y * z,
                      -0.4570457994644658 * y * (4 * z * z - x * x - y * y),
                      0.3731763325901154 * z * (2 * z * z - 3 * x * x - 3 * y * y),
                      -0.4570457994644658 * x * (4 * z * z - x * x - y * y),
                      1.445305721320277 * z * (x * x - y * y),
                      -0.5900435899266435 * x * (x * x - 3 * y * y)]
        rgb[i] = np.maximum(
            np.asarray(basis) @ shs[i, :len(basis)] + 0.5, 0.0)

    return dict(M=M, center=ctr_mid, extent=ext, depth=depth, normal=normal,
                rgb=rgb)


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

    # median depth: last contributing splat with incoming T > 0.5
    # (forward.cu:418-421); independent selection via masked argmax on the
    # depth-order index
    mmask = (w > 0) & (T > 0.5)
    ordi = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float32)[None], w.shape)
    mord = jnp.max(jnp.where(mmask, ordi, -1.0), axis=1)
    dmed = jnp.sum(jnp.where(mmask & (ordi == mord[:, None]), depth, 0.0), axis=1)

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
        depth=img(d), depth2=img(d2), depth_median=img(dmed),
        normal=img(nrm), distortion=img(dist),
        radii=prep.radius.astype(jnp.int32), overflow=jnp.int32(0),
    )
