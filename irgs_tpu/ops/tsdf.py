"""TSDF fusion, SDF ray marching, and mesh extraction — pure JAX.

Replaces two reference native pieces:
* open3d's ScalableTSDFVolume fusion + marching cubes
  (GaussianExtractor.extract_mesh_bounded, utils/mesh_utils.py:140-183),
* the `raytracing` CUDA mesh-BVH caster used for stage-1 reflection
  visibility (raytracing/raytracer.py:21-55).

TPU re-design: a *dense* bounded voxel grid. Fusion is a per-view projective
scatter-free update (every voxel projects into the depth map — dense math,
no atomics). Visibility queries ray-march the fused TSDF directly instead of
tracing a triangle BVH: same "did the reflected ray hit geometry before
t=10" semantics (refl_utils.py:82-96) without ever materializing a mesh.
Mesh artifacts (PLY export) use marching *tetrahedra* — simpler than
marching cubes (no 256-case tables) at the cost of ~2x triangles.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class TSDFVolume(NamedTuple):
    tsdf: jnp.ndarray      # [R, R, R] in [-1, 1] (truncated, normalized)
    weight: jnp.ndarray    # [R, R, R]
    origin: jnp.ndarray    # [3]
    voxel: jnp.ndarray     # scalar voxel size


def init_volume(bb_min, bb_max, res: int) -> TSDFVolume:
    voxel = jnp.max(bb_max - bb_min) / res
    return TSDFVolume(
        tsdf=jnp.ones((res, res, res)),
        weight=jnp.zeros((res, res, res)),
        origin=jnp.asarray(bb_min, jnp.float32),
        voxel=jnp.asarray(voxel, jnp.float32),
    )


@jax.jit
def integrate(vol: TSDFVolume, depth, rgb_unused, cam_w2c, fx, fy, cx, cy,
              sdf_trunc, depth_trunc) -> TSDFVolume:
    """Fuse one depth map (≙ ScalableTSDFVolume.integrate semantics)."""
    res = vol.tsdf.shape[0]
    idx = jnp.arange(res, dtype=jnp.float32) + 0.5
    zz, yy, xx = jnp.meshgrid(idx, idx, idx, indexing="ij")
    pts = jnp.stack([xx, yy, zz], -1) * vol.voxel + vol.origin   # [R,R,R,3]

    pc = pts @ cam_w2c[:3, :3].T + cam_w2c[:3, 3]
    z = pc[..., 2]
    u = pc[..., 0] / jnp.maximum(z, 1e-6) * fx + cx
    v = pc[..., 1] / jnp.maximum(z, 1e-6) * fy + cy
    h, w = depth.shape
    ui = jnp.clip(u.astype(jnp.int32), 0, w - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, h - 1)
    d = depth[vi, ui]
    valid = ((z > 0) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
             & (d > 0) & (d < depth_trunc))
    sdf = d - z
    valid = valid & (sdf > -sdf_trunc)
    tsdf_new = jnp.clip(sdf / sdf_trunc, -1.0, 1.0)

    w_old = vol.weight
    w_new = w_old + valid.astype(jnp.float32)
    fused = jnp.where(
        valid, (vol.tsdf * w_old + tsdf_new) / jnp.maximum(w_new, 1e-6), vol.tsdf)
    return vol._replace(tsdf=fused, weight=w_new)


def _sample_tsdf(vol: TSDFVolume, p):
    """Trilinear TSDF sample at world points [..., 3] (+inf outside)."""
    res = vol.tsdf.shape[0]
    g = (p - vol.origin) / vol.voxel - 0.5
    g0 = jnp.floor(g)
    f = g - g0
    gi = g0.astype(jnp.int32)

    def at(dx, dy, dz):
        q = jnp.clip(gi + jnp.array([dx, dy, dz]), 0, res - 1)
        return vol.tsdf[q[..., 2], q[..., 1], q[..., 0]]

    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    c = ((at(0, 0, 0) * (1 - fx) + at(1, 0, 0) * fx) * (1 - fy)
         + (at(0, 1, 0) * (1 - fx) + at(1, 1, 0) * fx) * fy)
    c2 = ((at(0, 0, 1) * (1 - fx) + at(1, 0, 1) * fx) * (1 - fy)
          + (at(0, 1, 1) * (1 - fx) + at(1, 1, 1) * fx) * fy)
    val = c * (1 - fz) + c2 * fz
    inside = jnp.all((g >= 0) & (g < res - 1), axis=-1)
    return jnp.where(inside, val, 1.0)


@functools.partial(jax.jit, static_argnames=("max_steps",))
def ray_march_visibility(vol: TSDFVolume, rays_o, rays_d, *, t_max: float = 10.0,
                         max_steps: int = 256, t_min: float = 0.05):
    """March rays through the TSDF; returns (hit_depth, visible).

    visible = no zero crossing before t_max (≙ mesh RayTracer depth >= 10
    check, refl_utils.py:86-88). Fixed-step marching at one-voxel strides
    with a bisection-free linear zero locate.
    """
    step = vol.voxel
    n = rays_o.shape[0]

    def body(i, carry):
        t, depth, hit, prev = carry
        p = rays_o + t[:, None] * rays_d
        s = _sample_tsdf(vol, p)
        crossed = (prev > 0) & (s <= 0) & ~hit & (t > t_min)
        # linear interpolation of the crossing point
        frac = prev / jnp.maximum(prev - s, 1e-9)
        t_hit = t - step + frac * step
        depth = jnp.where(crossed, t_hit, depth)
        hit = hit | crossed
        return t + step, depth, hit, s

    t0 = jnp.full((n,), t_min)
    depth0 = jnp.full((n,), t_max)
    state = (t0, depth0, jnp.zeros(n, bool), jnp.ones(n))
    steps = min(max_steps, int(1e9))
    _, depth, hit, _ = jax.lax.fori_loop(0, steps, body, state)
    return depth, ~hit


# ---------------------------------------------------------------------------
# marching tetrahedra mesh extraction
# ---------------------------------------------------------------------------

# six tetrahedra per cube (corner indices into the 8 cube corners)
_TETS = np.array([
    [0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
    [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6],
], np.int32)
_CUBE = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                  [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.int32)


def extract_mesh(vol: TSDFVolume, level: float = 0.0,
                 weight_min: float = 1.0):
    """Triangle mesh at the TSDF zero level set via marching tetrahedra.

    Host-side numpy (meshing is an offline artifact step, like the
    reference's open3d call). Returns (verts [V, 3], faces [F, 3]).
    """
    tsdf = np.asarray(vol.tsdf)
    weight = np.asarray(vol.weight)
    res = tsdf.shape[0]
    origin = np.asarray(vol.origin)
    voxel = float(vol.voxel)

    # mask unobserved space
    vals = np.where(weight >= weight_min, tsdf, 1.0)

    # corner values per cube [res-1]^3 x 8
    base = np.stack(np.meshgrid(np.arange(res - 1), np.arange(res - 1),
                                np.arange(res - 1), indexing="ij"), -1)  # z,y,x
    base = base[..., ::-1]                                   # -> x,y,z
    corners = base[..., None, :] + _CUBE[None, None, None]   # [...,8,3]
    cv = vals[corners[..., 2], corners[..., 1], corners[..., 0]]  # [...,8]

    # only cubes with a sign change
    sign = cv < level
    active = (sign.any(-1)) & (~sign.all(-1))
    cidx = np.argwhere(active)
    if len(cidx) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    ccv = cv[active]                                        # [M, 8]
    cbase = base[active]                                    # [M, 3]

    verts_out = []
    faces_out = []
    vcount = 0
    corner_pos = (cbase[:, None, :] + _CUBE[None]) * voxel + origin + 0.5 * voxel

    for tet in _TETS:
        tv = ccv[:, tet]                                    # [M, 4]
        tp = corner_pos[:, tet]                             # [M, 4, 3]
        neg = tv < level                                    # [M, 4]
        nneg = neg.sum(-1)

        # three cases: 1 corner inside (triangle), 3 inside (triangle),
        # 2 inside (quad -> two triangles)
        for inside_count in (1, 3, 2):
            if inside_count == 1 or inside_count == 3:
                want = neg if inside_count == 1 else ~neg
                m = want.sum(-1) == 1
                if not m.any():
                    continue
                rows = np.where(m)[0]
                apex = np.argmax(want[rows], axis=-1)
                others = np.array([[b for b in range(4) if b != a] for a in apex])
                pts = []
                for k in range(3):
                    a = apex
                    b = others[:, k]
                    va = tv[rows, a]
                    vb = tv[rows, b]
                    t = (level - va) / np.where(np.abs(vb - va) < 1e-12, 1e-12, vb - va)
                    t = np.clip(t, 0, 1)[:, None]
                    pts.append(tp[rows, a] * (1 - t) + tp[rows, b] * t)
                tri = np.stack(pts, axis=1)                  # [m, 3, 3]
                verts_out.append(tri.reshape(-1, 3))
                faces_out.append(np.arange(tri.shape[0] * 3).reshape(-1, 3) + vcount)
                vcount += tri.shape[0] * 3
            else:
                m = neg.sum(-1) == 2
                if not m.any():
                    continue
                rows = np.where(m)[0]
                negr = neg[rows]
                # pairs (i0,i1) inside, (o0,o1) outside
                ins = np.argsort(~negr, axis=-1)[:, :2]
                outs = np.argsort(negr, axis=-1)[:, :2]

                def ep(ai, bi):
                    va = tv[rows, ai]
                    vb = tv[rows, bi]
                    t = (level - va) / np.where(np.abs(vb - va) < 1e-12, 1e-12, vb - va)
                    t = np.clip(t, 0, 1)[:, None]
                    return tp[rows, ai] * (1 - t) + tp[rows, bi] * t

                p00 = ep(ins[:, 0], outs[:, 0])
                p01 = ep(ins[:, 0], outs[:, 1])
                p10 = ep(ins[:, 1], outs[:, 0])
                p11 = ep(ins[:, 1], outs[:, 1])
                quad_tris = np.concatenate([
                    np.stack([p00, p01, p11], axis=1),
                    np.stack([p00, p11, p10], axis=1),
                ], axis=0)
                verts_out.append(quad_tris.reshape(-1, 3))
                faces_out.append(np.arange(quad_tris.shape[0] * 3).reshape(-1, 3) + vcount)
                vcount += quad_tris.shape[0] * 3

    if not verts_out:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    verts = np.concatenate(verts_out, axis=0).astype(np.float32)
    faces = np.concatenate(faces_out, axis=0).astype(np.int32)
    return verts, faces
