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


# ---------------------------------------------------------------------------
# unbounded (contracted) extraction + mesh post-processing
# ---------------------------------------------------------------------------

def contract(x):
    """Mip-NeRF-360 scene contraction (≙ extract_mesh_unbounded.contract,
    utils/mesh_utils.py:190-192)."""
    mag = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return jnp.where(mag < 1, x, (2.0 - 1.0 / jnp.maximum(mag, 1e-9)) * (x / jnp.maximum(mag, 1e-9)))


def uncontract(y):
    """Inverse contraction (≙ mesh_utils.py:194-196)."""
    mag = jnp.linalg.norm(y, axis=-1, keepdims=True)
    return jnp.where(mag < 1, y,
                     1.0 / jnp.maximum(2.0 - mag, 1e-2) * (y / jnp.maximum(mag, 1e-9)))


def _sample_depth_bilinear(depthmap, pix, h, w):
    """grid_sample(mode=bilinear, padding=border, align_corners=True) on a
    [H, W] map at NDC coords pix in [-1, 1] (≙ compute_sdf_perframe,
    mesh_utils.py:198-209)."""
    u = (pix[..., 0] + 1.0) * 0.5 * (w - 1)
    v = (pix[..., 1] + 1.0) * 0.5 * (h - 1)
    u = jnp.clip(u, 0.0, w - 1.0)
    v = jnp.clip(v, 0.0, h - 1.0)
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 2)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 2)
    fu = u - u0
    fv = v - v0
    d00 = depthmap[v0, u0]
    d01 = depthmap[v0, u0 + 1]
    d10 = depthmap[v0 + 1, u0]
    d11 = depthmap[v0 + 1, u0 + 1]
    return ((d00 * (1 - fu) + d01 * fu) * (1 - fv)
            + (d10 * (1 - fu) + d11 * fu) * fv)


@jax.jit
def _sdf_perframe(points, depthmap, full_proj):
    """Projective per-frame SDF: sampled_depth - z at each world point
    (≙ compute_sdf_perframe, mesh_utils.py:198-209). full_proj is the
    column-vector [4,4] world->clip matrix (w_clip = z_view)."""
    hom = jnp.concatenate([points, jnp.ones_like(points[..., :1])], -1)
    clip = hom @ full_proj.T
    z = clip[..., 3:4]
    pix = clip[..., :2] / jnp.maximum(z, 1e-9)
    mask = jnp.all((pix > -1.0) & (pix < 1.0), -1) & (z[..., 0] > 0)
    h, w = depthmap.shape
    sampled = _sample_depth_bilinear(depthmap, pix, h, w)
    return sampled - z[..., 0], mask


def fuse_unbounded_tsdf(samples_contracted, depths, full_projs, center,
                        radius, voxel_size):
    """TSDF value at contracted-space samples, fused over all views with the
    running weighted mean and adaptive truncation of
    compute_unbounded_tsdf (mesh_utils.py:211-247).

    depths: [V, H, W]; full_projs: [V, 4, 4]; samples_contracted [M, 3] in
    the normalized contracted frame.
    """
    mag = jnp.linalg.norm(samples_contracted, axis=-1)
    sdf_trunc = 5.0 * voxel_size * jnp.where(
        mag > 1, 1.0 / (2.0 - jnp.clip(mag, None, 1.9)), 1.0)
    world = uncontract(samples_contracted) * radius + center

    def body(i, carry):
        tsdfs, weights = carry
        sdf, mask = _sdf_perframe(world, depths[i], full_projs[i])
        mask = mask & (sdf > -sdf_trunc)
        sdf_n = jnp.clip(sdf / sdf_trunc, -1.0, 1.0)
        w = weights
        wp = w + 1.0
        fused = jnp.where(mask, (tsdfs * w + sdf_n) / wp, tsdfs)
        return fused, jnp.where(mask, wp, w)

    tsdfs0 = jnp.ones_like(mag)
    w0 = jnp.ones_like(mag)
    tsdfs, weights = jax.lax.fori_loop(0, depths.shape[0], body, (tsdfs0, w0))
    return tsdfs, weights


def extract_mesh_unbounded(depths, full_projs, xyz, center, radius,
                           resolution: int = 256):
    """Contracted-space marching-tetrahedra extraction (≙
    extract_mesh_unbounded, utils/mesh_utils.py:184-281 +
    mcube_utils.py:17-94, without the %512 block restriction).

    depths [V, H, W] jnp, full_projs [V, 4, 4], xyz [N, 3] gaussian centers
    (bounds the marching region at their 95th contracted percentile).
    Returns (verts [V', 3] world-space, faces [F, 3]).
    """
    center = jnp.asarray(center, jnp.float32)
    voxel_size = 2.0 / resolution
    rmag = np.asarray(jnp.linalg.norm(
        contract((jnp.asarray(xyz) - center) / radius), axis=-1))
    R = float(np.quantile(rmag, 0.95))
    R = min(R + 0.01, 1.9)

    # dense contracted grid, fused slab-by-slab to bound memory
    res = resolution
    axis = np.linspace(-R, R, res, dtype=np.float32)
    vol_vals = np.ones((res, res, res), np.float32)
    fuse_j = jax.jit(functools.partial(fuse_unbounded_tsdf))
    for zi in range(res):
        zz = axis[zi]
        xx, yy = np.meshgrid(axis, axis, indexing="ij")       # [res, res]
        pts = jnp.asarray(np.stack(
            [xx, yy, np.full_like(xx, zz)], -1).reshape(-1, 3))
        tsdfs, _ = fuse_j(pts, depths, full_projs, center,
                          jnp.float32(radius), jnp.float32(voxel_size))
        vol_vals[:, :, zi] = np.asarray(tsdfs).reshape(res, res)

    # marching tetrahedra in contracted coords (x fastest in our cube table)
    vol = TSDFVolume(
        tsdf=jnp.asarray(np.transpose(vol_vals, (2, 1, 0))),  # [z, y, x]
        weight=jnp.full((res, res, res), 2.0),
        origin=jnp.asarray([-R - voxel_size * 0.5] * 3),
        voxel=jnp.asarray((2 * R) / (res - 1), jnp.float32))
    verts_c, faces = extract_mesh(vol, level=0.0, weight_min=1.0)
    if len(verts_c) == 0:
        return verts_c, faces
    # the extract_mesh grid places corner (i,j,k) at origin + (idx+0.5)*voxel;
    # undo that offset so vertex 0 sits at -R exactly
    world = np.asarray(uncontract(jnp.asarray(verts_c))) * radius + np.asarray(center)
    world = np.clip(world, -32.0, 32.0)                       # max_range clip
    return world.astype(np.float32), faces


def merge_vertices(verts, faces, digits: int = 6):
    """Weld duplicate vertices (≙ trimesh merge_vertices(digits_vertex=6),
    mcube_utils.py:89)."""
    key = np.round(verts, digits)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    new_faces = inv[faces]
    # drop degenerate triangles
    ok = ((new_faces[:, 0] != new_faces[:, 1])
          & (new_faces[:, 1] != new_faces[:, 2])
          & (new_faces[:, 0] != new_faces[:, 2]))
    return uniq.astype(np.float32), new_faces[ok].astype(np.int32)


def post_process_mesh(verts, faces, cluster_to_keep: int = 1000):
    """Keep the largest connected clusters, dropping floaters (≙
    post_process_mesh, utils/mesh_utils.py:22-43: threshold at the
    cluster_to_keep-th largest cluster size, floor 50 triangles)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    verts, faces = merge_vertices(verts, faces)
    if len(faces) == 0:
        return verts, faces
    n = len(verts)
    rows = np.concatenate([faces[:, 0], faces[:, 1], faces[:, 2]])
    cols = np.concatenate([faces[:, 1], faces[:, 2], faces[:, 0]])
    adj = coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    _, labels = connected_components(adj, directed=False)
    tri_label = labels[faces[:, 0]]
    sizes = np.bincount(tri_label)
    order = np.sort(sizes)
    thresh = order[-cluster_to_keep] if len(order) >= cluster_to_keep else 0
    thresh = max(thresh, 50)
    keep = sizes[tri_label] >= thresh
    faces = faces[keep]
    # reindex to referenced vertices
    used = np.unique(faces)
    remap = np.full(n, -1, np.int64)
    remap[used] = np.arange(len(used))
    return verts[used], remap[faces].astype(np.int32)


def ray_triangle_intersect(rays_o, rays_d, verts, faces, t_min: float = 1e-4):
    """Exact Möller–Trumbore ray/mesh intersection (numpy test oracle for
    ray_march_visibility; ≙ the raytracing CUDA caster's semantics,
    raytracing/src/bvh.cu:138). Returns nearest hit t per ray (inf = miss)."""
    v0 = verts[faces[:, 0]]
    e1 = verts[faces[:, 1]] - v0
    e2 = verts[faces[:, 2]] - v0
    best = np.full(len(rays_o), np.inf, np.float64)
    for i in range(len(rays_o)):
        o, d = rays_o[i], rays_d[i]
        p = np.cross(d, e2)
        det = (e1 * p).sum(-1)
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tv = o - v0
        u = (tv * p).sum(-1) * inv
        q = np.cross(tv, e1)
        v = (q * d[None]).sum(-1) * inv
        t = (e2 * q).sum(-1) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_min)
        if hit.any():
            best[i] = t[hit].min()
    return best
