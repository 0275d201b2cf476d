"""Mesh pipeline tests: contraction, unbounded extraction, cluster
post-process, and the exact ray-triangle oracle vs the TSDF ray marcher
(VERDICT round-1 item #6)."""

import jax.numpy as jnp
import numpy as np

from irgs_tpu.ops import tsdf as T
from irgs_tpu.scene import toy


def sphere_volume(res=64, r=0.6, extent=1.0, blob=None):
    """Analytic signed-distance sphere written straight into a TSDFVolume."""
    origin = np.full(3, -extent)
    voxel = 2 * extent / res
    idx = (np.arange(res) + 0.5) * voxel - extent
    zz, yy, xx = np.meshgrid(idx, idx, idx, indexing="ij")
    d = np.sqrt(xx ** 2 + yy ** 2 + zz ** 2) - r
    if blob is not None:
        c, rb = blob
        db = np.sqrt((xx - c[0]) ** 2 + (yy - c[1]) ** 2 + (zz - c[2]) ** 2) - rb
        d = np.minimum(d, db)
    tsdf = np.clip(d / (5 * voxel), -1, 1).astype(np.float32)
    return T.TSDFVolume(tsdf=jnp.asarray(tsdf),
                        weight=jnp.full((res, res, res), 2.0),
                        origin=jnp.asarray(origin, jnp.float32),
                        voxel=jnp.asarray(voxel, jnp.float32))


def test_contract_uncontract_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).uniform(-3, 3, (256, 3)))
    y = T.contract(x)
    assert float(jnp.linalg.norm(y, axis=-1).max()) < 2.0
    np.testing.assert_allclose(np.asarray(T.uncontract(y)), np.asarray(x),
                               rtol=1e-5, atol=1e-5)
    # identity inside the unit ball
    xin = x / 10.0
    np.testing.assert_allclose(np.asarray(T.contract(xin)), np.asarray(xin))


def test_marching_tets_sphere_radius():
    vol = sphere_volume(res=64, r=0.6)
    verts, faces = T.extract_mesh(vol)
    assert len(verts) > 100 and len(faces) > 100
    rad = np.linalg.norm(verts, axis=-1)
    assert abs(rad.mean() - 0.6) < 0.02
    assert rad.std() < 0.02


def test_post_process_drops_floaters():
    vol = sphere_volume(res=64, r=0.55, blob=([0.85, 0.85, 0.85], 0.05))
    verts, faces = T.extract_mesh(vol)
    # floater present pre-cleanup
    pre = np.linalg.norm(verts, axis=-1).max()
    assert pre > 1.0
    pv, pf = T.post_process_mesh(verts, faces, cluster_to_keep=1)
    assert len(pf) > 100
    assert np.linalg.norm(pv, axis=-1).max() < 0.7   # floater gone
    # welded: far fewer vertices than 3 * faces
    assert len(pv) < 0.8 * 3 * len(pf)


def test_ray_march_matches_triangle_oracle():
    vol = sphere_volume(res=64, r=0.6)
    verts, faces = T.extract_mesh(vol)
    verts, faces = T.merge_vertices(verts, faces)

    rng = np.random.RandomState(1)
    n = 24
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = -2.0 * dirs                       # shoot toward the center
    # plus some rays that miss entirely
    miss_o = np.array([[2.0, 2.0, 0.0]] * 4)
    miss_d = np.array([[0, 0, 1.0], [0, 0, -1], [0, 1, 0], [1, 0, 0.0]])
    rays_o = np.concatenate([origins, miss_o]).astype(np.float32)
    rays_d = np.concatenate([dirs, miss_d]).astype(np.float32)

    t_oracle = T.ray_triangle_intersect(rays_o, rays_d, verts, faces)
    depth, visible = T.ray_march_visibility(
        vol, jnp.asarray(rays_o), jnp.asarray(rays_d), t_max=10.0,
        max_steps=512, t_min=0.05)
    depth = np.asarray(depth)
    visible = np.asarray(visible)

    hit_oracle = np.isfinite(t_oracle)
    # visibility agreement
    np.testing.assert_array_equal(~visible, hit_oracle)
    # hit depth within ~1.5 voxels of the exact triangle intersection
    vox = float(vol.voxel)
    err = np.abs(depth[hit_oracle] - t_oracle[hit_oracle])
    assert err.max() < 1.5 * vox, f"max depth err {err.max()} vs voxel {vox}"


def test_extract_mesh_unbounded_sphere():
    """Analytic depth maps of a sphere -> contracted-space extraction."""
    r = 0.6
    cams = toy.make_ring_cameras(12, radius=3.0, height=0.5,
                                 width=96, height_px=96)
    depths, projs, centers = [], [], []
    for cam in cams:
        cp = cam.params()
        dirs = np.asarray(cp.ray_dirs(96, 96, normalize=True))
        o = np.asarray(cp.cam_pos)
        # ray-sphere: |o + t d| = r
        b = (dirs @ o)
        disc = b ** 2 - (o @ o - r ** 2)
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0))
        # depth maps store z-depth (distance along view axis), matching
        # surf_depth = z * |ray| ... reference uses surf_depth along the ray
        # scaled by the unnormalized ray; here use the projective z depth
        view_dir = np.asarray(cam.w2c[2, :3])
        z = t * (dirs @ view_dir)
        depths.append(np.where(hit, z, 0.0).astype(np.float32))
        projs.append(np.asarray(cam.full_proj, np.float32))
        centers.append(o)
    depths = jnp.asarray(np.stack(depths))
    projs = jnp.asarray(np.stack(projs))
    centers = np.stack(centers)
    center = centers.mean(0)
    radius = float(np.linalg.norm(centers - center, axis=-1).min())

    xyz = np.random.RandomState(0).normal(size=(512, 3)).astype(np.float32)
    xyz = xyz / np.linalg.norm(xyz, axis=-1, keepdims=True) * r
    verts, faces = T.extract_mesh_unbounded(depths, projs, xyz, center,
                                            radius, resolution=96)
    assert len(verts) > 100
    pv, pf = T.post_process_mesh(verts, faces, cluster_to_keep=1)
    rad = np.linalg.norm(pv, axis=-1)        # sphere is centered at origin
    # the reference's running mean starts at (tsdf=1, weight=1)
    # (mesh_utils.py:221-224), which biases the zero crossing inward by
    # ~sdf_trunc/n_views — replicated faithfully, hence the 0.05 tolerance
    assert abs(np.median(rad) - r) < 0.05, f"median radius {np.median(rad)}"
    assert rad.std() < 0.06
