import jax.numpy as jnp
import numpy as np

from irgs_tpu.ops import tsdf
from irgs_tpu.scene.toy import make_ring_cameras


def make_sphere_depth(cam, radius=1.0):
    """Analytic depth map of a unit sphere at the origin."""
    cp = cam.params()
    rays = np.asarray(cp.ray_dirs(cam.width, cam.height))          # [H, W, 3]
    o = np.asarray(cp.cam_pos)
    b = np.sum(rays * o, -1)
    c = np.sum(o * o) - radius ** 2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    # depth map convention: z-depth along unnormalized ray (z_view); our
    # integrate expects metric z in camera space
    z = t * np.asarray(rays @ np.asarray(cp.w2c)[ :3, :3].T)[..., 2]
    return np.where(hit & (t > 0), z, 0.0).astype(np.float32)


def test_tsdf_sphere_fusion_and_visibility():
    cams = make_ring_cameras(12, radius=3.0, height=0.5, width=96, height_px=96)
    vol = tsdf.init_volume(np.array([-1.4] * 3), np.array([1.4] * 3), res=96)
    for cam in cams:
        depth = make_sphere_depth(cam)
        cp = cam.params()
        vol = tsdf.integrate(vol, jnp.asarray(depth), None,
                             jnp.asarray(cam.w2c), cp.fx, cp.fy,
                             cam.width / 2 - 0.5, cam.height / 2 - 0.5,
                             sdf_trunc=0.12, depth_trunc=8.0)

    # extracted surface ≈ unit sphere
    verts, faces = tsdf.extract_mesh(vol)
    assert len(verts) > 1000
    r = np.linalg.norm(verts, axis=-1)
    assert abs(np.median(r) - 1.0) < 0.05, np.median(r)
    assert (np.abs(r - 1.0) < 0.15).mean() > 0.95

    # visibility: rays from outside toward the sphere are blocked;
    # rays pointing away are free
    o = np.array([[0.0, 0.0, -2.0]] * 2, np.float32)
    d = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]], np.float32)
    depth, visible = tsdf.ray_march_visibility(vol, jnp.asarray(o), jnp.asarray(d))
    assert not bool(visible[0])          # toward sphere: blocked
    assert bool(visible[1])              # away: free
    assert abs(float(depth[0]) - 1.0) < 0.1   # hits front face at t=1
