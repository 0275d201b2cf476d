import jax
import jax.numpy as jnp
import numpy as np

from irgs_tpu.utils import math3d, sh
from irgs_tpu.utils.ply import read_ply, structured_from_dict, write_ply


def test_quat_roundtrip():
    key = jax.random.PRNGKey(0)
    q = math3d.quat_normalize(jax.random.normal(key, (32, 4)))
    R = math3d.quat_to_rotmat(q)
    # orthonormality
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
    q2 = math3d.rotmat_to_quat(R)
    # q and -q are the same rotation
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_quat_multiply_matches_matmul():
    key = jax.random.PRNGKey(1)
    q1 = math3d.quat_normalize(jax.random.normal(key, (8, 4)))
    q2 = math3d.quat_normalize(jax.random.normal(jax.random.PRNGKey(2), (8, 4)))
    R12 = math3d.quat_to_rotmat(math3d.quat_multiply(q1, q2))
    R1R2 = jnp.einsum("nij,njk->nik", math3d.quat_to_rotmat(q1), math3d.quat_to_rotmat(q2))
    np.testing.assert_allclose(R12, R1R2, atol=1e-5)


def test_rotation_between_z():
    key = jax.random.PRNGKey(3)
    v = math3d.safe_normalize(jax.random.normal(key, (64, 3)))
    R = math3d.rotation_between_z(v)
    z = jnp.array([0.0, 0.0, 1.0])
    out = jnp.einsum("nij,j->ni", R, z)
    np.testing.assert_allclose(out, v, atol=1e-5)


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 100)
    np.testing.assert_allclose(math3d.srgb_to_rgb(math3d.rgb_to_srgb(x)), x, atol=1e-5)


def test_sh_constant_term():
    # degree-0: eval_sh == C0 * sh0; sh2rgb(rgb2sh(x)) == x
    rgb = jnp.array([[0.2, 0.5, 0.9]])
    coef = sh.rgb2sh(rgb)
    shs = jnp.zeros((1, 3, 16)).at[:, :, 0].set(coef)
    dirs = math3d.safe_normalize(jnp.array([[0.3, -0.4, 0.8]]))
    out = sh.eval_sh_color(0, shs, dirs)
    np.testing.assert_allclose(out, rgb, atol=1e-6)


def test_sh_orthogonality_sampling():
    # mean over uniform sphere of Y_lm * Y_l'm' ≈ delta / (4π)
    key = jax.random.PRNGKey(4)
    dirs = math3d.safe_normalize(jax.random.normal(key, (200000, 3)))
    vals = []
    for i in range(9):
        shs = jnp.zeros((1, 1, 9)).at[0, 0, i].set(1.0)
        vals.append(sh.eval_sh(2, jnp.broadcast_to(shs, (dirs.shape[0], 1, 9)), dirs)[:, 0])
    V = jnp.stack(vals)  # [9, M]
    G = (V @ V.T) / dirs.shape[0] * 4 * np.pi
    np.testing.assert_allclose(G, np.eye(9), atol=0.05)


def test_projection_pixel_mapping():
    from irgs_tpu.scene.cameras import Camera
    R = np.eye(3)
    T = np.array([0.0, 0.0, 3.0])
    cam = Camera(0, R, T, fovx=0.9, fovy=0.9, image=None, width=128, height=128)
    cp = cam.params()
    # a world point straight ahead lands at the image center pixel
    pm = cp.pixmat(128, 128)
    p = jnp.array([0.0, 0.0, 1.0, 1.0])
    hom = pm @ p
    px, py = hom[0] / hom[2], hom[1] / hom[2]
    np.testing.assert_allclose([px, py], [63.5, 63.5], atol=1e-4)
    # ray through the center pixel points toward +z
    rays = cp.ray_dirs(128, 128)
    np.testing.assert_allclose(rays[63, 63] + rays[64, 64],
                               2 * np.array([0, 0, 1.0]), atol=0.02)


def test_projection_pixel_mapping_offcenter_K():
    """K-correct cameras (≙ getProjectionMatrixCorrect, reference
    utils/graphics_utils.py:106-124): with an off-center principal point the
    ray grid and the projection must stay consistent — a point marched along
    the ray through pixel (u, v) projects back to exactly (u, v)."""
    from irgs_tpu.scene.cameras import Camera
    W = H = 128
    fx, fy, cx, cy = 140.0, 150.0, 52.25, 80.5       # deliberately off-center
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    R = np.eye(3)
    T = np.array([0.3, -0.2, 3.0])
    cam = Camera(0, R, T, fovx=0.9, fovy=0.9, image=None, width=W, height=H,
                 K=K)
    cp = cam.params()
    assert float(cp.cx) == cx and float(cp.cy) == cy
    rays = cp.ray_dirs(W, H, normalize=False)
    pm = cp.pixmat(W, H)
    for (u, v) in ((0, 0), (17, 93), (90, 11), (127, 127)):
        p_world = cp.cam_pos + 2.7 * rays[v, u]
        hom = pm @ jnp.concatenate([p_world, jnp.ones(1)])
        px, py = float(hom[0] / hom[2]), float(hom[1] / hom[2])
        np.testing.assert_allclose([px, py], [u, v], atol=5e-3)
    # centered pinhole defaults reproduce the old behavior
    cam0 = Camera(0, R, T, fovx=0.9, fovy=0.9, image=None, width=W, height=H)
    assert cam0.cx == W / 2 and cam0.cy == H / 2


def test_ply_roundtrip(tmp_path):
    n = 17
    rng = np.random.RandomState(0)
    fields = {"x": rng.randn(n), "y": rng.randn(n), "z": rng.randn(n),
              "opacity": rng.randn(n)}
    path = str(tmp_path / "test.ply")
    write_ply(path, structured_from_dict(fields))
    back = read_ply(path)["vertex"].data
    for k, v in fields.items():
        np.testing.assert_allclose(back[k], v.astype(np.float32), atol=1e-7)


def test_gaussians_ply_roundtrip(tmp_path):
    from irgs_tpu.scene import gaussians as G
    pts = np.random.RandomState(1).randn(50, 3).astype(np.float32)
    cols = np.random.RandomState(2).rand(50, 3).astype(np.float32)
    params, aux = G.create_from_pcd(pts, cols, n_capacity=64)
    assert int(aux.n_alive) == 50
    path = str(tmp_path / "pc.ply")
    G.save_ply(path, params, aux)
    p2, a2 = G.load_ply(path, n_capacity=64)
    assert int(a2.n_alive) == 50
    np.testing.assert_allclose(p2.xyz[:50], params.xyz[:50], atol=1e-6)
    np.testing.assert_allclose(p2.scaling[:50], params.scaling[:50], atol=1e-6)
    np.testing.assert_allclose(p2.features_rest[:50], params.features_rest[:50], atol=1e-6)
    np.testing.assert_allclose(p2.env, params.env, atol=1e-6)


def test_envmap_sidecar_reference_formats(tmp_path):
    """Reference-layout envmap sidecars (≙ gaussian_model.py:449-468,
    513-519): the torch `<stem>1.map` loads back bit-identically and the HDR
    `<stem>1.exr` loads back through the activation inverse."""
    import os

    from irgs_tpu.scene import gaussians as G
    pts = np.random.RandomState(1).randn(20, 3).astype(np.float32)
    cols = np.random.RandomState(2).rand(20, 3).astype(np.float32)
    params, aux = G.create_from_pcd(pts, cols, n_capacity=32,
                                    env_resolution=16)
    import dataclasses
    params = dataclasses.replace(
        params, env=jnp.asarray(
            np.random.RandomState(3).randn(8, 16, 3).astype(np.float32)))
    path = str(tmp_path / "pc.ply")
    G.save_ply(path, params, aux)
    assert os.path.exists(str(tmp_path / "pc1.map"))
    assert os.path.exists(str(tmp_path / "pc1.exr"))

    # .map fallback: exact raw grid through the reference's torch format
    os.remove(str(tmp_path / "pc_env.npy"))
    p_map, _ = G.load_ply(path, n_capacity=32)
    np.testing.assert_allclose(p_map.env, params.env, atol=0)

    # .exr fallback: activated HDR image inverted back to the raw grid
    os.remove(str(tmp_path / "pc1.map"))
    p_exr, _ = G.load_ply(path, n_capacity=32)
    np.testing.assert_allclose(p_exr.env, params.env, atol=1e-3)
