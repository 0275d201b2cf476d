import json
import os
import struct

import numpy as np
from PIL import Image

from irgs_tpu.scene.colmap import read_colmap_scene, _qvec2rotmat
from irgs_tpu.scene.datasets import load_scene


def write_fake_colmap(root):
    sparse = os.path.join(root, "sparse", "0")
    os.makedirs(sparse)
    imgdir = os.path.join(root, "images")
    os.makedirs(imgdir)
    # cameras.bin: one PINHOLE camera
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 32, 24))
        f.write(struct.pack("<dddd", 30.0, 30.0, 16.0, 12.0))
    # images.bin: two images
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        for iid, name in ((1, "a.png"), (2, "b.png")):
            f.write(struct.pack("<i", iid))
            f.write(struct.pack("<dddd", 1.0, 0, 0, 0))
            f.write(struct.pack("<ddd", 0.1 * iid, 0, 2.0))
            f.write(struct.pack("<i", 1))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 0))
    # points3D.bin
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 3))
        for i in range(3):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<ddd", i * 0.1, 0, 0))
            f.write(struct.pack("<BBB", 100, 150, 200))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 0))
    for name in ("a.png", "b.png"):
        Image.fromarray(np.zeros((24, 32, 3), np.uint8)).save(
            os.path.join(imgdir, name))


def test_colmap_reader(tmp_path):
    root = str(tmp_path / "scene")
    os.makedirs(root)
    write_fake_colmap(root)
    info = read_colmap_scene(root, eval_split=True, llffhold=2)
    assert len(info.train_cameras) == 1 and len(info.test_cameras) == 1
    assert info.points.shape == (3, 3)
    np.testing.assert_allclose(info.colors[0], [100 / 255, 150 / 255, 200 / 255])
    cam = info.train_cameras[0]
    assert (cam.width, cam.height) == (32, 24)
    # sniffing dispatch finds it too
    info2 = load_scene(root)
    assert len(info2.train_cameras) + len(info2.test_cameras) == 2


def test_blender_reader(tmp_path):
    root = str(tmp_path / "blender")
    os.makedirs(root)
    c2w = np.eye(4); c2w[2, 3] = 2.0
    meta = {"camera_angle_x": 0.8,
            "frames": [{"file_path": "./r_0",
                        "transform_matrix": c2w.tolist()}]}
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump(meta, f)
    rgba = np.zeros((16, 16, 4), np.uint8)
    rgba[4:12, 4:12] = [255, 0, 0, 255]
    Image.fromarray(rgba).save(os.path.join(root, "r_0.png"))
    info = load_scene(root, white_background=True, eval_split=False)
    cam = info.train_cameras[0]
    assert cam.image.shape == (16, 16, 3)
    assert cam.mask is not None and cam.mask.sum() == 64
    # white background composited outside the mask
    np.testing.assert_allclose(cam.image[0, 0], [1, 1, 1])
    np.testing.assert_allclose(cam.image[8, 8], [1, 0, 0])
    assert info.points.shape[1] == 3


def test_qvec_identity():
    R = _qvec2rotmat(np.array([1.0, 0, 0, 0]))
    np.testing.assert_allclose(R, np.eye(3))


def test_resolution_scaling(tmp_path):
    """-r/--resolution camera scaling (≙ utils/camera_utils.py:21-79)."""
    from irgs_tpu.scene.cameras import Camera
    from irgs_tpu.scene.datasets import _downscale_camera

    root = str(tmp_path / "blender_r")
    os.makedirs(root)
    c2w = np.eye(4); c2w[2, 3] = 2.0
    meta = {"camera_angle_x": 0.8,
            "frames": [{"file_path": "./r_0",
                        "transform_matrix": c2w.tolist()}]}
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump(meta, f)
    rgba = np.zeros((32, 32, 4), np.uint8)
    rgba[8:24, 8:24] = [255, 0, 0, 255]
    Image.fromarray(rgba).save(os.path.join(root, "r_0.png"))

    info = load_scene(root, white_background=True, eval_split=False,
                      resolution=2)
    cam = info.train_cameras[0]
    assert cam.image.shape == (16, 16, 3)
    assert cam.mask is not None and cam.mask.shape == (16, 16)
    assert cam.mask.sum() == 64        # area-downsampled box mask
    # fov preserved; focal halves with the width
    assert abs(cam.fovx - 0.8) < 1e-9
    full = load_scene(root, white_background=True, eval_split=False)
    assert abs(cam.fx - full.train_cameras[0].fx / 2) < 1e-6
    # -r -1 with small images is a no-op
    same = load_scene(root, white_background=True, eval_split=False,
                      resolution=-1)
    assert same.train_cameras[0].image.shape == (32, 32, 3)
    # arbitrary target width
    w8 = load_scene(root, white_background=True, eval_split=False,
                    resolution=8)
    assert w8.train_cameras[0].image.shape == (4, 4, 3)

    # K intrinsics are divided by the same scale
    K = np.array([[30.0, 0, 16], [0, 30.0, 12], [0, 0, 1.0]])
    cam_k = Camera(0, np.eye(3), np.array([0., 0., 2.]), 0.8, 0.8,
                   image=np.zeros((24, 32, 3), np.float32), K=K)
    half = _downscale_camera(cam_k, 2, 1.0)
    np.testing.assert_allclose(half.K[0, 0], 15.0)
    np.testing.assert_allclose(half.K[:2, 2], [8.0, 6.0])
    np.testing.assert_allclose(half.K[2], [0, 0, 1])
    assert half.image.shape == (12, 16, 3)


def test_ray_bank_batches():
    """≙ Scene.train_rays + get_batch_rays (scene/__init__.py:96-110,
    133-136): the bank flattens every training pixel of every camera and
    samples uniform ray batches."""
    import numpy as np
    from irgs_tpu.scene import toy
    from irgs_tpu.scene.raybank import RayBank

    cams = toy.make_ring_cameras(3, width=16, height_px=16)
    for c in cams:
        c.image = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
    bank = RayBank(cams, batch_size=64)
    assert len(bank) == 3 * 16 * 16
    ro, rd, rgb = bank.get_batch_rays()
    assert ro.shape == (64, 3) and rd.shape == (64, 3) and rgb.shape == (64, 3)
    # directions unit-norm, origins are camera positions
    n = np.linalg.norm(np.asarray(rd), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)
    cam_pos = {tuple(np.asarray(c.params().cam_pos).round(5)) for c in cams}
    for o in np.asarray(ro)[:8]:
        assert tuple(o.round(5)) in cam_pos
