"""COLMAP binary/text model parser + scene reader.

≙ reference scene/colmap_loader.py (294 LoC of struct parsing) and
readColmapSceneInfo/readColmapCameras (dataset_readers.py:76-240), written
from the COLMAP model-format spec (cameras.bin / images.bin / points3D.bin).
"""

from __future__ import annotations

import os
import struct

import numpy as np

from ..utils.math3d import focal2fov
from .cameras import Camera
from .datasets import SceneInfo, _nerfpp_norm

# camera_model_id -> (name, num_params)
_CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3), 1: ("PINHOLE", 4), 2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5), 4: ("OPENCV", 8), 5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12), 7: ("FOV", 5), 8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5), 10: ("THIN_PRISM_FISHEYE", 12),
}


def _read(f, fmt):
    return struct.unpack(fmt, f.read(struct.calcsize(fmt)))


def read_cameras_bin(path):
    cams = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            cid, model_id, w, h = _read(f, "<iiQQ")
            name, np_ = _CAMERA_MODELS[model_id]
            params = _read(f, "<" + "d" * np_)
            cams[cid] = dict(model=name, width=int(w), height=int(h),
                             params=np.array(params))
    return cams


def read_images_bin(path):
    imgs = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            iid = _read(f, "<i")[0]
            qvec = np.array(_read(f, "<dddd"))
            tvec = np.array(_read(f, "<ddd"))
            cam_id = _read(f, "<i")[0]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (npts,) = _read(f, "<Q")
            f.read(24 * npts)  # skip 2D points
            imgs[iid] = dict(qvec=qvec, tvec=tvec, camera_id=cam_id,
                             name=name.decode("utf-8"))
    return imgs


def read_points3d_bin(path):
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        xyz = np.zeros((n, 3), np.float32)
        rgb = np.zeros((n, 3), np.float32)
        for i in range(n):
            _read(f, "<Q")                     # point id
            xyz[i] = _read(f, "<ddd")
            rgb[i] = _read(f, "<BBB")
            _read(f, "<d")                     # error
            (tl,) = _read(f, "<Q")
            f.read(8 * tl)                     # track
    return xyz, rgb / 255.0


def _qvec2rotmat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def read_colmap_scene(path, images_dir="images", eval_split=False,
                      llffhold: int = 8) -> SceneInfo:
    """≙ readColmapSceneInfo (dataset_readers.py:191-240): every llffhold-th
    image becomes a test view when eval_split."""
    sparse = os.path.join(path, "sparse", "0")
    if not os.path.isdir(sparse):
        sparse = os.path.join(path, "sparse")
    cams_meta = read_cameras_bin(os.path.join(sparse, "cameras.bin"))
    imgs_meta = read_images_bin(os.path.join(sparse, "images.bin"))
    xyz, rgb = read_points3d_bin(os.path.join(sparse, "points3D.bin"))

    from PIL import Image
    cameras = []
    for uid, (iid, im) in enumerate(sorted(imgs_meta.items(),
                                           key=lambda kv: kv[1]["name"])):
        meta = cams_meta[im["camera_id"]]
        R = _qvec2rotmat(im["qvec"]).T        # c2w rotation convention
        T = im["tvec"]
        # intrinsics incl. the principal point (≙ K-correct projection,
        # reference utils/graphics_utils.py:106-124 + dataset_readers.py:
        # 191-240 — dropping cx/cy silently skews real captures)
        p = meta["params"]
        if meta["model"] == "SIMPLE_PINHOLE":     # [f, cx, cy]
            fx = fy = p[0]
            cx, cy = p[1], p[2]
        elif meta["model"] in ("PINHOLE", "OPENCV", "FULL_OPENCV"):
            fx, fy, cx, cy = p[0], p[1], p[2], p[3]
        else:  # radial models [f, cx, cy, k...]: use focal + center, ignore
            # distortion (assume undistorted, as the reference does)
            fx = fy = p[0]
            cx, cy = p[1], p[2]
        img_path = os.path.join(path, images_dir, im["name"])
        img = np.asarray(Image.open(img_path).convert("RGB"), np.float32) / 255.0
        h, w = img.shape[:2]
        fovx = focal2fov(fx, w)
        fovy = focal2fov(fy, h)
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        name = os.path.splitext(im["name"])[0]
        cameras.append(Camera(uid, R, T, fovx=fovx, fovy=fovy, image=img,
                              image_name=name, image_path=img_path, K=K))

    if eval_split:
        train = [c for i, c in enumerate(cameras) if i % llffhold != 0]
        test = [c for i, c in enumerate(cameras) if i % llffhold == 0]
    else:
        train, test = cameras, []
    translate, radius = _nerfpp_norm(train)
    return SceneInfo(train, test, xyz, rgb, translate, radius,
                     light_rotate=False,
                     ply_path=os.path.join(sparse, "points3D.bin"))
