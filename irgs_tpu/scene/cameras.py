"""Cameras.

Host-side `Camera` (numpy images + matrices, built once per view, mirrors
reference scene/cameras.py:18-114) and the jit-side `CameraParams` pytree of
small arrays. Unlike the reference — which precomputes and keeps a full
[H*W, 3] world ray grid per camera on the GPU (cameras.py:87-100) — rays are
recomputed inside jit from the 3x3 intrinsics each step: on TPU that is one
fused broadcast+matmul and saves gigabytes of HBM across a few hundred views.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..utils import math3d


class CameraParams(NamedTuple):
    """Small per-view arrays consumed inside jit (a pytree).

    cx/cy: principal point in continuous pixel coordinates (pixel i spans
    [i, i+1)). Centered pinholes use (W/2, H/2); COLMAP captures carry the
    calibrated offsets (≙ getProjectionMatrixCenterShift consumers,
    reference utils/graphics_utils.py:106-124, dataset_readers.py:191-240).
    The projection shift itself lives inside full_proj; cx/cy feed the ray
    grid, which must agree with it."""
    w2c: jnp.ndarray        # [4, 4] world -> camera (column-vector)
    full_proj: jnp.ndarray  # [4, 4] world -> clip (P @ w2c)
    cam_pos: jnp.ndarray    # [3]
    fx: jnp.ndarray         # scalar
    fy: jnp.ndarray         # scalar
    cx: jnp.ndarray         # scalar, pixels
    cy: jnp.ndarray         # scalar, pixels

    def pixmat(self, W: int, H: int) -> jnp.ndarray:
        """[3, 4] world-homogeneous -> pixel-homogeneous transform.

        pixel_hom = pixmat @ [x, 1]; divide by the last coordinate for
        (px, py). Encodes the CUDA ndc2pix convention
        (forward.cu:113-118): px = ndc_x * W/2 + (W-1)/2.
        """
        P = self.full_proj
        row0 = (W / 2.0) * P[0] + ((W - 1) / 2.0) * P[3]
        row1 = (H / 2.0) * P[1] + ((H - 1) / 2.0) * P[3]
        return jnp.stack([row0, row1, P[3]])

    def ray_dirs(self, W: int, H: int, normalize: bool = True) -> jnp.ndarray:
        """[H, W, 3] world-space ray directions through pixel centers.

        Matches reference Camera.rays_d_hw (scene/cameras.py:87-100).
        """
        u = jnp.arange(W, dtype=jnp.float32)[None, :, None]
        v = jnp.arange(H, dtype=jnp.float32)[:, None, None]
        x = (u + 0.5 - self.cx) / self.fx
        y = (v + 0.5 - self.cy) / self.fy
        ones = jnp.ones_like(x + y)
        d_cam = jnp.concatenate([x + 0 * y, y + 0 * x, ones], axis=-1)
        R_c2w = self.w2c[:3, :3].T
        d_world = d_cam @ R_c2w.T
        if normalize:
            d_world = math3d.safe_normalize(d_world)
        return d_world


class Camera:
    """One training/eval view. Images stay in host RAM as numpy."""

    def __init__(self, uid: int, R: np.ndarray, T: np.ndarray,
                 fovx: float, fovy: float,
                 image: np.ndarray | None, image_name: str = "",
                 mask: np.ndarray | None = None,
                 znear: float = 0.01, zfar: float = 100.0,
                 width: int | None = None, height: int | None = None,
                 K: np.ndarray | None = None, image_path: str = ""):
        self.uid = uid
        self.R = R  # camera-to-world rotation
        self.T = T  # world-to-camera translation
        self.fovx = float(fovx)
        self.fovy = float(fovy)
        self.image_name = image_name
        self.image_path = image_path
        self.znear, self.zfar = znear, zfar

        if image is not None:
            self.image = np.clip(np.asarray(image, np.float32), 0.0, 1.0)  # [H, W, 3]
            self.height, self.width = self.image.shape[:2]
        else:
            self.image = None
            self.height, self.width = int(height), int(width)
        self.mask = None if mask is None else np.asarray(mask).astype(bool).reshape(self.height, self.width)

        self.K = None if K is None else np.asarray(K)
        self.w2c = math3d.world_to_view(R, T)
        if K is None:
            self.proj = math3d.projection_matrix(znear, zfar, self.fovx, self.fovy)
        else:
            self.proj = math3d.projection_matrix_from_K(znear, zfar, self.height, self.width, K)
        self.full_proj = (self.proj @ self.w2c).astype(np.float32)
        self.c2w = np.linalg.inv(self.w2c)
        self.cam_pos = self.c2w[:3, 3].astype(np.float32)
        if K is None:
            self.fx = math3d.fov2focal(self.fovx, self.width)
            self.fy = math3d.fov2focal(self.fovy, self.height)
            self.cx = self.width / 2.0
            self.cy = self.height / 2.0
        else:
            self.fx, self.fy = float(K[0, 0]), float(K[1, 1])
            self.cx, self.cy = float(K[0, 2]), float(K[1, 2])

    def params(self) -> CameraParams:
        return CameraParams(
            w2c=jnp.asarray(self.w2c),
            full_proj=jnp.asarray(self.full_proj),
            cam_pos=jnp.asarray(self.cam_pos),
            fx=jnp.asarray(self.fx, jnp.float32),
            fy=jnp.asarray(self.fy, jnp.float32),
            cx=jnp.asarray(self.cx, jnp.float32),
            cy=jnp.asarray(self.cy, jnp.float32),
        )

    @property
    def tanfovx(self) -> float:
        return math.tan(self.fovx * 0.5)

    @property
    def tanfovy(self) -> float:
        return math.tan(self.fovy * 0.5)


def stack_camera_params(cams: list[Camera]) -> CameraParams:
    """Stack many views into one batched CameraParams (leading axis = view)."""
    return CameraParams(
        w2c=jnp.stack([jnp.asarray(c.w2c) for c in cams]),
        full_proj=jnp.stack([jnp.asarray(c.full_proj) for c in cams]),
        cam_pos=jnp.stack([jnp.asarray(c.cam_pos) for c in cams]),
        fx=jnp.asarray(np.array([c.fx for c in cams], np.float32)),
        fy=jnp.asarray(np.array([c.fy for c in cams], np.float32)),
        cx=jnp.asarray(np.array([c.cx for c in cams], np.float32)),
        cy=jnp.asarray(np.array([c.cy for c in cams], np.float32)),
    )
