"""Core 3D math in pure JAX.

Covers the reference's `utils/general_utils.py` + `utils/graphics_utils.py`
helper surface (quaternions, scaling/rotation factors, normal flipping,
sRGB transforms, rotation-from-z, projection matrices), re-expressed as
pure functions on jnp arrays so they can be fused under jit.

Conventions
-----------
* Quaternions are (w, x, y, z), matching the reference's `build_rotation`
  (reference: utils/general_utils.py).
* Matrices act on column vectors: ``x_cam = R @ x_world + t``.
* A camera's world-to-clip transform `P4` maps homogeneous world points to
  clip space (divide by w for NDC in [-1, 1]).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def safe_normalize(x, eps: float = 1e-20):
    """Normalize along the last axis without NaN at zero length."""
    return x / jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), eps))


def dot(a, b, keepdims: bool = True):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def quat_normalize(q, eps: float = 1e-12):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q):
    """Quaternion (w,x,y,z) [..., 4] -> rotation matrix [..., 3, 3].

    Matches reference `build_rotation` (utils/general_utils.py): input is
    normalized first; columns of R are the rotated basis vectors.
    """
    q = quat_normalize(q)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1),
            jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1),
            jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )
    return R


def quat_multiply(q1, q2):
    """Hamilton product, (w,x,y,z) convention."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def rotmat_to_quat(R):
    """Rotation matrix [..., 3, 3] -> quaternion (w,x,y,z), numerically robust."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def branch0():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2
        return jnp.stack([0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s], axis=-1)

    def branch1():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2
        return jnp.stack([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s], axis=-1)

    def branch2():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 1e-12)) * 2
        return jnp.stack([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s], axis=-1)

    def branch3():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 1e-12)) * 2
        return jnp.stack([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s], axis=-1)

    c0 = tr > 0
    c1 = (m00 >= m11) & (m00 >= m22)
    c2 = m11 >= m22
    q = jnp.where(
        c0[..., None],
        branch0(),
        jnp.where(c1[..., None], branch1(), jnp.where(c2[..., None], branch2(), branch3())),
    )
    return quat_normalize(q)


def build_scaling_rotation(scale, quat):
    """L = R @ diag(scale): columns are scaled tangent axes [..., 3, 3].

    `scale` is [..., 3]; for 2D surfels pass (s_u, s_v, eps).
    Matches reference `build_scaling_rotation` (utils/general_utils.py).
    """
    R = quat_to_rotmat(quat)
    return R * scale[..., None, :]


def flip_align_view(normal, viewdir):
    """Flip `normal` so it points against `viewdir` (toward the viewer).

    Returns (flipped_normal, positive_mask). Matches reference
    `flip_align_view` (utils/general_utils.py).
    """
    d = dot(normal, viewdir)
    non_flip = d <= 0
    flipped = jnp.where(non_flip, normal, -normal)
    return flipped, non_flip


def rotation_between_z(vec):
    """Rotation matrix taking +z to `vec` [..., 3] -> [..., 3, 3].

    Rodrigues construction; matches reference `rotation_between_z`
    (utils/graphics_utils.py:133-165) including the -I fallback at vec≈-z.
    """
    v1 = -vec[..., 1]
    v2 = vec[..., 0]
    z = vec[..., 2]
    cos_p_1 = jnp.maximum(z + 1.0, 1e-7)
    zero = jnp.zeros_like(v1)
    one = jnp.ones_like(v1)
    R = jnp.stack(
        [
            jnp.stack([one - v2 * v2 / cos_p_1, v1 * v2 / cos_p_1, v2, ], axis=-1),
            jnp.stack([v1 * v2 / cos_p_1, one - v1 * v1 / cos_p_1, -v1], axis=-1),
            jnp.stack([-v2, v1, one - (v1 * v1 + v2 * v2) / cos_p_1], axis=-1),
        ],
        axis=-2,
    )
    neg_eye = -jnp.eye(3, dtype=vec.dtype)
    return jnp.where((z + 1.0 > 0)[..., None, None], R, neg_eye)


def rgb_to_srgb(img, clip: bool = True):
    """Linear -> sRGB. Matches reference rgb_to_srgb (graphics_utils.py:167)."""
    out = jnp.where(
        img > 0.0031308,
        jnp.power(jnp.maximum(img, 0.0031308), 1.0 / 2.4) * 1.055 - 0.055,
        12.92 * img,
    )
    if clip:
        out = jnp.clip(out, 0.0, 1.0)
    return out


def srgb_to_rgb(img):
    """sRGB -> linear. Matches reference srgb_to_rgb (graphics_utils.py:187)."""
    return jnp.where(
        img <= 0.04045,
        img / 12.92,
        jnp.power((jnp.maximum(img, 0.04045) + 0.055) / 1.055, 2.4),
    )


# ---------------------------------------------------------------------------
# Camera matrices (host-side numpy; built once per camera)
# ---------------------------------------------------------------------------

def world_to_view(R: np.ndarray, t: np.ndarray, translate=None, scale: float = 1.0) -> np.ndarray:
    """4x4 world-to-camera matrix (column-vector convention).

    `R` is the camera-to-world rotation, `t` the world-to-camera translation,
    matching the reference's getWorld2View2 (utils/graphics_utils.py:70-81)
    up to transposition (the reference stores the transpose for row-vector
    use in torch).
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    c2w = np.linalg.inv(Rt)
    center = c2w[:3, 3]
    if translate is not None:
        center = (center + translate) * scale
    c2w[:3, 3] = center
    return np.linalg.inv(c2w).astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """Perspective projection (column-vector convention); clip = P @ view.

    Matches reference getProjectionMatrix (utils/graphics_utils.py:83-103):
    w_clip = +z_view; z_clip in [0, zfar] range convention.
    """
    tan_x = math.tan(fovx / 2)
    tan_y = math.tan(fovy / 2)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tan_x
    P[1, 1] = 1.0 / tan_y
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P


def projection_matrix_from_K(znear: float, zfar: float, H: int, W: int, K: np.ndarray) -> np.ndarray:
    """K-correct perspective projection, reference getProjectionMatrixCorrect
    (utils/graphics_utils.py:106-124)."""
    top = K[1, 2] / K[1, 1] * znear
    bottom = -(H - K[1, 2]) / K[1, 1] * znear
    right = K[0, 2] / K[0, 0] * znear
    left = -(W - K[0, 2]) / K[0, 0] * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: int) -> float:
    return 2 * math.atan(pixels / (2 * focal))
