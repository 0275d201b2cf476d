"""Loss library, pure JAX. ≙ reference utils/loss_utils.py.

Image tensors here are [H, W, C] (channels-last, the framework-wide layout),
unlike the torch reference's [C, H, W].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(x, y):
    return jnp.abs(x - y).mean()


def l2_loss(x, y):
    return ((x - y) ** 2).mean()


def psnr(img, gt):
    """≙ utils/image_utils.py:21 — 20·log10(1/√mse)."""
    mse = jnp.mean((img - gt) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def _gaussian_window(size: int = 11, sigma: float = 1.5):
    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    w = np.outer(g, g).astype(np.float32)
    return jnp.asarray(w)


@functools.partial(jax.jit, static_argnames=("window_size",))
def ssim(img1, img2, window_size: int = 11):
    """SSIM with an 11×11 σ=1.5 Gaussian window and zero padding, matching
    the reference (utils/loss_utils.py:49-79, torch conv2d pad=5)."""
    w = _gaussian_window(window_size)

    def conv(x):
        # x: [H, W, C] -> depthwise conv
        c = x.shape[-1]
        lhs = x.transpose(2, 0, 1)[None]                 # [1, C, H, W]
        rhs = jnp.broadcast_to(w, (c, 1, window_size, window_size))
        out = jax.lax.conv_general_dilated(
            lhs, rhs, (1, 1), [(window_size // 2,) * 2] * 2,
            feature_group_count=c,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST,
        )
        return out[0].transpose(1, 2, 0)

    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = conv(img1 * img1) - mu1_sq
    s2 = conv(img2 * img2) - mu2_sq
    s12 = conv(img1 * img2) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return m.mean()


def _sobel_grads(x):
    """[H, W, C] -> (gx, gy), normalized Sobel with replicate padding
    (≙ kornia spatial_gradient used at loss_utils.py:81-82)."""
    kx = jnp.asarray(np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32) / 8.0)
    ky = kx.T
    c = x.shape[-1]
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)), mode="edge")
    lhs = xp.transpose(2, 0, 1)[None]

    def conv(k):
        rhs = jnp.broadcast_to(k, (c, 1, 3, 3))
        out = jax.lax.conv_general_dilated(
            lhs, rhs, (1, 1), [(0, 0), (0, 0)], feature_group_count=c,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST)
        return out[0].transpose(1, 2, 0)

    return conv(kx), conv(ky)


def first_order_edge_aware_loss(data, img):
    """Σ_g |∂g data| · exp(-|∂g img|), mean (loss_utils.py:81-82)."""
    dgx, dgy = _sobel_grads(data)
    igx, igy = _sobel_grads(img)
    wx = jnp.exp(-jnp.abs(igx))
    wy = jnp.exp(-jnp.abs(igy))
    # data channels broadcast against image channels like the reference
    # ([Cd,2,H,W] * [Ci,2,H,W] with Cd ∈ {1, Ci})
    return (jnp.abs(dgx) * wx + jnp.abs(dgy) * wy).mean()


def tv_loss(x):
    """Squared total variation (loss_utils.py:84-88). x: [H, W, C]."""
    h_tv = jnp.square(x[1:, :] - x[:-1, :]).mean()
    w_tv = jnp.square(x[:, 1:] - x[:, :-1]).mean()
    return h_tv + w_tv


def mask_entropy_loss(alpha, mask):
    """Binary cross-entropy pushing alpha to the image mask
    (loss_utils.py:145-151)."""
    o = jnp.clip(alpha, 1e-6, 1 - 1e-6)
    m = mask.astype(o.dtype)
    return -(m * jnp.log(o) + (1 - m) * jnp.log(1 - o)).mean()


def normal_consistency_loss(rend_normal, surf_normal):
    """1 - n·n' between rendered and depth-derived normals
    (loss_utils.py:113-118). Inputs [H, W, 3]."""
    return (1.0 - jnp.sum(rend_normal * surf_normal, axis=-1)).mean()
