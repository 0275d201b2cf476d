"""Image metrics: PSNR / SSIM (JAX) + optional VGG-LPIPS.

≙ reference utils/image_utils.py psnr, utils/loss_utils.py ssim, and the
vendored lpipsPyTorch. Exact LPIPS needs the VGG16 ImageNet weights, which
this zero-egress image does not ship — `lpips_fn` loads them from
`IRGS_TPU_VGG16_NPZ` (a .npz of conv weights) when provided and otherwise
returns None, which eval scripts record as `null` in the metrics json.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..train.losses import psnr, ssim  # noqa: F401  (re-export)

_VGG_SLICES = ((0, 2), (2, 4), (4, 7), (7, 10), (10, 13))  # conv indices per block
_LPIPS_CHANNELS = (64, 128, 256, 512, 512)
# LPIPS linear-layer weights are part of the lpips distribution; without them
# we fall back to unit weights over normalized features ("lpips-like").
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def load_vgg16_weights():
    path = os.environ.get("IRGS_TPU_VGG16_NPZ", "")
    if path and os.path.exists(path):
        return dict(np.load(path))
    return None


def _vgg_features(x, weights):
    """x: [H, W, 3] in [0,1] -> list of 5 normalized feature maps."""
    h = (x - (_SHIFT + 1) / 2) / _SCALE        # lpips scaling layer
    h = h.transpose(2, 0, 1)[None]
    feats = []
    conv_idx = 0
    layer = 0
    outs = []
    # VGG16 conv arch: [64,64,M,128,128,M,256,256,256,M,512,512,512,M,512,512,512]
    arch = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
    relu_index = 0
    capture_at = {1, 3, 6, 10, 14}  # relu indices matching lpips slices
    for a in arch:
        if a == "M":
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
            continue
        wkey, bkey = f"conv{conv_idx}_w", f"conv{conv_idx}_b"
        w = jnp.asarray(weights[wkey])
        b = jnp.asarray(weights[bkey])
        h = jax.lax.conv_general_dilated(h, w, (1, 1), [(1, 1), (1, 1)],
                                         dimension_numbers=("NCHW", "OIHW", "NCHW"))
        h = jax.nn.relu(h + b[None, :, None, None])
        if relu_index in capture_at:
            f = h / jnp.maximum(jnp.linalg.norm(h, axis=1, keepdims=True), 1e-10)
            outs.append(f)
        conv_idx += 1
        relu_index += 1
    return outs


def lpips_fn(img1, img2, weights=None):
    """LPIPS(vgg)-style distance or None when no weights are available."""
    weights = weights if weights is not None else load_vgg16_weights()
    if weights is None:
        return None
    f1 = _vgg_features(img1, weights)
    f2 = _vgg_features(img2, weights)
    dist = 0.0
    for a, b in zip(f1, f2):
        dist = dist + jnp.mean(jnp.sum((a - b) ** 2, axis=1))
    return float(dist)
