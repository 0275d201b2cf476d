"""Golden parity tests against the reference's shipped assets and its
CPU-runnable pure-torch twins (VERDICT round-1 item #1a).

Oracles used:
  * assets/bsdf_256_256.bin           — the FG (split-sum env BRDF) LUT the
    reference loads at scene/gaussian_model.py:121.
  * assets/env_map/envmap{3,6,12}.exr — GT HDR envmaps consumed by
    eval_relighting_syn4.py; exercise the native EXR codec (ZIP + PIZ).
  * utils/graphics_utils.py:19-47     — fibonacci_sphere_sampling, run on CPU
    with the hardcoded device='cuda' stripped.
  * gaussian_renderer/__init__.py:417-450 GGX_specular and
    utils/loss_utils.py:43-79 ssim / utils/image_utils.py:21 psnr — re-run
    as torch CPU oracles with identical formulas.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

REF = "/root/reference"
ASSETS = os.path.join(REF, "assets")

needs_ref = pytest.mark.skipif(not os.path.isdir(ASSETS),
                               reason="reference assets not available")


# ---------------------------------------------------------------------------
# FG LUT vs the reference's binary blob


@needs_ref
def test_fg_lut_matches_reference_blob():
    from irgs_tpu.scene import cubemap as cm

    gold = np.fromfile(os.path.join(ASSETS, "bsdf_256_256.bin"),
                       np.float32).reshape(256, 256, 2)
    mine = np.asarray(cm.compute_fg_lut(256, 8192))
    err = np.abs(gold - mine)
    assert err.mean() < 1e-3, f"FG LUT mean err {err.mean()}"
    assert err.max() < 2e-2, f"FG LUT max err {err.max()}"


# ---------------------------------------------------------------------------
# EXR codec on the golden HDR envmaps (ZIP float + PIZ half)


@needs_ref
@pytest.mark.parametrize("name,shape", [
    ("envmap3", (250, 500)),    # ZIP, FLOAT
    ("envmap6", (512, 1024)),   # PIZ, HALF, has alpha
    ("envmap12", (512, 1024)),  # PIZ, HALF
])
def test_exr_reads_golden_envmaps(name, shape):
    from irgs_tpu.utils import exr

    img = exr.read_exr_rgb(os.path.join(ASSETS, "env_map", f"{name}.exr"))
    assert img.shape == shape + (3,)
    assert np.isfinite(img).all()
    assert img.max() > 0.5 and img.max() < 1e4
    # HDR envmaps are spatially smooth: neighbor deltas far below dynamic range
    dx = np.abs(np.diff(img, axis=1)).mean()
    assert dx < 0.25 * img.std()


@needs_ref
def test_exr_piz_constant_alpha_channel():
    # envmap6 carries A == 1.0 everywhere; decoding it exactly through
    # Huffman + wavelet + LUT is a strong end-to-end codec check.
    from irgs_tpu.utils import exr

    full = exr.read_exr(os.path.join(ASSETS, "env_map", "envmap6.exr"))
    a = full["channels"]["A"]
    assert a.shape == (512, 1024)
    np.testing.assert_array_equal(a, np.ones_like(a))


def test_exr_write_read_roundtrip(tmp_path):
    from irgs_tpu.utils import exr

    rng = np.random.default_rng(0)
    im = (rng.standard_normal((37, 53, 3)) * 2).astype(np.float32)
    p = str(tmp_path / "rt.exr")
    exr.write_exr(p, im)
    back = exr.read_exr_rgb(p)
    np.testing.assert_array_equal(back, im)


# ---------------------------------------------------------------------------
# fibonacci_sphere_sampling vs the reference torch implementation


class _StripCuda:
    """Run reference code that hardcodes device='cuda' on CPU."""

    _FNS = ("arange", "zeros", "ones", "rand", "eye", "tensor", "linspace")

    def __enter__(self):
        self._saved = {}
        for fn in self._FNS:
            orig = getattr(torch, fn)
            self._saved[fn] = orig

            def wrapper(*a, _orig=orig, **k):
                k.pop("device", None)
                return _orig(*a, **k)

            setattr(torch, fn, wrapper)
        return self

    def __exit__(self, *exc):
        for fn, orig in self._saved.items():
            setattr(torch, fn, orig)


@needs_ref
def test_fibonacci_sampling_matches_reference():
    sys.path.insert(0, REF)
    try:
        from utils import graphics_utils as ref_gu
    finally:
        sys.path.remove(REF)
    from irgs_tpu.render import sampling

    rng = np.random.default_rng(1)
    normals = rng.standard_normal((64, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)

    with _StripCuda():
        ref_dirs, ref_areas = ref_gu.fibonacci_sphere_sampling(
            torch.from_numpy(normals), 32, random_rotate=False)

    mine_dirs, mine_areas = sampling.fibonacci_sphere_sampling(
        jnp.asarray(normals), 32, key=None)

    np.testing.assert_allclose(np.asarray(mine_dirs),
                               ref_dirs.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(mine_areas),
                               ref_areas.numpy(), atol=1e-6)


# ---------------------------------------------------------------------------
# GGX_specular vs a torch oracle of the reference formula
# (gaussian_renderer/__init__.py:417-450; module itself imports CUDA exts,
# so the math is re-run here verbatim in torch)


def _ggx_specular_torch(normal, pts2c, pts2l, roughness, fresnel=0.04):
    F = torch.nn.functional
    L = F.normalize(pts2l, dim=-1)
    V = F.normalize(pts2c, dim=-1)
    H = F.normalize((L + V[:, None, :]) / 2.0, dim=-1)
    N = F.normalize(normal, dim=-1)
    NoV = torch.sum(V * N, dim=-1, keepdim=True)
    N = N * NoV.sign()
    NoL = torch.sum(N[:, None, :] * L, dim=-1, keepdim=True).clamp_(1e-6, 1)
    NoV = torch.sum(N * V, dim=-1, keepdim=True).clamp_(1e-6, 1)
    NoH = torch.sum(N[:, None, :] * H, dim=-1, keepdim=True).clamp_(1e-6, 1)
    VoH = torch.sum(V[:, None, :] * H, dim=-1, keepdim=True).clamp_(1e-6, 1)
    alpha = roughness * roughness
    alpha2 = alpha * alpha
    k = (alpha + 2 * roughness + 1.0) / 8.0
    FMi = ((-5.55473) * VoH - 6.98316) * VoH
    frac0 = fresnel + (1 - fresnel) * torch.pow(2.0, FMi)
    frac = frac0 * alpha2[:, None, :]
    nom0 = NoH * NoH * (alpha2[:, None, :] - 1) + 1
    nom1 = NoV * (1 - k) + k
    nom2 = NoL * (1 - k[:, None, :]) + k[:, None, :]
    nom = (4 * np.pi * nom0 * nom0 * nom1[:, None, :] * nom2).clamp_(
        1e-6, 4 * np.pi)
    return frac / nom


def test_ggx_specular_matches_reference_formula():
    from irgs_tpu.render.ir import ggx_specular

    rng = np.random.default_rng(2)
    n = rng.standard_normal((128, 3)).astype(np.float32)
    v = rng.standard_normal((128, 3)).astype(np.float32)
    l = rng.standard_normal((128, 16, 3)).astype(np.float32)
    r = rng.uniform(0.05, 1.0, (128, 1)).astype(np.float32)

    ref = _ggx_specular_torch(torch.from_numpy(n), torch.from_numpy(v),
                              torch.from_numpy(l), torch.from_numpy(r))
    mine = ggx_specular(jnp.asarray(n), jnp.asarray(v), jnp.asarray(l),
                        jnp.asarray(r))
    np.testing.assert_allclose(np.asarray(mine), ref.numpy(),
                               rtol=2e-4, atol=2e-6)


# ---------------------------------------------------------------------------
# SSIM / PSNR vs torch oracles (utils/loss_utils.py:43-79 — not importable on
# CPU because loss_utils imports kornia, so the window+conv2d oracle is
# re-run here; utils/image_utils.py:21-27)


def _ssim_torch(img1, img2, window_size=11):
    import math

    F = torch.nn.functional
    sigma = 1.5
    gauss = torch.tensor([
        math.exp(-((x - window_size // 2) ** 2) / (2 * sigma ** 2))
        for x in range(window_size)
    ])
    g = (gauss / gauss.sum()).unsqueeze(1)
    w2 = g.mm(g.t()).float().unsqueeze(0).unsqueeze(0)
    channel = img1.size(-3)
    w = w2.expand(channel, 1, window_size, window_size).contiguous()
    pad = window_size // 2
    mu1 = F.conv2d(img1, w, padding=pad, groups=channel)
    mu2 = F.conv2d(img2, w, padding=pad, groups=channel)
    mu1_sq, mu2_sq, mu12 = mu1.pow(2), mu2.pow(2), mu1 * mu2
    s1 = F.conv2d(img1 * img1, w, padding=pad, groups=channel) - mu1_sq
    s2 = F.conv2d(img2 * img2, w, padding=pad, groups=channel) - mu2_sq
    s12 = F.conv2d(img1 * img2, w, padding=pad, groups=channel) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return m.mean()


def test_ssim_matches_torch_oracle():
    from irgs_tpu.train.losses import ssim

    rng = np.random.default_rng(3)
    a = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)

    ref = _ssim_torch(torch.from_numpy(a.transpose(2, 0, 1))[None],
                      torch.from_numpy(b.transpose(2, 0, 1))[None])
    mine = ssim(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(float(mine), float(ref), atol=1e-5)


def test_psnr_matches_torch_oracle():
    from irgs_tpu.train.losses import psnr

    rng = np.random.default_rng(4)
    a = rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)
    b = rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    ref = 20 * torch.log10(
        1.0 / torch.sqrt(((ta - tb) ** 2).view(1, -1).mean(1)))
    mine = psnr(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(float(mine), float(ref[0]), atol=1e-4)


# ---------------------------------------------------------------------------
# Relight envmap pipeline on a golden HDR: pdf normalization + lookup parity


@needs_ref
def test_envlight_pdf_on_golden_hdr():
    from irgs_tpu.scene import envlight
    from irgs_tpu.utils import exr

    hdr = exr.read_exr_rgb(os.path.join(ASSETS, "env_map", "envmap3.exr"))
    pdf = envlight.build_pdf(jnp.asarray(hdr), activation="none")
    # the discrete distribution must be normalized
    assert abs(float(jnp.sum(pdf)) - 1.0) < 1e-4

    # bilinear lookup at exact texel centers returns the texel
    h, w, _ = hdr.shape
    ys, xs = np.array([3, h // 2, h - 4]), np.array([5, w // 2, w - 6])
    for y in ys:
        for x in xs:
            phi = (x + 0.5) / w * 2 * np.pi - np.pi
            theta = (y + 0.5) / h * np.pi
            d = np.array([np.sin(theta) * np.sin(phi), np.cos(theta),
                          -np.sin(theta) * np.cos(phi)], np.float32)
            u, v = envlight.dirs_to_uv(jnp.asarray(d[None]))
            val = envlight.bilinear_latlong(jnp.asarray(hdr), u, v)
            np.testing.assert_allclose(np.asarray(val)[0], hdr[y, x],
                                       rtol=1e-3, atol=1e-4)
