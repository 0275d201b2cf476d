"""On-device Pallas <-> XLA rasterizer parity check (VERDICT r2 weak #7).

The fused Pallas tile kernel and the XLA formulation must agree pixel-wise
ON REAL HARDWARE — interpret-mode tests (tests/test_raster.py) once missed a
device-only divergence (fixed in bff0341). Run this as part of the bench /
drive routine:

    python tools/check_raster_parity.py          # exits nonzero on mismatch
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import irgs_tpu  # noqa: F401
from irgs_tpu.ops import surfel_raster as sr
from irgs_tpu.scene import toy

print("devices:", jax.devices(), flush=True)
params, aux = toy.make_sphere_scene(n_surface=20_000, n_capacity=2 ** 15,
                                    env_resolution=32)
cams = toy.make_ring_cameras(2, width=256, height_px=256)
feats = jnp.concatenate([params.get_base_color(), params.get_roughness()], -1)

# The two backends differ in accumulation order (two-pass log-transmittance
# vs sequential product) and in exp() lowering (XLA vs Mosaic), so individual
# splats can flip across the 1/255 alpha_min skip, the 0.99 clamp, the 1e-4
# termination, or the T=0.5 median-splat selection. Each flip perturbs one
# pixel by at most ~one near-threshold splat contribution (alpha scale
# T*1/255 ~ 4e-3), and on a dense 20k-splat scene ~1% of pixels hold such a
# borderline splat — a max-abs or tight-fraction criterion over 65k pixels
# therefore always fails on flip noise (measured on device: alpha max 1.3e-3,
# frac(>1e-4) 0.8%, mean 2.6e-6 — ALL the diff mass is flip pixels). Parity
# is asserted in three bands:
#   1. bulk: mean |d| <= MEAN_TOL (a systematic kernel bug moves this first)
#   2. flip band: fraction of pixels past the strict tol stays bounded
#   3. bug band: (almost) NO pixel may exceed the single-flip scale —
#      anything bigger cannot be explained by one borderline splat
worst_max = {}
worst_mean = {}
worst_frac = {}
worst_bigfrac = {}
# (strict tol, max frac beyond it, single-flip scale, max frac beyond THAT)
CRIT = {
    "color": (1e-4, 2e-2, 5e-3, 1e-4), "alpha": (1e-4, 2e-2, 5e-3, 1e-4),
    "depth": (1e-3, 2e-2, 5e-2, 1e-4), "normal": (2e-4, 2e-2, 2e-2, 1e-4),
    "feature": (1e-4, 2e-2, 5e-3, 1e-4),
    "distortion": (1e-3, 2e-2, 5e-2, 1e-4),
    # median depth jumps by the inter-splat spacing when the T=0.5
    # selection flips: no useful flip scale, rely on the fraction
    "depth_median": (1e-3, 5e-3, np.inf, 0.0),
    "d_xyz": (1e-3, 2e-2, 5e-2, 1e-4),
    "d_opacity": (1e-3, 2e-2, 5e-2, 1e-4),
}
MEAN_TOL = 1e-5

for ci, cam in enumerate(cams):
    cp = cam.params()
    outs = {}
    grads = {}
    for backend in ("xla", "pallas"):
        def fwd(xyz, scaling, rot, opa, shs, feats):
            out = sr.rasterize(
                xyz, scaling, rot, opa, shs, feats,
                jnp.zeros((params.n_capacity, 2)), cp, jnp.zeros(3),
                img_w=256, img_h=256, active_sh_degree=3,
                dup_capacity=2 ** 19, alive=aux.alive, backend=backend)
            loss = (out.color.mean() + out.alpha.mean() + out.depth.mean()
                    + out.normal.mean() + out.feature.mean())
            return loss, out

        (loss, out), g = jax.value_and_grad(fwd, argnums=(0, 3), has_aux=True)(
            params.xyz, params.get_scaling(), params.rotation,
            params.get_opacity()[:, 0], params.get_features(), feats)
        jax.block_until_ready(out.color)
        outs[backend] = out
        grads[backend] = g

    pairs = {f: (np.asarray(getattr(outs["xla"], f)),
                 np.asarray(getattr(outs["pallas"], f)))
             for f in ("color", "alpha", "depth", "normal", "feature",
                       "depth_median", "distortion")}
    for gi, name in enumerate(("d_xyz", "d_opacity")):
        a = np.asarray(grads["xla"][gi])
        b = np.asarray(grads["pallas"][gi])
        scale = max(1e-3, float(np.max(np.abs(a))))
        pairs[name] = (a / scale, b / scale)
    for field, (a, b) in pairs.items():
        d = np.abs(a - b)
        strict, _, flip, _ = CRIT[field]
        worst_max[field] = max(worst_max.get(field, 0.0), float(d.max()))
        worst_mean[field] = max(worst_mean.get(field, 0.0), float(d.mean()))
        worst_frac[field] = max(worst_frac.get(field, 0.0),
                                float((d > strict).mean()))
        worst_bigfrac[field] = max(worst_bigfrac.get(field, 0.0),
                                   float((d > flip).mean()))
    print(f"view {ci}: " + " ".join(
        f"{k}=max{worst_max[k]:.1e}/mean{worst_mean[k]:.1e}"
        f"/frac{worst_frac[k]:.1e}/big{worst_bigfrac[k]:.1e}"
        for k in worst_max), flush=True)

bad = {}
for field, (strict, frac_tol, flip, big_tol) in CRIT.items():
    if worst_mean[field] > MEAN_TOL:
        bad[field] = f"mean {worst_mean[field]:.2e} > {MEAN_TOL:g}"
    elif worst_frac[field] > frac_tol:
        bad[field] = (f"frac(|d|>{strict:g}) {worst_frac[field]:.2e}"
                      f" > {frac_tol:g}")
    elif worst_bigfrac[field] > big_tol:
        bad[field] = (f"frac(|d|>flip scale {flip:g}) "
                      f"{worst_bigfrac[field]:.2e} > {big_tol:g}")
if bad:
    print(f"FAIL: pallas/xla divergence beyond tolerance: {bad}", flush=True)
    raise SystemExit(1)
print("OK: pallas and xla raster backends agree on device (bulk mean "
      f"<= {max(worst_mean.values()):.2e}, worst pixel fraction off "
      f"{max(worst_frac.values()):.2e})", flush=True)
