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

worst = {}
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

    for field in ("color", "alpha", "depth", "normal", "feature",
                  "depth_median", "distortion"):
        a = np.asarray(getattr(outs["xla"], field))
        b = np.asarray(getattr(outs["pallas"], field))
        d = float(np.max(np.abs(a - b)))
        worst[field] = max(worst.get(field, 0.0), d)
    for gi, name in enumerate(("d_xyz", "d_opacity")):
        a = np.asarray(grads["xla"][gi])
        b = np.asarray(grads["pallas"][gi])
        scale = max(1e-3, float(np.max(np.abs(a))))
        worst[name] = max(worst.get(name, 0.0),
                          float(np.max(np.abs(a - b))) / scale)
    print(f"view {ci}: " + " ".join(f"{k}={v:.2e}" for k, v in worst.items()),
          flush=True)

TOL = {"color": 5e-4, "alpha": 5e-4, "depth": 5e-3, "normal": 1e-3,
       "feature": 5e-4, "depth_median": 5e-3, "distortion": 5e-3,
       "d_xyz": 5e-3, "d_opacity": 5e-3}
bad = {k: v for k, v in worst.items() if v > TOL[k]}
if bad:
    print(f"FAIL: pallas/xla divergence beyond tolerance: {bad}", flush=True)
    raise SystemExit(1)
print("OK: pallas and xla raster backends agree on device "
      f"(worst: {max(worst.values()):.2e})", flush=True)
