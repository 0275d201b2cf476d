"""Component profile of the stage-2 TRAINING step at the bench workload.

Chained timing (each iteration's input derives from the previous output, and
a host fetch closes the chain) — block_until_ready does not synchronize and
repeated identical dispatches are memoized on this backend (BASELINE.md).

Pieces, all at the bench workload (400^2, 100k gaussians, 2^18 traced rays):
  raster fwd           rasterize only
  raster fwd+bwd       d(rasterize)/d(params) via a scalar sum
  trace  fwd           trace_segments forward at the shipping TRAIN config
  trace  fwd+bwd       same through value_and_grad
  shade  fwd+bwd       rendering_equation (incl. trace) fwd+bwd
  FULL   step          stage2_step (raster + shade + losses + Adam)

Run solo on the real chip:  python tools/_prof_step_parts.py
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from irgs_tpu.config import Config
from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.ops import surfel_raster as sr
from irgs_tpu.render import ir
from irgs_tpu.scene import envlight, toy
from irgs_tpu.train import stage2 as s2
from irgs_tpu.utils import math3d

print("devices:", jax.devices(), flush=True)

IMG = 400
params, aux = toy.make_sphere_scene(n_surface=100_000, n_capacity=2 ** 17,
                                    env_resolution=128)
cams = toy.make_ring_cameras(8, width=IMG, height_px=IMG)
cam = cams[0].params()

cfg = Config()
cfg.pipe.diffuse_sample_num = 256
cfg.opt.trace_num_rays = 2 ** 18
st = s2.from_configs(cfg, img_w=IMG, img_h=IMG)
st = dataclasses.replace(st, dup_capacity=2 ** 19)
grid = gt.build_grid_from_gaussians(params, aux, st.tracer)
state, optimizer = s2.init_state(params, aux, cfg.opt)
gt_img = jnp.full((IMG, IMG, 3), 0.5)
key = jax.random.PRNGKey(0)

R = st.trace_num_rays  # 2^18 rays, same count the step traces
k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
idx = jax.random.randint(k1, (R,), 0, 100_000)
ro0 = params.xyz[idx] + 0.05 * jax.random.normal(k2, (R, 3))
rd0 = jax.random.normal(k3, (R, 3))
rd0 /= jnp.linalg.norm(rd0, axis=-1, keepdims=True)


def bench_chain(step, state0, n=5, tag=""):
    stt = step(state0)
    np.asarray(jax.tree.leaves(stt)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        stt = step(stt)
    for leaf in jax.tree.leaves(stt):
        np.asarray(leaf.ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{tag:24s} {dt * 1e3:8.1f} ms", flush=True)
    return dt


def perturb(x, sig):
    return x * (1.0 + 1e-6 * jnp.tanh(sig))


# ---- raster ----------------------------------------------------------------
feats = jnp.concatenate([params.get_base_color(), params.get_roughness()], -1)


@jax.jit
def step_raster_fwd(stt):
    xyz, _ = stt
    r = sr.rasterize(xyz, params.get_scaling(), params.rotation,
                     params.get_opacity()[:, 0], params.get_features(), feats,
                     jnp.zeros((params.n_capacity, 2)), cam, jnp.zeros(3),
                     img_w=IMG, img_h=IMG, active_sh_degree=3,
                     dup_capacity=st.dup_capacity, alive=aux.alive,
                     backend=st.raster_backend)
    sig = jnp.sum(r.color) * 1e-6
    return perturb(xyz, sig), sig


@jax.jit
def step_raster_fwdbwd(stt):
    xyz, _ = stt

    def f(x):
        r = sr.rasterize(x, params.get_scaling(), params.rotation,
                         params.get_opacity()[:, 0], params.get_features(),
                         feats, jnp.zeros((params.n_capacity, 2)), cam,
                         jnp.zeros(3), img_w=IMG, img_h=IMG,
                         active_sh_degree=3, dup_capacity=st.dup_capacity,
                         alive=aux.alive, backend=st.raster_backend)
        return jnp.sum(r.color) + jnp.sum(r.feature) + jnp.sum(r.alpha)

    val, g = jax.value_and_grad(f)(xyz)
    sig = (val + jnp.sum(g)) * 1e-9
    return perturb(xyz, sig), sig


# ---- trace -----------------------------------------------------------------
def make_inputs(xyz):
    s = params.get_scaling()
    Rm = math3d.quat_to_rotmat(params.rotation)
    return gt.TraceInputs(
        means3d=xyz,
        opacity=jnp.where(aux.alive, params.get_opacity()[:, 0], 0.0),
        ru=Rm[:, :, 0] / s[:, 0:1], rv=Rm[:, :, 1] / s[:, 1:2],
        normals=params.world_normals(cam_pos=jnp.zeros(3)),
        shs=params.get_features(), features=jnp.zeros((2 ** 17, 0)))


@jax.jit
def step_trace_fwd(stt):
    ro, _ = stt
    out = gt.trace_forward_only(ro, rd0, grid, make_inputs(params.xyz),
                                cfg=st.tracer, sh_deg=3)
    sig = jnp.sum(out.alpha) * 1e-6
    return perturb(ro, sig), sig


@jax.jit
def step_trace_fwdbwd(stt):
    ro, _ = stt

    def f(xyz):
        out = gt.trace_segments(ro, rd0, grid, make_inputs(xyz),
                                cfg=st.tracer, sh_deg=3)
        return jnp.sum(out.color) + jnp.sum(out.alpha)

    val, g = jax.value_and_grad(f)(params.xyz)
    sig = (val + jnp.sum(g)) * 1e-9
    return perturb(ro, sig), sig


# ---- shade (rendering equation incl. trace) --------------------------------
NPIX = st.num_shaded_pixels
pidx = jax.random.randint(k1, (NPIX,), 0, 100_000)
px_pts0 = params.xyz[pidx] * 1.02
px_n = params.world_normals(cam_pos=jnp.zeros(3))[pidx]
px_wo = -rd0[:NPIX]
shade_cfg = ir.ShadeConfig(
    diffuse_sample_num=st.diffuse_sample_num,
    light_sample_num=st.light_sample_num, light_t_min=st.light_t_min,
    wo_indirect=st.wo_indirect, detach_indirect=st.detach_indirect,
    training=True)


@jax.jit
def step_shade_fwdbwd(stt):
    pts, _ = stt

    def f(xyz, env):
        trace_fn = ir.make_trace_fn(
            dataclasses.replace(params, xyz=xyz), aux, grid, st.tracer,
            cam.cam_pos, 3)
        pdf = envlight.build_pdf(jax.lax.stop_gradient(env))
        re = ir.rendering_equation(
            jnp.full((NPIX, 3), 0.5), jnp.full((NPIX, 1), 0.5), px_n, pts,
            px_wo, env, pdf, trace_fn, shade_cfg,
            key=jax.random.PRNGKey(1))
        return jnp.sum(re["diffuse"]) + jnp.sum(re["specular"])

    val, g = jax.value_and_grad(f, argnums=(0, 1))(params.xyz, params.env)
    sig = (val + jnp.sum(g[0])) * 1e-9
    return perturb(pts, sig), sig


# ---- full step --------------------------------------------------------------
def step_full(carry):
    stt, k = carry
    k, sub = jax.random.split(k)
    stt, _ = s2.stage2_step(stt, grid, cam, gt_img, None, sub,
                            st=st, optimizer=optimizer)
    return (stt, k)


parts = [
    ("raster fwd", step_raster_fwd, (params.xyz, jnp.float32(0))),
    ("raster fwd+bwd", step_raster_fwdbwd, (params.xyz, jnp.float32(0))),
    ("trace fwd (2^18)", step_trace_fwd, (ro0, jnp.float32(0))),
    ("trace fwd+bwd (2^18)", step_trace_fwdbwd, (ro0, jnp.float32(0))),
    ("shade fwd+bwd", step_shade_fwdbwd, (px_pts0, jnp.float32(0))),
    ("FULL stage2_step", step_full, (state, key)),
]
only = sys.argv[1] if len(sys.argv) > 1 else ""
for tag, fn, s0 in parts:
    if only and only not in tag:
        continue
    bench_chain(fn, s0, tag=tag)
