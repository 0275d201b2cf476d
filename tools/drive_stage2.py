"""End-to-end stage-2 quality drive (verify flow).

Renders ground truth from the toy scene's true materials/envmap with the
eval path, resets materials + envmap, then trains stage-2 to recover them.
Expected: ray PSNR climbs well above its start and the recovered envmap
approaches the true one. Run from /root/repo: `python < tools/drive_stage2.py`.
"""

import dataclasses
import time

import jax
import jax.numpy as jnp

import irgs_tpu  # noqa: F401  (precision + cache config)
from irgs_tpu.config import Config
from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.ops import surfel_raster as sr
from irgs_tpu.render import ir
from irgs_tpu.scene import envlight, toy
from irgs_tpu.train import stage2 as s2
from irgs_tpu.utils.math3d import rgb_to_srgb

params, aux = toy.make_sphere_scene(n_surface=2048, n_capacity=4096,
                                    env_resolution=32)
cams = toy.make_ring_cameras(4, width=128, height_px=128)
cfg = Config()
cfg.pipe.diffuse_sample_num = 32
cfg.pipe.tracer_grid_res = 24
cfg.opt.trace_num_rays = 32 * 2048
st = s2.from_configs(cfg, img_w=128, img_h=128)
st = dataclasses.replace(st, dup_capacity=2 ** 17)
grid = gt.build_grid_from_gaussians(params, aux, st.tracer)


def render_full(params, grid, cam):
    feats = jnp.concatenate([params.get_base_color(), params.get_roughness()], -1)
    raster = sr.rasterize(params.xyz, params.get_scaling(), params.rotation,
                          params.get_opacity()[:, 0], params.get_features(),
                          feats, jnp.zeros((params.n_capacity, 2)), cam,
                          jnp.zeros(3), img_w=128, img_h=128,
                          active_sh_degree=3, dup_capacity=2 ** 17,
                          alive=aux.alive)
    maps = ir.derive_geometry_maps(raster, cam, 128, 128)
    flat = lambda x: x.reshape(-1, x.shape[-1])
    shade = ir.ShadeConfig(diffuse_sample_num=64, training=False)
    tf = ir.make_trace_fn(params, aux, grid, st.tracer, cam.cam_pos, 3)
    pdf = envlight.build_pdf(params.env)
    re = ir.rendering_equation(flat(raster.feature[..., :3]),
                               flat(raster.feature[..., 3:4]),
                               flat(maps["normal_map"]), flat(maps["points"]),
                               -flat(maps["rays_d"]), params.env, pdf, tf, shade)
    img = rgb_to_srgb(re["diffuse"] + re["specular"]).reshape(128, 128, 3)
    return img * maps["alpha"]


render_full_j = jax.jit(render_full)
t0 = time.time()
gts = [render_full_j(params, grid, c.params()) for c in cams]
jax.block_until_ready(gts[0])
print(f"GT rendered in {time.time()-t0:.1f}s, mean {float(gts[0].mean()):.4f}",
      flush=True)

p0 = dataclasses.replace(
    params,
    base_color=jnp.zeros_like(params.base_color),
    roughness=jnp.zeros_like(params.roughness),
    env=jnp.zeros_like(params.env))
state, optimizer = s2.init_state(p0, aux, cfg.opt)
key = jax.random.PRNGKey(0)
t0 = time.time()
for i in range(161):
    key, k = jax.random.split(key)
    state, m = s2.stage2_step(state, grid, cams[i % 4].params(), gts[i % 4],
                              None, k, st=st, optimizer=optimizer)
    if i in (0, 20, 60, 160):
        print(f"iter {i:3d} loss {float(m['loss']):.4f} "
              f"l1 {float(m['loss_l1']):.4f} ray_psnr {float(m['ray_psnr']):.2f}",
              flush=True)
print(f"161 iters in {time.time()-t0:.1f}s", flush=True)
err = float(jnp.abs(jnp.exp(state.params.env) - jnp.exp(params.env)).mean())
err0 = float(jnp.abs(1.0 - jnp.exp(params.env)).mean())
print(f"envmap mean abs err: {err:.4f} (init {err0:.4f})", flush=True)
