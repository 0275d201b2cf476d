"""End-to-end eval-path parity vs the brute-force oracle (CI-sized version
of tools/drive_parity.py): the shadow scene (MC shadows + interreflection)
rendered through rasterize -> G-buffer -> rendering_equation with (a) the
production grid tracer at eval budgets and (b) the exact O(R*N) oracle
trace. Deterministic sampling makes any difference pure tracer bias."""

import jax
import jax.numpy as jnp
import numpy as np

from irgs_tpu.config import Config
from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.ops import surfel_raster as sr
from irgs_tpu.render import ir
from irgs_tpu.scene import envlight, toy
from irgs_tpu.train.losses import psnr
from irgs_tpu.utils import math3d
from irgs_tpu.utils.math3d import rgb_to_srgb

IMG = 32


def _render(params, aux, cam, trace_fn, spp_d, spp_l):
    feats = jnp.concatenate([params.get_base_color(), params.get_roughness()], -1)
    raster = sr.rasterize(
        params.xyz, params.get_scaling(), params.rotation,
        params.get_opacity()[:, 0], params.get_features(), feats,
        jnp.zeros((params.n_capacity, 2)), cam, jnp.zeros(3),
        img_w=IMG, img_h=IMG, active_sh_degree=3, dup_capacity=2 ** 18,
        alive=aux.alive)
    maps = ir.derive_geometry_maps(raster, cam, IMG, IMG)
    flat = lambda x: x.reshape(-1, x.shape[-1])
    shade = ir.ShadeConfig(diffuse_sample_num=spp_d, light_sample_num=spp_l,
                           training=False)
    pdf = envlight.build_pdf(params.env)
    re = ir.rendering_equation(
        flat(raster.feature[..., :3]), flat(raster.feature[..., 3:4]),
        flat(maps["normal_map"]), flat(maps["points"]),
        -flat(maps["rays_d"]), params.env, pdf, trace_fn, shade)
    img = rgb_to_srgb(re["diffuse"] + re["specular"]).reshape(IMG, IMG, 3)
    return jnp.clip(img * maps["alpha"], 0.0, 1.0)


def test_eval_path_matches_oracle_on_shadow_scene():
    params, aux = toy.make_shadow_scene(n_ground=2000, n_sphere=2000,
                                        n_capacity=4096)
    cam = toy.make_ring_cameras(4, radius=3.4, height=1.6,
                                width=IMG, height_px=IMG)[0].params()
    cfg = Config()
    import dataclasses
    eval_tracer = dataclasses.replace(
        gt.TracerConfig.from_pipe(cfg.pipe, eval=True),
        grid_res=32, pair_capacity=2 ** 19)
    grid = gt.build_grid_from_gaussians(params, aux, eval_tracer)
    assert int(grid.overflow) == 0

    prod_tf = ir.make_trace_fn(params, aux, grid, eval_tracer, cam.cam_pos, 3)

    s = params.get_scaling()
    R = math3d.quat_to_rotmat(params.rotation)
    inputs = gt.TraceInputs(
        means3d=params.xyz,
        opacity=jnp.where(aux.alive, params.get_opacity()[:, 0], 0.0),
        ru=R[:, :, 0] / s[:, 0:1], rv=R[:, :, 1] / s[:, 1:2],
        normals=params.world_normals(cam_pos=cam.cam_pos),
        shs=params.get_features(),
        features=jnp.zeros((params.n_capacity, 0), jnp.float32))

    def oracle_tf(ro, rd):
        shape = ro.shape[:-1]
        fo, fd = ro.reshape(-1, 3), rd.reshape(-1, 3)
        m = fo.shape[0]
        chunk = 4096
        pad = (-m) % chunk
        po = jnp.pad(fo, ((0, pad), (0, 0)))
        pd = jnp.pad(fd, ((0, pad), (0, 0)), constant_values=1.0)
        out = jax.lax.map(
            lambda ab: gt.trace_reference(ab[0], ab[1], inputs, aux.alive,
                                          sh_deg=3),
            (po.reshape(-1, chunk, 3), pd.reshape(-1, chunk, 3)))
        out = gt.TraceOut(*[
            x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])[:m]
            for x in out])
        out = gt.normalize_trace(out, eval_tracer.transmittance_min)
        return gt.TraceOut(*[x.reshape(shape + x.shape[1:]) for x in out])

    img_prod = jax.jit(lambda c: _render(params, aux, c, prod_tf, 24, 8))(cam)
    img_orc = jax.jit(lambda c: _render(params, aux, c, oracle_tf, 24, 8))(cam)

    # the image must actually contain shadowed and lit regions
    assert float(img_orc.max()) > 0.5 and float(img_orc.min()) < 0.1
    p = float(psnr(img_prod, img_orc))
    assert p > 40.0, f"eval-path vs oracle PSNR {p:.2f} dB"
    assert float(jnp.abs(img_prod - img_orc).mean()) < 3e-3
