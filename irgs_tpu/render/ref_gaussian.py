"""Stage-1 (Ref-Gaussian) renderers: plain 2DGS, per-Gaussian volume shading,
and pixel-space deferred (surfel) shading with split-sum IBL.

≙ reference gaussian_renderer/ref_gaussian.py: render_initial (:69-179),
render_surfel (:184-346), render_volume (:502-672), with shading helpers from
utils/refl_utils.py:65-193. The mesh-BVH reflection-visibility tracer is
replaced by SDF ray marching of the fused TSDF (ops/tsdf.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import surfel_raster as sr
from ..ops import tsdf as tsdf_ops
from ..scene import cubemap as cm
from ..scene.cameras import CameraParams
from ..utils import sh as sh_utils
from ..utils.math3d import safe_normalize
from . import ir


def render_initial(params, aux, cam: CameraParams, bg, *, img_w, img_h,
                   active_sh_degree, dup_capacity=2 ** 21, depth_ratio=0.0,
                   means2d_offset=None):
    """Plain 2DGS pass (≙ render_initial, ref_gaussian.py:69-179)."""
    n = params.n_capacity
    off = means2d_offset if means2d_offset is not None else jnp.zeros((n, 2))
    raster = sr.rasterize(
        params.xyz, params.get_scaling(), params.rotation,
        params.get_opacity()[:, 0], params.get_features(),
        jnp.zeros((n, 0)), off, cam, jnp.zeros(3),
        img_w=img_w, img_h=img_h, active_sh_degree=active_sh_degree,
        dup_capacity=dup_capacity, alive=aux.alive)
    maps = ir.derive_geometry_maps(raster, cam, img_w, img_h, depth_ratio)
    image = raster.color + bg[None, None] * (1 - maps["alpha"])
    return dict(render=image, raster=raster, **maps)


def _per_gaussian_view(params, cam: CameraParams):
    dir_pp = params.xyz - cam.cam_pos
    dir_pp = safe_normalize(dir_pp)
    normals = params.world_normals(cam_pos=cam.cam_pos)
    w_o = -dir_pp
    refl = safe_normalize(2.0 * jnp.sum(normals * w_o, -1, keepdims=True) * normals - w_o)
    return normals, w_o, refl


def render_volume(params, aux, cam: CameraParams, bg, env2,
                  fg_lut, *, img_w, img_h, active_sh_degree,
                  dup_capacity=2 ** 21, depth_ratio=0.0, vol=None,
                  use_indirect=False, means2d_offset=None):
    """Per-Gaussian forward shading then splat (≙ render_volume +
    get_full_color_volume[_indirect], refl_utils.py:135-193)."""
    n = params.n_capacity
    metallic = params.get_metallic()
    rough = params.get_roughness()
    base_color = params.get_base_color()
    normals, w_o, refl = _per_gaussian_view(params, cam)

    fg = cm.sample_fg_lut(fg_lut,
                          jnp.clip(jnp.sum(normals * w_o, -1, keepdims=True), 0, 1),
                          jnp.clip(rough, 0, 1))
    diffuse = env2.query(normals, mode="diffuse") * (1 - metallic) * base_color
    direct = env2.query(refl, mode="specular", roughness=rough)
    spec_weight = (0.04 * (1 - metallic) + base_color * metallic) * fg[..., 0:1] + fg[..., 1:2]

    if use_indirect and vol is not None:
        indirect = jnp.maximum(sh_utils.eval_sh(
            3, jnp.swapaxes(params.get_indirect(), -1, -2), refl), 0.0)
        depth, visible = tsdf_ops.ray_march_visibility(vol, params.xyz, refl)
        vis = visible.astype(jnp.float32)[:, None]
        specular_light = direct * vis + (1 - vis) * indirect
        extra_feats = jnp.concatenate([vis, indirect, direct], -1)
    else:
        specular_light = direct
        extra_feats = jnp.zeros((n, 0))
    specular = specular_light * spec_weight

    colors_precomp = diffuse + specular
    features = jnp.concatenate(
        [rough, metallic, diffuse, specular, base_color, extra_feats], -1)

    off = means2d_offset if means2d_offset is not None else jnp.zeros((n, 2))
    raster = sr.rasterize(
        params.xyz, params.get_scaling(), params.rotation,
        params.get_opacity()[:, 0], params.get_features(), features,
        off, cam, jnp.zeros(3),
        img_w=img_w, img_h=img_h, active_sh_degree=active_sh_degree,
        dup_capacity=dup_capacity, alive=aux.alive,
        colors_precomp=colors_precomp)
    maps = ir.derive_geometry_maps(raster, cam, img_w, img_h, depth_ratio)
    alpha = maps["alpha"]
    final = raster.color + bg[None, None] * (1 - alpha)
    out = dict(render=final, raster=raster,
               roughness_map=raster.feature[..., 0:1],
               metallic_map=raster.feature[..., 1:2],
               diffuse_map=raster.feature[..., 2:5],
               specular_map=raster.feature[..., 5:8],
               base_color_map=raster.feature[..., 8:11], **maps)
    if use_indirect and vol is not None:
        out.update(visibility=raster.feature[..., 11:12],
                   indirect_light=raster.feature[..., 12:15],
                   direct_light=raster.feature[..., 15:18])
    return out


def render_surfel2(params, aux, cam: CameraParams, bg, env, *, img_w, img_h,
                   active_sh_degree, dup_capacity=2 ** 21, depth_ratio=0.0,
                   means2d_offset=None):
    """Simplified metallic workflow (≙ render_surfel2, ref_gaussian.py:346-496
    + get_specular_color_surfel2, refl_utils.py): specular is a direct envmap
    query at the pixel reflection direction (no split-sum, no visibility);
    final = (1-metallic)·sh_color + metallic·specular, in sRGB."""
    from ..utils.math3d import rgb_to_srgb

    n = params.n_capacity
    features = jnp.concatenate([params.get_metallic(), params.get_roughness(),
                                params.get_base_color()], -1)
    off = means2d_offset if means2d_offset is not None else jnp.zeros((n, 2))
    raster = sr.rasterize(
        params.xyz, params.get_scaling(), params.rotation,
        params.get_opacity()[:, 0], params.get_features(), features,
        off, cam, jnp.zeros(3),
        img_w=img_w, img_h=img_h, active_sh_degree=active_sh_degree,
        dup_capacity=dup_capacity, alive=aux.alive)
    maps = ir.derive_geometry_maps(raster, cam, img_w, img_h, depth_ratio)
    base_color = raster.color
    metallic = raster.feature[..., 0:1]
    roughness = raster.feature[..., 1:2]
    albedo = raster.feature[..., 2:5]
    normal_map = maps["normal_map"]

    rays_d = maps["rays_d"]
    w_o_px = -rays_d
    ndotv = jnp.sum(normal_map * w_o_px, -1, keepdims=True)
    rays_refl = safe_normalize(2.0 * ndotv * normal_map - w_o_px)
    specular = env.query(rays_refl, mode="pure_env")

    final = rgb_to_srgb((1 - metallic) * base_color + specular * metallic)
    final = final + bg[None, None] * (1 - maps["alpha"])
    return dict(render=final, raster=raster,
                metallic_map=metallic, roughness_map=roughness,
                base_color_map=albedo,
                diffuse_map=(1 - metallic) * base_color,
                specular_map=specular * metallic, **maps)


def render_surfel(params, aux, cam: CameraParams, bg, env1,
                  fg_lut, *, img_w, img_h, active_sh_degree,
                  dup_capacity=2 ** 21, depth_ratio=0.0, vol=None,
                  use_indirect=False, means2d_offset=None):
    """Deferred pixel-space shading (≙ render_surfel, ref_gaussian.py:184-346
    + get_specular_color_surfel, refl_utils.py:65-115)."""
    n = params.n_capacity
    metallic_g = params.get_metallic()
    rough_g = params.get_roughness()
    base_color_g = params.get_base_color()
    normals, w_o, refl = _per_gaussian_view(params, cam)
    indirect_g = jnp.maximum(sh_utils.eval_sh(
        3, jnp.swapaxes(params.get_indirect(), -1, -2), refl), 0.0)

    features = jnp.concatenate([metallic_g, rough_g, base_color_g, indirect_g], -1)
    off = means2d_offset if means2d_offset is not None else jnp.zeros((n, 2))
    raster = sr.rasterize(
        params.xyz, params.get_scaling(), params.rotation,
        params.get_opacity()[:, 0], params.get_features(), features,
        off, cam, jnp.zeros(3),
        img_w=img_w, img_h=img_h, active_sh_degree=active_sh_degree,
        dup_capacity=dup_capacity, alive=aux.alive)
    maps = ir.derive_geometry_maps(raster, cam, img_w, img_h, depth_ratio)
    alpha = maps["alpha"]
    base_color = raster.color                      # SH-rendered base image
    metallic = raster.feature[..., 0:1]
    roughness = raster.feature[..., 1:2]
    albedo = raster.feature[..., 2:5]
    indirect_light = raster.feature[..., 5:8]
    normal_map = maps["normal_map"]

    # pixel-space split-sum specular (get_specular_color_surfel)
    rays_d = maps["rays_d"]
    w_o_px = -rays_d
    ndotv = jnp.sum(normal_map * w_o_px, -1, keepdims=True)
    rays_refl = safe_normalize(2.0 * ndotv * normal_map - w_o_px)
    fg = cm.sample_fg_lut(fg_lut, jnp.clip(ndotv, 0, 1), jnp.clip(roughness, 0, 1))
    direct_light = env1.query(rays_refl, mode="specular", roughness=roughness)
    spec_weight = ((0.04 * (1 - metallic) + albedo * metallic) * fg[..., 0:1]
                   + fg[..., 1:2])

    visibility = jnp.ones_like(alpha)
    if use_indirect and vol is not None:
        pts = maps["points"].reshape(-1, 3)
        refl_px = rays_refl.reshape(-1, 3)
        _, visible = tsdf_ops.ray_march_visibility(vol, pts, refl_px)
        visibility = visible.astype(jnp.float32).reshape(alpha.shape)
        mask = (alpha > 0).astype(jnp.float32)
        visibility = visibility * mask + (1 - mask)
        specular_light = direct_light * visibility + (1 - visibility) * indirect_light
    else:
        specular_light = direct_light

    specular = specular_light * alpha * spec_weight
    final = (1 - metallic) * base_color + specular
    final = final + bg[None, None] * (1 - alpha)

    out = dict(render=final, raster=raster,
               metallic_map=metallic,
               diffuse_map=(1 - metallic) * base_color,
               specular_map=specular,
               base_color_map=albedo,
               roughness_map=roughness, **maps)
    if use_indirect and vol is not None:
        out.update(visibility=visibility,
                   indirect_light=indirect_light,
                   direct_light=direct_light)
    return out
