"""Relighting: swap in a ground-truth HDR envmap and re-shade traced hits
with split-sum IBL.

≙ the relight branch of rendering_equation (gaussian_renderer/
__init__.py:362-380) + eval_relighting_* env setup (eval_relighting_syn4.py:
109-224): EnvLight(activation='none') from an HDR file, build_mips +
update_pdf + set_transform, then render with relight=True.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..scene import cubemap as cm
from ..scene import envlight
from ..utils.math3d import safe_normalize
from . import ir


class RelightEnv(NamedTuple):
    """Prefiltered environment for relighting (≙ EnvLight after build_mips)."""
    base: jnp.ndarray          # [H, W, 3] lat-long (raw; activation applied on query)
    pdf: jnp.ndarray           # [H, W]
    specular_mips: tuple       # tuple of [6, R, R, 3]
    diffuse: jnp.ndarray       # [6, Rd, Rd, 3]
    transform: jnp.ndarray | None
    activation: str = "none"


def build_relight_env(latlong_hdr, transform=None, max_res: int = 128,
                      min_res: int = 16, activation: str = "none") -> RelightEnv:
    """≙ EnvLight.build_mips + update_pdf (light.py:174-179,264-280)."""
    base_cube = cm.latlong_to_cubemap(latlong_hdr, max_res)
    specular, diffuse = cm.build_specular_mips(base_cube, min_res=min_res)
    pdf = envlight.build_pdf(latlong_hdr, activation=activation)
    return RelightEnv(base=latlong_hdr, pdf=pdf, specular_mips=tuple(specular),
                      diffuse=diffuse, transform=transform, activation=activation)


def _activate(env: RelightEnv, light):
    return jnp.maximum(envlight.activate(light, env.activation), 0.0)


def env_query(env: RelightEnv, dirs, mode: str = "pure_env", roughness=None):
    """≙ EnvLight.__call__ (light.py:292-328)."""
    d = dirs if env.transform is None else dirs @ env.transform.T
    if mode == "pure_env":
        return envlight.query_env(env.base, dirs, activation=env.activation,
                                  transform=env.transform)
    if mode == "diffuse":
        return _activate(env, cm.sample_cubemap_smooth(env.diffuse, d))
    if mode == "specular":
        mip = cm.roughness_to_mip(roughness[..., 0], len(env.specular_mips))
        return _activate(env, cm.sample_cubemap_mip(list(env.specular_mips), d,
                                                    mip, smooth=True))
    raise ValueError(mode)


class _TraceLike(NamedTuple):
    """The subset of gt.TraceOut the relight shading consumes."""
    alpha: jnp.ndarray
    normal: jnp.ndarray
    feature: jnp.ndarray


class DiffuseTraceCache(NamedTuple):
    """Envmap-INDEPENDENT half of relight shading, computed once per view
    and reused across every relighting envmap: the deterministic fibonacci
    hemisphere directions plus their trace results. Valid because relight
    trace_fn returns geometry + MATERIALS of the hits (not radiance), so
    nothing traced depends on the lighting — only the per-env shading does.
    (The reference re-traces all samples per envmap,
    eval_relighting_syn4.py:188-193; this halves+ the relight eval cost
    for multi-envmap grids.) Light-importance samples still trace per env
    (their directions follow each env's pdf)."""
    dirs: jnp.ndarray            # [B, s_d, 3]
    areas: jnp.ndarray           # [B, s_d, 1] raw fibonacci areas
    alpha: jnp.ndarray           # [B, s_d]
    normal: jnp.ndarray          # [B, s_d, 3]
    feature: jnp.ndarray         # [B, s_d, 4] premultiplied base|rough


def trace_diffuse_cache(normals, position, trace_fn, cfg: ir.ShadeConfig,
                        key=None) -> DiffuseTraceCache:
    """Trace the diffuse (cosine-hemisphere fibonacci) half of the relight
    sample set. Deterministic at eval (key=None)."""
    from .sampling import fibonacci_sphere_sampling

    dirs, areas = fibonacci_sphere_sampling(
        normals, cfg.diffuse_sample_num, key=key if cfg.training else None)
    rays_o = position[:, None] + dirs * cfg.light_t_min
    out = trace_fn(rays_o, dirs)
    return DiffuseTraceCache(dirs=dirs, areas=areas, alpha=out.alpha,
                             normal=out.normal, feature=out.feature[..., :4])


def rendering_equation_relight(base_color, roughness, normals, position,
                               viewdirs, env: RelightEnv, trace_fn,
                               cfg: ir.ShadeConfig, fg_lut, key=None,
                               f0: float = 0.02, wo_indirect_relight: bool = False,
                               pixel_ids=None,
                               diffuse_cache: DiffuseTraceCache | None = None):
    """Relight MC shading at [B] surface points. trace_fn must return
    materials in TraceOut.feature[..., :4] = (base_color, roughness)
    (≙ pc.trace with features, __init__.py:363-364).

    `diffuse_cache`: optional per-view cache from trace_diffuse_cache —
    skips re-tracing the env-independent diffuse half (the light-importance
    half still traces against THIS env's pdf). Bitwise-identical to the
    uncached path at eval (deterministic fibonacci dirs)."""
    from .sampling import fibonacci_sphere_sampling

    b = base_color.shape[0]
    s_d, s_l = cfg.diffuse_sample_num, cfg.light_sample_num
    tf = env.transform

    if s_l > 0:
        p_diffuse = s_d / (s_d + s_l)
        p_light = s_l / (s_d + s_l)
        kd = kl = None
        if key is not None:
            kd, kl = jax.random.split(key)
        if diffuse_cache is not None:
            diffuse_dirs, diffuse_areas = (diffuse_cache.dirs,
                                           diffuse_cache.areas)
        else:
            diffuse_dirs, diffuse_areas = fibonacci_sphere_sampling(
                normals, s_d, key=kd if cfg.training else None)
        diffuse_pdfs = 1.0 / diffuse_areas
        light_dirs, light_pdfs = envlight.sample_light_dirs(
            kl if kl is not None else jax.random.PRNGKey(0), env.pdf, b, s_l,
            cfg.training, transform=tf, pixel_ids=pixel_ids)
        light_pdfs_diffuse = envlight.light_pdf(env.pdf, diffuse_dirs, transform=tf)
        diffuse_pdfs = diffuse_pdfs * p_diffuse + light_pdfs_diffuse * p_light
        light_pdfs = (1.0 / (2 * jnp.pi)) * p_diffuse + light_pdfs * p_light
        incident_dirs = jnp.concatenate([diffuse_dirs, light_dirs], axis=1)
        incident_areas = 1.0 / jnp.maximum(
            jnp.concatenate([diffuse_pdfs, light_pdfs], axis=1), 1e-6)
    else:
        if diffuse_cache is not None:
            incident_dirs = diffuse_cache.dirs
            incident_areas = diffuse_cache.areas
        else:
            incident_dirs, incident_areas = fibonacci_sphere_sampling(
                normals, s_d, key=key if cfg.training else None)

    global_incident = env_query(env, incident_dirs, "pure_env")

    if diffuse_cache is not None and s_l > 0:
        rays_o = position[:, None] + light_dirs * cfg.light_t_min
        lt = trace_fn(rays_o, light_dirs)
        trace_out = _TraceLike(
            alpha=jnp.concatenate([diffuse_cache.alpha, lt.alpha], axis=1),
            normal=jnp.concatenate([diffuse_cache.normal, lt.normal], axis=1),
            feature=jnp.concatenate(
                [diffuse_cache.feature, lt.feature[..., :4]], axis=1))
    elif diffuse_cache is not None:
        trace_out = _TraceLike(alpha=diffuse_cache.alpha,
                                 normal=diffuse_cache.normal,
                                 feature=diffuse_cache.feature)
    else:
        rays_o = position[:, None] + incident_dirs * cfg.light_t_min
        trace_out = trace_fn(rays_o, incident_dirs)
    trace_alpha = trace_out.alpha[..., None]
    incident_visibility = 1.0 - trace_alpha
    trace_feature = trace_out.feature / jnp.maximum(trace_alpha, 1e-6)
    trace_normal = safe_normalize(trace_out.normal)
    trace_base, trace_rough = trace_feature[..., :3], trace_feature[..., 3:4]

    # re-shade the hit surfels with split-sum IBL (__init__.py:370-377)
    trace_diffuse = trace_base * env_query(env, trace_normal, "diffuse")
    trace_wi = -incident_dirs
    ndotv = jnp.sum(trace_normal * trace_wi, -1, keepdims=True)
    reflected = safe_normalize(2.0 * ndotv * trace_normal - trace_wi)
    fg_uv = jnp.clip(jnp.concatenate([ndotv, trace_rough], -1), 0.0, 1.0)
    fg = cm.sample_fg_lut(fg_lut, fg_uv[..., 0:1], fg_uv[..., 1:2])
    trace_spec = env_query(env, reflected, "specular", roughness=trace_rough) \
        * (f0 * fg[..., 0:1] + fg[..., 1:2])
    local_incident = (trace_diffuse + trace_spec) * trace_alpha
    if wo_indirect_relight:
        local_incident = jnp.zeros_like(local_incident)
    incident_lights = incident_visibility * global_incident + local_incident

    n_d_i = jnp.maximum(jnp.sum(normals[:, None] * incident_dirs, -1, keepdims=True), 0.0)
    f_d = base_color[:, None] / jnp.pi
    f_s = ir.ggx_specular(normals, viewdirs, incident_dirs, roughness, fresnel=0.04)
    transport = incident_lights * incident_areas * n_d_i
    return {
        "diffuse": jnp.mean(f_d * transport, axis=-2),
        "specular": jnp.mean(f_s * transport, axis=-2),
        "visibility": jnp.mean(incident_visibility, axis=1),
        "light": jnp.mean(incident_lights, axis=1),
        "light_indirect": jnp.mean(local_incident, axis=1),
        "light_direct": jnp.mean(global_incident, axis=1),
    }
