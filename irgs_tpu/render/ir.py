"""IRGS stage-2 renderer: rasterize G-buffer → Monte-Carlo rendering equation
with traced visibility/indirect light.

≙ reference gaussian_renderer/__init__.py: render_ir (:73-312),
rendering_equation (:334-415), GGX_specular (:417-450),
rendering_equation_chunk (:314-322).

Static-shape re-design: instead of boolean-mask pixel selection (dynamic
shapes), training picks a *fixed-size* random subset of eligible pixels via
top-k on masked random scores (≙ torch.multinomial without replacement,
:203-212); eval shades every pixel in fixed chunks with a validity mask
(≙ rendering_equation_chunk).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..ops import grid_tracer as gt
from ..ops import surfel_raster as sr
from ..scene import envlight
from ..scene.cameras import CameraParams
from ..utils.math3d import rgb_to_srgb, safe_normalize

F0 = 0.04  # fixed fresnel (rendering_equation default f0, :334)


def ggx_specular(normal, pts2c, pts2l, roughness, fresnel: float = 0.04):
    """Analytic GGX specular lobe (≙ GGX_specular, __init__.py:417-450).

    normal/pts2c [B,3], pts2l [B,S,3], roughness [B,1] -> [B,S,1].
    """
    L = safe_normalize(pts2l)
    V = safe_normalize(pts2c)
    H = safe_normalize((L + V[:, None, :]) / 2.0)
    N = safe_normalize(normal)

    NoV0 = jnp.sum(V * N, axis=-1, keepdims=True)
    N = N * jnp.sign(NoV0)

    clamp = lambda x: jnp.clip(x, 1e-6, 1.0)
    NoL = clamp(jnp.sum(N[:, None, :] * L, -1, keepdims=True))
    NoV = clamp(jnp.sum(N * V, -1, keepdims=True))
    NoH = clamp(jnp.sum(N[:, None, :] * H, -1, keepdims=True))
    VoH = clamp(jnp.sum(V[:, None, :] * H, -1, keepdims=True))

    alpha = roughness * roughness
    alpha2 = alpha * alpha
    k = (alpha + 2 * roughness + 1.0) / 8.0
    FMi = (-5.55473 * VoH - 6.98316) * VoH
    frac0 = fresnel + (1 - fresnel) * jnp.power(2.0, FMi)
    frac = frac0 * alpha2[:, None, :]
    nom0 = NoH * NoH * (alpha2[:, None, :] - 1) + 1
    nom1 = NoV * (1 - k) + k
    nom2 = NoL * (1 - k[:, None, :]) + k[:, None, :]
    nom = jnp.clip(4 * jnp.pi * nom0 * nom0 * nom1[:, None, :] * nom2,
                   1e-6, 4 * jnp.pi)
    return frac / nom


@dataclasses.dataclass(frozen=True)
class ShadeConfig:
    """Static knobs of the rendering equation (subset of PipelineConfig)."""
    diffuse_sample_num: int = 256
    light_sample_num: int = 0
    light_t_min: float = 0.05
    wo_indirect: bool = False
    detach_indirect: bool = False
    training: bool = True
    env_activation: str = "exp"


def rendering_equation(base_color, roughness, normals, position, viewdirs,
                       env_raw, env_pdf, trace_fn: Callable, cfg: ShadeConfig,
                       key=None, env_transform=None, shard=None,
                       pixel_ids=None):
    """MC estimate of the rendering equation at [B] surface points.

    ≙ rendering_equation (gaussian_renderer/__init__.py:334-415), non-relight
    branch (relight lives in render/relight.py).

    trace_fn(rays_o [B,S,3], rays_d [B,S,3]) -> normalized TraceOut.

    `shard=(axis_name, n_shards)`: inside shard_map, shard the SAMPLE axis —
    every device generates the identical full sample set (deterministic /
    same key), traces only its 1/n slice, and the per-device partial means
    combine with one `pmean`. Equal slice sizes make this bitwise the same
    estimator as the single-device mean (up to reduction order). The
    reference has no distributed path (SURVEY §2.3); this is the TPU-native
    sample-parallel eval design.
    """
    from .sampling import fibonacci_sphere_sampling

    b = base_color.shape[0]
    s_d, s_l = cfg.diffuse_sample_num, cfg.light_sample_num

    if s_d > 0 and s_l == 0:
        incident_dirs, incident_areas = fibonacci_sphere_sampling(
            normals, s_d, key=key if cfg.training else None)
    elif s_d > 0 and s_l > 0:
        p_diffuse = s_d / (s_d + s_l)
        p_light = s_l / (s_d + s_l)
        kd = kl = None
        if key is not None:
            kd, kl = jax.random.split(key)
        diffuse_dirs, diffuse_areas = fibonacci_sphere_sampling(
            normals, s_d, key=kd if cfg.training else None)
        diffuse_pdfs = 1.0 / diffuse_areas
        light_dirs, light_pdfs = envlight.sample_light_dirs(
            kl if kl is not None else jax.random.PRNGKey(0), env_pdf, b, s_l,
            cfg.training, transform=env_transform, pixel_ids=pixel_ids)
        diffuse_pdfs_light = 1.0 / (2.0 * jnp.pi)
        light_pdfs_diffuse = envlight.light_pdf(env_pdf, diffuse_dirs,
                                                transform=env_transform)
        diffuse_pdfs = diffuse_pdfs * p_diffuse + light_pdfs_diffuse * p_light
        light_pdfs = diffuse_pdfs_light * p_diffuse + light_pdfs * p_light
        incident_dirs = jnp.concatenate([diffuse_dirs, light_dirs], axis=1)
        incident_pdfs = jnp.concatenate([diffuse_pdfs, light_pdfs], axis=1)
        incident_areas = 1.0 / jnp.maximum(incident_pdfs, 1e-6)
    else:
        raise NotImplementedError("diffuse_sample_num must be > 0")

    if shard is not None:
        axis_name, n_shards = shard
        s_total = incident_dirs.shape[1]
        assert s_total % n_shards == 0, (
            f"sample count {s_total} must divide the mesh size {n_shards}")
        s_loc = s_total // n_shards
        di = jax.lax.axis_index(axis_name)
        slice_s = lambda x: jax.lax.dynamic_slice_in_dim(x, di * s_loc, s_loc,
                                                         axis=1)
        incident_dirs = slice_s(incident_dirs)
        incident_areas = slice_s(incident_areas)

    global_incident = envlight.query_env(env_raw, incident_dirs,
                                         activation=cfg.env_activation,
                                         transform=env_transform)

    rays_o = position[:, None] + incident_dirs * cfg.light_t_min
    trace_out = trace_fn(rays_o, incident_dirs)
    incident_visibility = 1.0 - trace_out.alpha[..., None]
    local_incident = trace_out.color
    if cfg.wo_indirect:
        local_incident = jnp.zeros_like(local_incident)
    if cfg.detach_indirect:
        incident_visibility = jax.lax.stop_gradient(incident_visibility)
        local_incident = jax.lax.stop_gradient(local_incident)
    incident_lights = incident_visibility * global_incident + local_incident

    n_d_i = jnp.maximum(jnp.sum(normals[:, None] * incident_dirs, -1, keepdims=True), 0.0)
    f_d = base_color[:, None] / jnp.pi
    f_s = ggx_specular(normals, viewdirs, incident_dirs, roughness, fresnel=F0)

    transport = incident_lights * incident_areas * n_d_i
    diffuse = jnp.mean(f_d * transport, axis=-2)
    specular = jnp.mean(f_s * transport, axis=-2)

    results = {
        "diffuse": diffuse,
        "specular": specular,
        "light_direct": jnp.mean(global_incident, axis=1),
    }
    if not cfg.training:
        results.update({
            "visibility": jnp.mean(incident_visibility, axis=1),
            "light": jnp.mean(incident_lights, axis=1),
            "light_indirect": jnp.mean(local_incident, axis=1),
        })
    if shard is not None:
        # equal-size sample slices: mean of per-device partial means == the
        # full-sample mean
        results = jax.tree.map(lambda x: jax.lax.pmean(x, shard[0]), results)
    return results


def make_trace_fn(params, aux, grid, tracer_cfg: gt.TracerConfig,
                  cam_pos, sh_deg: int, with_materials: bool = False,
                  ray_chunk: int = 65536, stats_out: dict | None = None):
    """Bind Gaussian state into a trace closure with the reference's
    input prep + output normalization (GaussianModel.trace,
    scene/gaussian_model.py:733-765).

    `stats_out`: optional dict that trace_fn populates (at trace time) with
    truncation observability scalars — `trace_trunc_frac` (rays whose first
    pass truncated while transmissive) and `trace_more_frac` (rays STILL
    truncated after all re-trace rounds — unresolved budget truncation).
    Only the chunked path reports; callers log them per train step
    (≙ the debug posture of CHECK_CUDA, auxiliary.h:303)."""
    from ..utils import math3d

    s = params.get_scaling()
    R = math3d.quat_to_rotmat(params.rotation)
    ru = R[:, :, 0] / s[:, 0:1]
    rv = R[:, :, 1] / s[:, 1:2]
    normals = params.world_normals(cam_pos=cam_pos)
    opacity = jnp.where(aux.alive, params.get_opacity()[:, 0], 0.0)
    if with_materials:
        features = jnp.concatenate([params.get_base_color(),
                                    params.get_roughness()], axis=-1)
    else:
        features = jnp.zeros((params.n_capacity, 0), jnp.float32)
    inputs = gt.TraceInputs(
        means3d=params.xyz, opacity=opacity, ru=ru, rv=rv, normals=normals,
        shs=params.get_features(), features=features)

    def trace_fn(rays_o, rays_d):
        shape = rays_o.shape[:-1]
        ro = rays_o.reshape(-1, 3)
        rd = rays_d.reshape(-1, 3)
        m = ro.shape[0]
        # coherence sort: rays grouped by direction octant + origin cell so
        # each chunk's step-synchronous DDA loop terminates together
        if m > ray_chunk:
            oct_ = ((rd[:, 0] > 0).astype(jnp.int32) * 4
                    + (rd[:, 1] > 0).astype(jnp.int32) * 2
                    + (rd[:, 2] > 0).astype(jnp.int32))
            cell = jnp.clip(((ro - grid.bb_min) * grid.inv_cell).astype(jnp.int32),
                            0, tracer_cfg.grid_res - 1)
            ckey = (cell[:, 2] * tracer_cfg.grid_res + cell[:, 1]) \
                * tracer_cfg.grid_res + cell[:, 0]
            order = jnp.argsort(oct_ * (tracer_cfg.grid_res ** 3) + ckey)
            inv_order = jnp.argsort(order)
            ro = ro[order]
            rd = rd[order]
        # chunk the ray axis to bound the tracer's [R, K, ...] working set
        # (≙ the reference's ray-batch chunking, __init__.py:314-322).
        # cell collection AND hit selection (index-only, non-diff) run ONCE
        # over all rays — inside the chunk loop they would be re-executed by
        # the AD remat and their outputs carried through the scan. Only the
        # slim k-buffer blend is differentiated.
        if m > ray_chunk:
            pad = (-m) % ray_chunk
            rop = jnp.pad(ro, ((0, pad), (0, 0)))
            rdp = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
            ro_sg = jax.lax.stop_gradient(rop)
            rd_sg = jax.lax.stop_gradient(rdp)
            geom = jax.lax.stop_gradient(gt._pack_geom(inputs))
            rop_c = rop.reshape(-1, ray_chunk, 3)
            rdp_c = rdp.reshape(-1, ray_chunk, 3)
            n_chunks = rop_c.shape[0]
            # collect+select run in as few calls as HBM allows: select's
            # working set is ~6 [rays, max_hits] f32 arrays and collect's a
            # few [rays, 3*crossings] buffers, so the rays-per-call budget
            # scales inversely with the candidate width (the training ray
            # budget runs in ONE call at the default width; wide-candidate
            # eval configs and the 10^6-ray eval path chunk)
            sel_width = max(tracer_cfg.select_tiles * tracer_cfg.tile,
                            tracer_cfg.prefilter_width, tracer_cfg.max_hits)
            target = max(2 ** 12, (2 ** 18 * 48) // max(sel_width, 48))
            if target >= ray_chunk:
                k = min(n_chunks, max(1, target // ray_chunk))
                while n_chunks % k:
                    k -= 1
                sel_rays = ray_chunk * k
            else:
                # wide-candidate configs: select over sub-chunk ray groups
                sel_rays = ray_chunk
                while sel_rays > target and sel_rays % 2 == 0 and sel_rays > 2 ** 12:
                    sel_rays //= 2
            n_sel = rop.shape[0] // sel_rays

            pair_tab = (gt._pair_tab_from_geom(grid, geom, tracer_cfg.tile,
                                               bf16=tracer_cfg.table_bf16)
                        if tracer_cfg.select_tiles > 0 else None)

            def collect_select(a, b):
                cl = gt.collect_cells(a, b, grid, tracer_cfg)
                return gt.select_hits(a, b, grid.sorted_gauss, cl, geom,
                                      tracer_cfg, False, grid=grid,
                                      pair_tab=pair_tab)

            if n_sel == 1:
                hits = collect_select(ro_sg, rd_sg)
            else:
                resh = lambda x: x.reshape(n_sel, sel_rays, *x.shape[1:])
                hits = jax.lax.map(lambda ab: collect_select(ab[0], ab[1]),
                                   (resh(ro_sg), resh(rd_sg)))
                hits = jax.tree.map(
                    lambda x: x.reshape(n_sel * sel_rays, *x.shape[2:]), hits)
            hits_c = jax.tree.map(
                lambda x: x.reshape(n_chunks, ray_chunk, *x.shape[1:]), hits)

            def one(i_or_slice):
                ab = jax.tree.map(lambda x: x[i_or_slice],
                                  (rop_c, rdp_c, hits_c))
                return gt.trace(ab[0], ab[1], grid, inputs, cfg=tracer_cfg,
                                sh_deg=sh_deg, hits=ab[2])

            if n_chunks <= 8:
                # unrolled: a lax.map would carry the [N,...] gradient
                # accumulators through every scan iteration (25+ MB copies
                # per chunk in the backward pass)
                outs = [one(i) for i in range(n_chunks)]
                out = jax.tree.map(lambda *xs: jnp.stack(xs), *outs)
            else:
                out = jax.lax.map(
                    lambda ab: gt.trace(ab[0], ab[1], grid, inputs,
                                        cfg=tracer_cfg, sh_deg=sh_deg,
                                        hits=ab[2]),
                    (rop_c, rdp_c, hits_c))
            out = gt.TraceOut(*[
                x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])
                for x in out])
            mp = rop.shape[0]
            row_ok = jnp.arange(mp) < m
            hits = hits._replace(more=hits.more & row_ok)
            if stats_out is not None:
                need0 = hits.more & (jax.lax.stop_gradient(out.trans)
                                     > tracer_cfg.transmittance_min)
                stats_out["trace_trunc_frac"] = jnp.sum(need0) / m
            if tracer_cfg.n_segments > 1:
                # segmented re-trace on the padded, coherence-sorted arrays
                # (≙ gaussiantrace_forward.cu:27-103's per-segment loop);
                # the first pass's tile-row table is reused by every round
                out, hits = gt.retrace_rounds(out, hits, rop, rdp, grid,
                                              inputs, tracer_cfg, sh_deg,
                                              pair_tab=pair_tab)
            if stats_out is not None:
                need_end = hits.more & (jax.lax.stop_gradient(out.trans)
                                        > tracer_cfg.transmittance_min)
                stats_out["trace_more_frac"] = jnp.sum(need_end) / m
            out = gt.TraceOut(*[x[:m][inv_order] for x in out])
        elif tracer_cfg.n_segments > 1:
            out = gt.trace_segments(ro, rd, grid, inputs, cfg=tracer_cfg,
                                    sh_deg=sh_deg)
        else:
            out = gt.trace(ro, rd, grid, inputs, cfg=tracer_cfg, sh_deg=sh_deg)
        out = gt.normalize_trace(out, tracer_cfg.transmittance_min)
        return gt.TraceOut(*[x.reshape(shape + x.shape[1:]) for x in out])

    return trace_fn


def derive_geometry_maps(out: sr.RasterOut, cam: CameraParams,
                         img_w: int, img_h: int, depth_ratio: float = 0.0):
    """G-buffer post-processing (≙ render_ir lines 133-171): world normals,
    expected/median depth, world points, finite-difference surface normal."""
    alpha = out.alpha[..., None]                          # [H, W, 1]
    r_c2w = cam.w2c[:3, :3].T
    rend_normal = out.normal @ r_c2w.T                    # view->world
    depth_expected = jnp.nan_to_num(out.depth / jnp.maximum(alpha[..., 0], 1e-12))
    # true median depth (T=0.5 crossing); no alpha division, matching
    # render_ir's use of allmap[5] (__init__.py:142-143). The reference
    # fork's CUDA actually stores Σw·z² in that slot (forward.cu:447) —
    # we keep the second moment separately as out.depth2.
    depth_median = jnp.nan_to_num(out.depth_median)
    surf_depth = depth_expected * (1 - depth_ratio) + depth_ratio * depth_median

    rays_unnorm = cam.ray_dirs(img_w, img_h, normalize=False)
    points = surf_depth[..., None] * rays_unnorm + cam.cam_pos

    dx = points[2:, 1:-1] - points[:-2, 1:-1]
    dy = points[1:-1, 2:] - points[1:-1, :-2]
    sn = safe_normalize(jnp.cross(dx, dy))
    surf_normal = jnp.zeros_like(points).at[1:-1, 1:-1].set(sn)
    surf_normal = surf_normal * jax.lax.stop_gradient(alpha)

    normal_map = rend_normal / jnp.maximum(alpha, 1e-6)
    normal_map = safe_normalize(normal_map)
    return dict(alpha=alpha, rend_normal=rend_normal, surf_depth=surf_depth,
                depth_expected=depth_expected, depth_median=depth_median,
                points=points,
                surf_normal=surf_normal, normal_map=normal_map,
                rays_d=cam.ray_dirs(img_w, img_h, normalize=True))


def select_train_pixels(key, eligible, num_pixels: int):
    """Uniform sample of `num_pixels` pixels among `eligible` [H, W] (static
    size; ≙ the multinomial draw at __init__.py:203-212). Returns flat
    indices [P] and a validity mask [P]."""
    flat = eligible.reshape(-1)
    scores = jnp.where(flat, jax.random.uniform(key, flat.shape), -1.0)
    _, idx = jax.lax.top_k(scores, num_pixels)
    valid = flat[idx]
    return idx, valid
