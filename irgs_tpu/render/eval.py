"""Full-frame eval rendering (NVS path).

≙ render_ir with training=False (gaussian_renderer/__init__.py:73-312) +
rendering_equation_chunk (:314-322): every pixel is MC-shaded in fixed-size
chunks, composing the same ~20 AOV set the reference returns.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..ops import grid_tracer as gt
from ..ops import surfel_raster as sr
from ..scene import envlight
from ..scene.cameras import CameraParams
from ..utils.math3d import rgb_to_srgb
from . import ir


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    img_w: int
    img_h: int
    active_sh_degree: int = 3
    diffuse_sample_num: int = 512
    light_sample_num: int = 256
    light_t_min: float = 0.05
    wo_indirect: bool = False
    white_background: bool = False
    dup_capacity: int = 2 ** 21
    chunk_point_samples: int = 2 ** 20     # reference chunk budget
    depth_ratio: float = 0.0
    env_activation: str = "exp"    # "softplus" ≙ DirectLightMap (light.py:379)
    tracer: gt.TracerConfig = dataclasses.field(default_factory=gt.TracerConfig)

    @property
    def pixel_chunk(self) -> int:
        s = self.diffuse_sample_num + self.light_sample_num
        c = max(self.chunk_point_samples // s, 128)
        return min(1 << (c.bit_length() - 1), 4096)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _gbuffer(params, aux, cam: CameraParams, cfg: EvalConfig):
    features = jnp.concatenate([params.get_base_color(), params.get_roughness()],
                               axis=-1)
    raster = sr.rasterize(
        params.xyz, params.get_scaling(), params.rotation,
        params.get_opacity()[:, 0], params.get_features(), features,
        jnp.zeros((params.n_capacity, 2)), cam, jnp.zeros(3),
        img_w=cfg.img_w, img_h=cfg.img_h, active_sh_degree=cfg.active_sh_degree,
        dup_capacity=cfg.dup_capacity, alive=aux.alive)
    maps = ir.derive_geometry_maps(raster, cam, cfg.img_w, cfg.img_h,
                                   depth_ratio=cfg.depth_ratio)
    return raster, maps


def _shade_impl(px_c, params, aux, grid, env_raw, pdf, cam_pos,
                env_transform, cfg: EvalConfig, shard=None):
    """One pixel chunk through the MC rendering equation. Everything the
    trace closure binds (params, grid tables) enters as jit ARGUMENTS —
    closed-over device arrays trigger pathological constant-fold compiles
    on the remote-compile backend."""
    trace_fn = ir.make_trace_fn(params, aux, grid, cfg.tracer, cam_pos,
                                cfg.active_sh_degree)
    shade_cfg = ir.ShadeConfig(
        diffuse_sample_num=cfg.diffuse_sample_num,
        light_sample_num=cfg.light_sample_num, light_t_min=cfg.light_t_min,
        wo_indirect=cfg.wo_indirect, training=False,
        env_activation=cfg.env_activation)
    return ir.rendering_equation(
        px_c["base"], px_c["rough"], px_c["normal"], px_c["points"],
        px_c["wo"], env_raw, pdf, trace_fn, shade_cfg, key=None,
        env_transform=env_transform, shard=shard,
        pixel_ids=px_c["pid"][:, 0] if "pid" in px_c else None)


_shade_chunk = functools.partial(jax.jit, static_argnames=("cfg",))(_shade_impl)


@functools.lru_cache(maxsize=8)
def _shade_chunk_sharded(mesh, cfg: EvalConfig):
    """Per-chunk sample-sharded shade over a device mesh (replicated
    inputs; each device traces its 1/D slice of every pixel's samples,
    partial means combine with a pmean inside rendering_equation)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    axis = mesh.axis_names[0]

    def impl(px_c, params, aux, grid, env_raw, pdf, cam_pos, env_transform):
        return _shade_impl(px_c, params, aux, grid, env_raw, pdf, cam_pos,
                           env_transform, cfg, shard=(axis, mesh.size))

    return jax.jit(shard_map(impl, mesh=mesh, in_specs=(P(),) * 8,
                             out_specs=P(), check_vma=False))


def render_ir_eval(params, aux, grid, cam: CameraParams, cfg: EvalConfig,
                  env_override=None, env_transform=None, key=None, mesh=None,
                  compact_fg: bool = True):
    """Render one eval view with all AOVs. Returns dict of [H, W, C] images.

    `mesh`: optional jax.sharding.Mesh — the MC sample axis shards across
    its devices (each chip traces 1/D of every pixel's incident samples;
    partial means combine with a pmean inside rendering_equation). The
    G-buffer rasterization is replicated (it is a tiny fraction of eval
    cost at the reference sample counts).

    `compact_fg`: shade ONLY foreground pixels (≙ the reference's eval
    pixel set `mask = render_alpha[0] > 0`, gaussian_renderer/
    __init__.py:215-216) — background pixels never pay the MC budget
    (2-3x fewer traced rays on typical object scenes). Requires eager
    (host-level) invocation: chunks dispatch one jitted call each, so a
    device fault can't kill a whole frame. Under an outer jit this
    silently falls back to the all-pixels path.
    """
    bg = jnp.full((3,), 1.0 if cfg.white_background else 0.0, jnp.float32)
    w, h = cfg.img_w, cfg.img_h
    raster, maps = _gbuffer(params, aux, cam, cfg)
    alpha = maps["alpha"]

    env_raw = params.env if env_override is None else env_override
    pdf = envlight.build_pdf(env_raw, activation=cfg.env_activation)

    flat = lambda x: x.reshape(-1, x.shape[-1])
    n_px = w * h
    px = dict(
        base=flat(raster.feature[..., :3]),
        rough=flat(raster.feature[..., 3:4]),
        normal=flat(maps["normal_map"]),
        points=flat(maps["points"]),
        wo=-flat(maps["rays_d"]),
        # per-pixel identity: light-sample draws become a pure function of
        # the pixel, invariant to chunking/compaction/eval order
        pid=jnp.arange(n_px, dtype=jnp.int32)[:, None],
    )
    pc = cfg.pixel_chunk

    if compact_fg and not isinstance(alpha, jax.core.Tracer):
        import numpy as np
        fg = np.flatnonzero(np.asarray(alpha[..., 0]) > 0)
        if fg.size == 0:
            fg = np.zeros((1,), np.int64)
        n_fg = int(fg.size)
        n_chunks = -(-n_fg // pc)
        idx = np.zeros(n_chunks * pc, np.int32)
        idx[:n_fg] = fg
        px_sel = {k: v[jnp.asarray(idx)] for k, v in px.items()}
        outs = []
        for c in range(n_chunks):
            px_c = {k: v[c * pc:(c + 1) * pc] for k, v in px_sel.items()}
            if mesh is None:
                re_c = _shade_chunk(px_c, params, aux, grid, env_raw, pdf,
                                    cam.cam_pos, env_transform, cfg=cfg)
            else:
                re_c = _shade_chunk_sharded(mesh, cfg)(
                    px_c, params, aux, grid, env_raw, pdf, cam.cam_pos,
                    env_transform)
            # sync per chunk: bounds device-queue depth (long queued work
            # faults the tunnel device) and makes frames resumable
            outs.append({k: np.asarray(v) for k, v in re_c.items()})
        re = {}
        for k in outs[0]:
            acc = np.concatenate([o[k] for o in outs])[:n_fg]
            buf = np.zeros((n_px, acc.shape[-1]), np.float32)
            buf[fg] = acc
            re[k] = jnp.asarray(buf.reshape(h, w, -1))
    else:
        pad = (-n_px) % pc
        pxp = {k: jnp.pad(v, ((0, pad), (0, 0))) for k, v in px.items()}
        pxp = {k: v.reshape(-1, pc, v.shape[-1]) for k, v in pxp.items()}

        def shade_chunk(c, shard=None):
            return _shade_impl(c, params, aux, grid, env_raw, pdf,
                               cam.cam_pos, env_transform, cfg, shard=shard)

        if mesh is None:
            re = jax.lax.map(shade_chunk, pxp)
        else:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            axis = mesh.axis_names[0]
            n_dev = mesh.size

            def dev_fn(pxd):
                return jax.lax.map(
                    functools.partial(shade_chunk, shard=(axis, n_dev)), pxd)

            re = shard_map(dev_fn, mesh=mesh, in_specs=(P(),), out_specs=P(),
                           check_vma=False)(pxp)
        re = {k: v.reshape((-1,) + v.shape[2:])[:n_px].reshape(h, w, -1)
              for k, v in re.items()}

    rendered_full = rgb_to_srgb(re["diffuse"] + re["specular"])
    final = rendered_full * alpha + bg[None, None] * (1 - alpha)
    env_dirs = maps["rays_d"]
    direct = rgb_to_srgb(envlight.query_env(env_raw, env_dirs,
                                            activation=cfg.env_activation,
                                            transform=env_transform))
    out = {
        "render": final,
        "render_env": rendered_full * alpha + direct * (1 - alpha),
        "render_sh": rgb_to_srgb(raster.color) + bg[None, None] * (1 - alpha),
        "diffuse": rgb_to_srgb(re["diffuse"]),
        "specular": rgb_to_srgb(re["specular"]),
        "env_only": direct,
        "base_color": rgb_to_srgb(raster.feature[..., :3]) * alpha,
        "base_color_linear": raster.feature[..., :3] * alpha,
        "roughness": raster.feature[..., 3:4] * alpha,
        "rend_alpha": alpha,
        "rend_normal": maps["rend_normal"],
        "surf_normal": maps["surf_normal"],
        "surf_depth": maps["surf_depth"][..., None],
        "rend_dist": raster.distortion[..., None],
        "visibility": re["visibility"] * alpha,
        "light": rgb_to_srgb(re["light"] * alpha),
        "light_indirect": rgb_to_srgb(re["light_indirect"] * alpha),
        "light_direct": rgb_to_srgb(re["light_direct"] * alpha),
    }
    return out
