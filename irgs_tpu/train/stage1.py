"""Stage-1-lite trainer: geometry reconstruction with plain 2DGS rendering.

≙ reference train_refgaussian.py:38-255 restricted to the `render_initial`
phase (ref_gaussian.py:69-179) + calculate_loss (utils/loss_utils.py:90-157)
+ the densify/prune schedule. The deferred/volume shading phases (envmap₂,
indirect SH, mesh tracer) layer on top in later rounds — render_initial alone
is the minimum end-to-end geometry model (SURVEY §7.3).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..ops import surfel_raster as sr
from ..render import ir
from ..scene.cameras import CameraParams
from ..scene.gaussians import GaussianAux, GaussianParams
from . import losses as L
from .optim import make_gaussian_optimizer


class TrainState(NamedTuple):
    params: GaussianParams
    aux: GaussianAux
    opt_state: optax.OptState
    step: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class Stage1Static:
    img_w: int
    img_h: int
    active_sh_degree: int
    white_background: bool
    dup_capacity: int = 2 ** 21
    lambda_dssim: float = 0.2
    lambda_dist: float = 0.0
    lambda_normal_render_depth: float = 0.05
    lambda_normal_smooth: float = 0.0
    lambda_depth_smooth: float = 0.0
    lambda_mask_entropy: float = 0.0
    normal_loss_start: int = 0
    dist_loss_start: int = 3000
    depth_ratio: float = 0.0


def stage1_forward_loss(params: GaussianParams, means2d_offset,
                        aux: GaussianAux, cam: CameraParams, gt_image,
                        cam_mask, iteration, st: Stage1Static):
    bg = jnp.full((3,), 1.0 if st.white_background else 0.0, jnp.float32)
    raster = sr.rasterize(
        params.xyz, params.get_scaling(), params.rotation,
        params.get_opacity()[:, 0], params.get_features(),
        jnp.zeros((params.n_capacity, 0)), means2d_offset, cam, jnp.zeros(3),
        img_w=st.img_w, img_h=st.img_h, active_sh_degree=st.active_sh_degree,
        dup_capacity=st.dup_capacity, alive=aux.alive)

    maps = ir.derive_geometry_maps(raster, cam, st.img_w, st.img_h,
                                   depth_ratio=st.depth_ratio)
    alpha = maps["alpha"]
    image = raster.color + bg[None, None] * (1 - alpha)

    l_l1 = L.l1_loss(image, gt_image)
    ssim_val = L.ssim(image, gt_image)
    loss = (1 - st.lambda_dssim) * l_l1 + st.lambda_dssim * (1 - ssim_val)
    metrics = {"loss_l1": l_l1, "ssim": ssim_val,
               "psnr": L.psnr(image, gt_image)}

    if st.lambda_normal_render_depth > 0:
        l_norm = L.normal_consistency_loss(maps["rend_normal"], maps["surf_normal"])
        on = (iteration > st.normal_loss_start).astype(jnp.float32)
        loss = loss + st.lambda_normal_render_depth * l_norm * on
        metrics["loss_normal"] = l_norm
    if st.lambda_dist > 0:
        on = (iteration > st.dist_loss_start).astype(jnp.float32)
        loss = loss + st.lambda_dist * raster.distortion.mean() * on
    if st.lambda_normal_smooth > 0:
        loss = loss + st.lambda_normal_smooth * L.first_order_edge_aware_loss(
            maps["rend_normal"], gt_image)
    if st.lambda_depth_smooth > 0:
        on = (iteration > 3000).astype(jnp.float32)
        loss = loss + st.lambda_depth_smooth * L.first_order_edge_aware_loss(
            maps["surf_depth"][..., None], gt_image) * on
    if cam_mask is not None and st.lambda_mask_entropy > 0:
        loss = loss + st.lambda_mask_entropy * L.mask_entropy_loss(
            alpha[..., 0], cam_mask)

    metrics["loss"] = loss
    return loss, (metrics, raster.radii)


@functools.partial(jax.jit, static_argnames=("st", "optimizer"))
def stage1_step(state: TrainState, cam: CameraParams, gt_image, cam_mask,
                *, st: Stage1Static, optimizer):
    """One geometry-training iteration, incl. densification-stat accumulation
    via the means2D-offset gradient hack (≙ screenspace_points,
    ref_gaussian.py:72-76 + train_refgaussian.py:195-199)."""
    from .densify import add_densification_stats

    zeros2d = jnp.zeros((state.params.n_capacity, 2))

    def loss_fn(params, m2d):
        return stage1_forward_loss(params, m2d, state.aux, cam, gt_image,
                                   cam_mask, state.step, st)

    (loss, (metrics, radii)), (grads, g2d) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(state.params, zeros2d)
    aux = add_densification_stats(state.aux, g2d, radii)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, aux, opt_state, state.step + 1), metrics


def init_state(params: GaussianParams, aux: GaussianAux, opt_cfg,
               spatial_lr_scale: float = 1.0):
    optimizer = make_gaussian_optimizer(opt_cfg, spatial_lr_scale, stage2=False)
    return TrainState(params, aux, optimizer.init(params), jnp.int32(0)), optimizer
