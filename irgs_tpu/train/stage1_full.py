"""Full stage-1 (Ref-Gaussian) training: three-phase schedule with deferred
shading, densification, resets, and periodic TSDF meshing.

≙ reference train_refgaussian.py:38-255:
* phase select per iter (select_render_method :257-264): initial 2DGS until
  `init_until_iter`, per-Gaussian volume shading (envmap₂) until
  `volume_render_until_iter`, then pixel-space deferred surfel shading
  (envmap₁),
* calculate_loss (loss_utils.py:90-157),
* densify/prune + opacity/metallic resets + normal-propagation events,
* TSDF reconstruction every MESH_EXTRACT_INTERVAL after `indirect_from_iter`
  feeding reflection visibility (update_mesh ≙ refreshed TSDF volume).

Each phase is one jitted step; schedule decisions happen on host (they are
infrequent and data-independent).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..ops import tsdf as tsdf_ops
from ..render import ref_gaussian as rg
from ..scene import ref_gaussians as rgs
from ..scene.cameras import CameraParams
from ..scene.ref_gaussians import EnvMips, RefGaussianParams
from . import losses as L
from .optim import expon_lr_schedule


class Stage1State(NamedTuple):
    params: RefGaussianParams
    aux: "rgs.GaussianAux"
    opt_state: optax.OptState
    step: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class Stage1FullStatic:
    img_w: int
    img_h: int
    active_sh_degree: int
    white_background: bool
    phase: str                      # "initial" | "volume" | "surfel"
    use_indirect: bool = False
    dup_capacity: int = 2 ** 21
    lambda_dssim: float = 0.2
    lambda_dist: float = 0.0
    lambda_normal_render_depth: float = 0.05
    lambda_normal_smooth: float = 0.0
    lambda_depth_smooth: float = 0.0
    lambda_mask_entropy: float = 0.0
    normal_loss_start: int = 0
    dist_loss_start: int = 3000
    normal_smooth_from_iter: int = 0
    normal_smooth_until_iter: int = 18000
    depth_ratio: float = 0.0


def make_ref_optimizer(opt, spatial_lr_scale: float = 1.0):
    """Per-group Adam over RefGaussianParams (≙ RefGaussianModel
    training_setup)."""
    def adam(lr):
        if callable(lr):
            return optax.chain(optax.scale_by_adam(eps=1e-15),
                               optax.scale_by_schedule(lambda s: -lr(s)))
        if lr == 0.0:
            return optax.set_to_zero()
        return optax.adam(lr, eps=1e-15)

    xyz_sched = expon_lr_schedule(
        opt.position_lr_init * spatial_lr_scale,
        opt.position_lr_final * spatial_lr_scale,
        opt.position_lr_max_steps, lr_delay_mult=opt.position_lr_delay_mult)
    indirect_lr = getattr(opt, "indirect_lr", opt.features_lr)

    transforms = {
        "xyz": adam(xyz_sched),
        "features_dc": adam(opt.features_lr),
        "features_rest": adam(opt.features_lr / 20.0),
        "indirect_dc": adam(indirect_lr),
        "indirect_rest": adam(indirect_lr / 20.0),
        "opacity": adam(opt.opacity_lr),
        "scaling": adam(opt.scaling_lr),
        "rotation": adam(opt.rotation_lr),
        "base_color": adam(opt.base_color_lr),
        "metallic": adam(opt.metallic_lr),
        "roughness": adam(opt.roughness_lr),
        "env1": adam(opt.envmap_cubemap_lr),
        "env2": adam(opt.envmap_cubemap_lr),
    }

    def label_fn(params):
        return type(params)(**{
            f.name: f.name for f in dataclasses.fields(params)
            if f.name != "max_sh_degree"})

    return optax.multi_transform(transforms, label_fn)


def _calc_loss(render_pkg, gt_image, cam_mask, iteration, st: Stage1FullStatic):
    """≙ calculate_loss (loss_utils.py:90-157)."""
    image = render_pkg["render"]
    alpha = render_pkg["alpha"]
    l_l1 = L.l1_loss(image, gt_image)
    ssim_val = L.ssim(image, gt_image)
    loss = (1 - st.lambda_dssim) * l_l1 + st.lambda_dssim * (1 - ssim_val)
    metrics = {"loss_l1": l_l1, "psnr": L.psnr(image, gt_image)}

    if st.lambda_normal_render_depth > 0:
        l_n = L.normal_consistency_loss(render_pkg["rend_normal"],
                                        render_pkg["surf_normal"])
        loss += st.lambda_normal_render_depth * l_n * \
            (iteration > st.normal_loss_start).astype(jnp.float32)
        metrics["loss_normal"] = l_n
    if st.lambda_dist > 0:
        loss += st.lambda_dist * render_pkg["raster"].distortion.mean() * \
            (iteration > st.dist_loss_start).astype(jnp.float32)
    if st.lambda_normal_smooth > 0:
        on = ((iteration > st.normal_smooth_from_iter)
              & (iteration < st.normal_smooth_until_iter)).astype(jnp.float32)
        loss += st.lambda_normal_smooth * on * L.first_order_edge_aware_loss(
            render_pkg["rend_normal"], gt_image)
    if st.lambda_depth_smooth > 0:
        loss += st.lambda_depth_smooth * L.first_order_edge_aware_loss(
            render_pkg["surf_depth"][..., None], gt_image) * \
            (iteration > 3000).astype(jnp.float32)
    if cam_mask is not None and st.lambda_mask_entropy > 0:
        loss += st.lambda_mask_entropy * L.mask_entropy_loss(
            alpha[..., 0], cam_mask)
    metrics["loss"] = loss
    return loss, metrics


@functools.partial(jax.jit, static_argnames=("st", "optimizer"))
def stage1_full_step(state: Stage1State, cam: CameraParams, gt_image, cam_mask,
                     fg_lut, vol: tsdf_ops.TSDFVolume | None,
                     *, st: Stage1FullStatic, optimizer):
    from .densify import add_densification_stats

    bg = jnp.full((3,), 1.0 if st.white_background else 0.0, jnp.float32)
    zeros2d = jnp.zeros((state.params.n_capacity, 2))
    kw = dict(img_w=st.img_w, img_h=st.img_h,
              active_sh_degree=st.active_sh_degree,
              dup_capacity=st.dup_capacity, depth_ratio=st.depth_ratio)

    def loss_fn(params, m2d):
        if st.phase == "initial":
            pkg = rg.render_initial(params, state.aux, cam, bg,
                                    means2d_offset=m2d, **kw)
        elif st.phase == "volume":
            env2 = EnvMips.build(params.env2)
            pkg = rg.render_volume(params, state.aux, cam, bg, env2, fg_lut,
                                   vol=vol, use_indirect=st.use_indirect,
                                   means2d_offset=m2d, **kw)
        else:
            env1 = EnvMips.build(params.env1)
            pkg = rg.render_surfel(params, state.aux, cam, bg, env1, fg_lut,
                                   vol=vol, use_indirect=st.use_indirect,
                                   means2d_offset=m2d, **kw)
        loss, metrics = _calc_loss(pkg, gt_image, cam_mask, state.step, st)
        # overflow of the duplicate buffer silently drops splats from tiles
        # (≙ reference CHECK_CUDA posture, auxiliary.h:303) — surface it
        metrics["raster_overflow"] = \
            pkg["raster"].overflow.astype(jnp.float32)
        return loss, (metrics, pkg["raster"].radii)

    (loss, (metrics, radii)), (grads, g2d) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(state.params, zeros2d)
    aux = add_densification_stats(state.aux, g2d, radii)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return Stage1State(params, aux, opt_state, state.step + 1), metrics


def reconstruct_tsdf(params, aux, cams, *, img_w, img_h, active_sh_degree,
                     mesh_res: int = 128, depth_trunc: float | None = None,
                     cameras_extent: float = 3.0, dup_capacity: int = 2 ** 21):
    """Fuse surf_depth from all training views (≙ GaussianExtractor
    .reconstruction + extract_mesh_bounded, utils/mesh_utils.py:100-183)."""
    bg = jnp.zeros(3)
    depth_trunc = depth_trunc or cameras_extent * 2.0
    voxel = depth_trunc / mesh_res
    sdf_trunc = 5.0 * voxel
    import numpy as np
    xyz = np.asarray(params.xyz)[np.asarray(aux.alive)]
    bb_min = xyz.min(0) - 4 * voxel
    bb_max = xyz.max(0) + 4 * voxel
    res = mesh_res
    vol = tsdf_ops.init_volume(bb_min, np.maximum(bb_max, bb_min + res * voxel), res)

    render = jax.jit(functools.partial(
        rg.render_initial, img_w=img_w, img_h=img_h,
        active_sh_degree=active_sh_degree, dup_capacity=dup_capacity))
    for cam in cams:
        cp = cam.params()
        pkg = render(params, aux, cp, bg)
        depth = pkg["surf_depth"] * (pkg["alpha"][..., 0] > 0.5)
        vol = tsdf_ops.integrate(vol, depth, None, jnp.asarray(cam.w2c),
                                 cp.fx, cp.fy, cam.width / 2 - 0.5,
                                 cam.height / 2 - 0.5,
                                 sdf_trunc=sdf_trunc, depth_trunc=depth_trunc)
    return vol


def load_stage1_checkpoint(path: str):
    """Load a stage-1 run's checkpoint (≙ the torch `chkpnt*.pth` consumed by
    restore_from_refgs, reference train.py:52-59). `path` is a .ckpt file or
    the stage-1 model dir (latest chkpnt*.ckpt). The state template is
    rebuilt from the run's cfg.json + the checkpoint manifest."""
    import glob
    import json
    import os

    import numpy as np

    from ..config import load_config
    from ..utils.checkpoint import load_checkpoint

    if os.path.isdir(path):
        ckpts = sorted(glob.glob(os.path.join(path, "chkpnt*.ckpt")),
                       key=lambda p: int("".join(filter(str.isdigit,
                                                        os.path.basename(p)))))
        if not ckpts:
            raise FileNotFoundError(f"no chkpnt*.ckpt under {path}")
        ckpt_path, model_dir = ckpts[-1], path
    else:
        ckpt_path, model_dir = path, os.path.dirname(path)
    cfg1 = load_config(model_dir, stage1=True)

    manifest = {}
    if os.path.exists(ckpt_path + ".json"):
        with open(ckpt_path + ".json") as f:
            manifest = json.load(f)
    n_cap = int(manifest.get("n_capacity", cfg1.model.max_gaussians))
    sh_deg = int(manifest.get("sh_degree", cfg1.model.sh_degree))
    env_res = int(manifest.get("env_res", 128))

    dummy = np.eye(4, 3).astype(np.float32)   # template only; values ignored
    params_t, aux_t = rgs.init_ref_from_pcd(dummy, dummy[:, :3] * 0 + 0.5,
                                            n_cap, sh_deg, env_res=env_res)
    optimizer = make_ref_optimizer(cfg1.opt)
    template = Stage1State(params_t, aux_t, optimizer.init(params_t),
                           jnp.int32(0))
    state, iteration = load_checkpoint(ckpt_path, template)
    return state, iteration, cfg1
