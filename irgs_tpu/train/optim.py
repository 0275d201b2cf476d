"""Optimizer construction: per-parameter-group Adam via optax.

≙ GaussianModel.training_setup (scene/gaussian_model.py:375-400): one Adam
(eps 1e-15) with per-group learning rates and an exponential position-lr
schedule (get_expon_lr_func, utils/general_utils.py). Densification never
rebuilds this state — pruned/cloned rows are rewritten in place because
capacity is static.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import optax


def expon_lr_schedule(lr_init: float, lr_final: float, max_steps: int,
                      lr_delay_steps: int = 0, lr_delay_mult: float = 1.0):
    """≙ get_expon_lr_func: log-linear interp with optional delayed warmup."""
    def schedule(step):
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
        else:
            delay = 1.0
        return delay * log_lerp
    return schedule


def make_gaussian_optimizer(opt, spatial_lr_scale: float = 1.0,
                            stage2: bool = True):
    """Build the multi-group optimizer over a GaussianParams pytree.

    Learning-rate scaling semantics follow stage-2 train.py:41-45: with
    lr_scale == 0 the geometry groups (xyz/opacity/scaling/rotation) are
    frozen.
    """
    lr_scale = getattr(opt, "lr_scale", 1.0) if stage2 else 1.0

    def adam(lr):
        if callable(lr):
            return optax.chain(
                optax.scale_by_adam(eps=1e-15),
                optax.scale_by_schedule(lambda s: -lr(s)),
            )
        if lr == 0.0:
            return optax.set_to_zero()
        return optax.adam(lr, eps=1e-15)

    xyz_sched = expon_lr_schedule(
        opt.position_lr_init * spatial_lr_scale * lr_scale,
        opt.position_lr_final * spatial_lr_scale * max(lr_scale, 1e-12),
        opt.position_lr_max_steps,
        lr_delay_mult=opt.position_lr_delay_mult)

    transforms = {
        "xyz": adam(xyz_sched) if lr_scale > 0 else optax.set_to_zero(),
        "features_dc": adam(opt.features_lr),
        "features_rest": adam(opt.features_lr / 20.0),
        "opacity": adam(opt.opacity_lr * lr_scale),
        "scaling": adam(opt.scaling_lr * lr_scale),
        "rotation": adam(opt.rotation_lr * lr_scale),
        "base_color": adam(opt.base_color_lr),
        "metallic": adam(opt.metallic_lr),
        "roughness": adam(opt.roughness_lr),
        "env": adam(opt.envmap_cubemap_lr),
    }

    def label_fn(params):
        import dataclasses
        return type(params)(
            **{f.name: f.name for f in dataclasses.fields(params)
               if f.name != "max_sh_degree"},
        )

    return optax.multi_transform(transforms, label_fn)
