"""Stage-1 (Ref-Gaussian) model state: adds indirect-radiance SH and two
trainable cubemap environment lights to the Gaussian surfel core.

≙ reference RefGaussianModel (scene/ref_gaussian_model.py:44-772): params
`_indirect_dc/_indirect_rest` (:85-86,213-216) and `env_map_1/env_map_2`
EnvLightMip cubemaps (:296-297), plus the reset/perturbation schedule ops
(:392-499).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..utils import math3d
from . import cubemap as cm
from .gaussians import GaussianAux, GaussianParams  # noqa: F401 (re-export)


@partial(jax.tree_util.register_dataclass,
         data_fields=["xyz", "base_color", "metallic", "roughness",
                      "features_dc", "features_rest", "indirect_dc",
                      "indirect_rest", "scaling", "rotation", "opacity",
                      "env1", "env2"],
         meta_fields=["max_sh_degree"])
@dataclasses.dataclass
class RefGaussianParams:
    xyz: jnp.ndarray             # [N, 3]
    base_color: jnp.ndarray      # [N, 3] raw
    metallic: jnp.ndarray        # [N, 1] raw
    roughness: jnp.ndarray       # [N, 1] raw
    features_dc: jnp.ndarray     # [N, 1, 3]
    features_rest: jnp.ndarray   # [N, K-1, 3]
    indirect_dc: jnp.ndarray     # [N, 1, 3]
    indirect_rest: jnp.ndarray   # [N, K-1, 3]
    scaling: jnp.ndarray         # [N, 2] log
    rotation: jnp.ndarray        # [N, 4]
    opacity: jnp.ndarray         # [N, 1] logit
    env1: jnp.ndarray            # [6, R, R, 3] raw cubemap (sigmoid activated)
    env2: jnp.ndarray            # [6, R, R, 3]
    max_sh_degree: int = 3

    # activations shared with GaussianParams
    n_capacity = GaussianParams.n_capacity
    get_scaling = GaussianParams.get_scaling
    get_rotation = GaussianParams.get_rotation
    get_opacity = GaussianParams.get_opacity
    get_metallic = GaussianParams.get_metallic
    get_roughness = GaussianParams.get_roughness
    get_features = GaussianParams.get_features
    world_normals = GaussianParams.world_normals

    def get_base_color(self):
        # stage 1 uses a PLAIN sigmoid (ref_gaussian_model.py:65-66), unlike
        # stage 2's σ·0.77+0.03 (gaussian_model.py:68)
        return jax.nn.sigmoid(self.base_color)

    def get_indirect(self):
        return jnp.concatenate([self.indirect_dc, self.indirect_rest], axis=1)


def init_ref_from_pcd(points, colors, n_capacity: int, max_sh_degree: int = 3,
                      env_res: int = 128, init_metallic: float = 0.01,
                      init_roughness: float = 0.1):
    """≙ RefGaussianModel.create_from_pcd + EnvLightMip init (zero cubemap
    -> sigmoid 0.5)."""
    from .gaussians import create_from_pcd
    base, aux = create_from_pcd(points, colors, n_capacity, max_sh_degree,
                                env_resolution=8,
                                init_metallic=init_metallic,
                                init_roughness=init_roughness)
    k = (max_sh_degree + 1) ** 2
    params = RefGaussianParams(
        xyz=base.xyz, base_color=base.base_color, metallic=base.metallic,
        roughness=base.roughness, features_dc=base.features_dc,
        features_rest=base.features_rest,
        indirect_dc=jnp.zeros((n_capacity, 1, 3)),
        indirect_rest=jnp.zeros((n_capacity, k - 1, 3)),
        scaling=base.scaling, rotation=base.rotation, opacity=base.opacity,
        env1=jnp.zeros((6, env_res, env_res, 3)),
        env2=jnp.zeros((6, env_res, env_res, 3)),
        max_sh_degree=max_sh_degree,
    )
    return params, aux


class EnvMips:
    """Prefiltered state of one trainable cubemap (≙ EnvLightMip after
    build_mips, light.py:64-123). Rebuilt every iteration inside jit —
    differentiable through to the raw cubemap."""

    def __init__(self, specular: list, diffuse):
        self.specular = specular
        self.diffuse = diffuse

    @staticmethod
    def build(env_raw, min_res: int = 16):
        spec, diff = cm.build_specular_mips(env_raw, min_res=min_res)
        return EnvMips(spec, diff)

    def query(self, dirs, mode: str = "pure_env", roughness=None):
        """sigmoid-activated query (light.py:91-123)."""
        if mode == "diffuse":
            light = cm.sample_cubemap(self.diffuse, dirs)
        elif mode == "pure_env":
            light = cm.sample_cubemap(self.specular[0], dirs)
        else:
            mip = cm.roughness_to_mip(roughness[..., 0], len(self.specular))
            light = cm.sample_cubemap_mip(self.specular, dirs, mip)
        return jax.nn.sigmoid(light)


# ---------------------------------------------------------------------------
# stage-1 schedule ops (≙ ref_gaussian_model.py:392-499)
# ---------------------------------------------------------------------------

def _replace(params, **kw):
    return dataclasses.replace(params, **kw)


def reset_opacity0(params, alive, max_opacity: float = 0.01):
    """≙ reset_opacity_mask0: clamp all opacities to <= max."""
    new = jnp.minimum(jax.nn.sigmoid(params.opacity), max_opacity)
    return _replace(params, opacity=math3d.inverse_sigmoid(
        jnp.clip(new, 1e-6, 1 - 1e-6)))


def reset_opacity1(params, reset_v: float = 0.9):
    """≙ reset_opacity_mask1 (ref_gaussian_model.py:397-407): set opacity to
    reset_v except for points already above it (which keep their value)."""
    cur = jax.nn.sigmoid(params.opacity)
    keep = cur > reset_v
    new_raw = jnp.where(keep, params.opacity,
                        jnp.full_like(params.opacity,
                                      float(math3d.inverse_sigmoid(jnp.float32(reset_v)))))
    return _replace(params, opacity=new_raw)


def reset_metallic(params, init_value: float = 0.01):
    """≙ reset_metallic_mask (ref_gaussian_model.py:409-415): raise metallic
    to at least init_value."""
    new = jnp.maximum(jax.nn.sigmoid(params.metallic), init_value)
    return _replace(params, metallic=math3d.inverse_sigmoid(
        jnp.clip(new, 1e-6, 1 - 1e-6)))


def dist_color(params, key, metallic_thr: float = 0.02, dist_range: float = 0.4):
    """≙ dist_color (ref_gaussian_model.py:417-428): jitter the DC color of
    non-metallic gaussians by U(-range, range)."""
    m = jax.nn.sigmoid(params.metallic)[:, 0] > metallic_thr
    noise = jax.random.uniform(key, params.features_dc.shape,
                               minval=-dist_range, maxval=dist_range)
    new = jnp.where(m[:, None, None], params.features_dc,
                    params.features_dc + noise)
    return _replace(params, features_dc=new)


def enlarge_metallic_scales(params, metallic_thr: float, factor: float = 1.5,
                            rough_thr: float = 0.1):
    """≙ enlarge_metallic_scales (ref_gaussian_model.py:431-450): grow the
    scales of gaussians that are metallic (>= metallic_thr) AND smooth
    (roughness <= rough_thr); everything else keeps its raw scaling."""
    keep = ((jax.nn.sigmoid(params.metallic)[:, 0] < metallic_thr)
            | (jax.nn.sigmoid(params.roughness)[:, 0] > rough_thr))
    return _replace(params, scaling=jnp.where(
        keep[:, None], params.scaling, params.scaling + jnp.log(factor)))


def reset_scale(params, metallic_thr: float, factor: float = 1.5,
                rough_thr: float = 0.1):
    """≙ reset_scale (ref_gaussian_model.py:452-457): the enlarge op routed
    through optimizer replacement — pair with zero_adam_moments("scaling")."""
    return enlarge_metallic_scales(params, metallic_thr, factor, rough_thr)


def reset_base_color(params, key, reset_value: float = 0.5,
                     noise_level: float = 0.05):
    """≙ reset_base_color (ref_gaussian_model.py:478-487): base color to
    reset_value + U(-noise/2, noise/2), through the stage-1 sigmoid."""
    noise = (jax.random.uniform(key, params.base_color.shape) - 0.5) * noise_level
    new = jnp.clip(reset_value + noise, 0.0, 1.0)
    return _replace(params, base_color=math3d.inverse_sigmoid(
        jnp.clip(new, 1e-6, 1 - 1e-6)))


def reset_metallic_full(params, reset_value: float = 0.01):
    """≙ reset_metallic (ref_gaussian_model.py:489-493): hard reset of every
    metallic value (the masked variant is reset_metallic above)."""
    v = float(math3d.inverse_sigmoid(jnp.float32(
        jnp.clip(reset_value, 1e-6, 1 - 1e-6))))
    return _replace(params, metallic=jnp.full_like(params.metallic, v))


def reset_roughness(params, reset_value: float = 0.1):
    """≙ reset_roughness (ref_gaussian_model.py:495-499)."""
    v = float(math3d.inverse_sigmoid(jnp.float32(
        jnp.clip(reset_value, 1e-6, 1 - 1e-6))))
    return _replace(params, roughness=jnp.full_like(params.roughness, v))


def zero_adam_moments(opt_state, names, n_capacity: int):
    """Optimizer surgery for the reset ops: zero the Adam first/second
    moments of the named param groups, keeping the step count — exactly what
    replace_tensor_to_optimizer does (ref_gaussian_model.py:580-594: exp_avg
    and exp_avg_sq zeroed, 'step' preserved)."""
    def z(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n_capacity:
            return jnp.zeros_like(x)
        return x

    if hasattr(opt_state, "inner_states"):
        states = dict(opt_state.inner_states)
        for name in names:
            if name in states:
                states[name] = jax.tree.map(z, states[name])
        return opt_state._replace(inner_states=states)
    return jax.tree.map(z, opt_state)


def reset_features_rest(params):
    """≙ reset_features: zero the non-DC SH."""
    return _replace(params, features_rest=jnp.zeros_like(params.features_rest),
                    indirect_rest=jnp.zeros_like(params.indirect_rest))
