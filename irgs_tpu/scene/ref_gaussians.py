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
    get_base_color = GaussianParams.get_base_color
    get_metallic = GaussianParams.get_metallic
    get_roughness = GaussianParams.get_roughness
    get_features = GaussianParams.get_features
    world_normals = GaussianParams.world_normals

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


def enlarge_metallic_scales(params, metallic_thr: float, factor: float = 1.5):
    """≙ enlarge_metallic_scales: grow scales of metallic gaussians."""
    m = jax.nn.sigmoid(params.metallic)[:, 0] >= metallic_thr
    return _replace(params, scaling=jnp.where(
        m[:, None], params.scaling + jnp.log(factor), params.scaling))


def reset_features_rest(params):
    """≙ reset_features: zero the non-DC SH."""
    return _replace(params, features_rest=jnp.zeros_like(params.features_rest),
                    indirect_rest=jnp.zeros_like(params.indirect_rest))
