"""GaussianScene — the Gaussian-surfel model state as a static-capacity pytree.

Re-designs the reference's mutable `GaussianModel` (scene/gaussian_model.py:50)
for XLA: every array has a fixed capacity `N_max` with an `alive` mask, so
densify/clone/split/prune are pure gather/scatter functions that never change
shapes (no recompiles, no optimizer-state "surgery" — optax state is a pytree
gathered with the same permutation).

Raw (pre-activation) parameters, matching the reference activations
(gaussian_model.py:60-77):
  scaling:    log-scale, 2D (surfels)         -> exp
  opacity:    logit                           -> sigmoid
  base_color: logit-ish                       -> sigmoid * 0.77 + 0.03
  metallic/roughness: logit                   -> sigmoid
  rotation:   unnormalized quaternion (wxyz)  -> normalize
  env:        lat-long grid, log-space        -> exp (configurable)
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import math3d, sh as sh_utils
from ..utils.ply import read_ply, structured_from_dict, write_ply
from . import envlight


@partial(jax.tree_util.register_dataclass,
         data_fields=["xyz", "base_color", "metallic", "roughness",
                      "features_dc", "features_rest", "scaling", "rotation",
                      "opacity", "env"],
         meta_fields=["max_sh_degree"])
@dataclasses.dataclass
class GaussianParams:
    """Differentiable parameters (the optax-optimized pytree)."""
    xyz: jnp.ndarray            # [N, 3]
    base_color: jnp.ndarray     # [N, 3] raw
    metallic: jnp.ndarray       # [N, 1] raw
    roughness: jnp.ndarray      # [N, 1] raw
    features_dc: jnp.ndarray    # [N, 1, 3] SH dc
    features_rest: jnp.ndarray  # [N, K-1, 3]
    scaling: jnp.ndarray        # [N, 2] log
    rotation: jnp.ndarray       # [N, 4] unnormalized quats
    opacity: jnp.ndarray        # [N, 1] logit
    env: jnp.ndarray            # [He, We, 3] raw lat-long envmap
    max_sh_degree: int = 3

    # ---- activations -----------------------------------------------------
    @property
    def n_capacity(self) -> int:
        return self.xyz.shape[0]

    def get_scaling(self):
        return jnp.exp(self.scaling)

    def get_rotation(self):
        return math3d.quat_normalize(self.rotation)

    def get_opacity(self):
        return jax.nn.sigmoid(self.opacity)

    def get_base_color(self):
        return jax.nn.sigmoid(self.base_color) * 0.77 + 0.03

    def get_metallic(self):
        return jax.nn.sigmoid(self.metallic)

    def get_roughness(self):
        return jax.nn.sigmoid(self.roughness)

    def get_features(self):
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def world_normals(self, cam_pos=None):
        """Per-Gaussian world normal = 3rd rotation column; optionally flipped
        toward the camera (≙ GaussianModel.trace normal setup,
        scene/gaussian_model.py:743-747)."""
        R = math3d.quat_to_rotmat(self.rotation)
        n = R[:, :, 2]
        if cam_pos is not None:
            n, _ = math3d.flip_align_view(n, self.xyz - cam_pos)
        return math3d.safe_normalize(n)


@partial(jax.tree_util.register_dataclass,
         data_fields=["alive", "max_radii2d", "xyz_gradient_accum", "denom",
                      "active_sh_degree"],
         meta_fields=[])
@dataclasses.dataclass
class GaussianAux:
    """Non-optimized bookkeeping (alive mask + densification stats)."""
    alive: jnp.ndarray              # [N] bool
    max_radii2d: jnp.ndarray        # [N] float
    xyz_gradient_accum: jnp.ndarray  # [N]
    denom: jnp.ndarray              # [N]
    active_sh_degree: jnp.ndarray   # scalar int32

    @property
    def n_alive(self):
        return jnp.sum(self.alive.astype(jnp.int32))


def inverse_base_color_activation(x):
    return math3d.inverse_sigmoid((x - 0.03) / 0.77)


def create_from_pcd(points: np.ndarray, colors: np.ndarray, n_capacity: int,
                    max_sh_degree: int = 3, env_resolution: int = 128,
                    env_init_value: float = 1.5,
                    init_base_color: float = 0.5, init_metallic: float = 0.5,
                    init_roughness: float = 0.5,
                    knn_dist2: np.ndarray | None = None,
                    env_activation: str = "exp"):
    """Initialize from a point cloud (≙ GaussianModel.create_from_pcd,
    scene/gaussian_model.py:339-373), padded to static capacity."""
    from ..ops.knn import mean_knn_dist2

    n = points.shape[0]
    assert n <= n_capacity, f"{n} points > capacity {n_capacity}"
    k = (max_sh_degree + 1) ** 2

    if knn_dist2 is None:
        if n > 50_000:
            # large clouds: Morton-window native path (≙ simple-knn's
            # approach); exact chunked-MXU path otherwise
            from ..utils.native import mean_knn_dist2_native
            knn_dist2 = mean_knn_dist2_native(np.asarray(points, np.float32))
        if knn_dist2 is None:
            knn_dist2 = mean_knn_dist2(jnp.asarray(points, jnp.float32))
    dist2 = np.maximum(np.asarray(knn_dist2), 1e-7)
    scales = np.repeat(np.log(np.sqrt(dist2))[:, None], 2, axis=1)

    def pad(x, fill=0.0):
        out = np.full((n_capacity,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    rng = np.random.RandomState(0)
    fdc = sh_utils.rgb2sh(np.asarray(colors, np.float32)).reshape(n, 1, 3)

    params = GaussianParams(
        xyz=pad(np.asarray(points, np.float32)),
        base_color=pad(np.full((n, 3), float(inverse_base_color_activation(jnp.float32(init_base_color))))),
        metallic=pad(np.full((n, 1), float(math3d.inverse_sigmoid(jnp.float32(init_metallic))))),
        roughness=pad(np.full((n, 1), float(math3d.inverse_sigmoid(jnp.float32(init_roughness))))),
        features_dc=pad(fdc),
        features_rest=pad(np.zeros((n, k - 1, 3), np.float32)),
        scaling=pad(scales, fill=-10.0),
        rotation=pad(rng.rand(n, 4).astype(np.float32), fill=1.0),
        opacity=pad(np.full((n, 1), float(math3d.inverse_sigmoid(jnp.float32(0.1)))), fill=-12.0),
        # activation-aware env init: exp/sigmoid/none get the constant raw
        # grid whose activation equals env_init_value (≙ EnvLight.__init__,
        # light.py:141-149); softplus gets DirectLightMap's uniform-random
        # raw grid (light.py:384-386) — the trainable direct-light variant
        env=(envlight.init_direct_light(
                 jax.random.PRNGKey(0), max_res=env_resolution // 2)
             if env_activation == "softplus"
             else envlight.init_env(env_resolution, env_init_value,
                                    env_activation)),
        max_sh_degree=max_sh_degree,
    )
    aux = GaussianAux(
        alive=jnp.arange(n_capacity) < n,
        max_radii2d=jnp.zeros(n_capacity),
        xyz_gradient_accum=jnp.zeros(n_capacity),
        denom=jnp.zeros(n_capacity),
        active_sh_degree=jnp.int32(0),
    )
    return params, aux


def empty_params(n_capacity: int, max_sh_degree: int = 3,
                 env_shape=(64, 128, 3)):
    """Zero-filled (params, aux) of the given static shapes — a structure
    TEMPLATE for checkpoint deserialization (values are overwritten)."""
    k = (max_sh_degree + 1) ** 2
    z = lambda *s: jnp.zeros((n_capacity,) + s, jnp.float32)
    params = GaussianParams(
        xyz=z(3), base_color=z(3), metallic=z(1), roughness=z(1),
        features_dc=z(1, 3), features_rest=z(k - 1, 3), scaling=z(2),
        rotation=jnp.concatenate(
            [jnp.ones((n_capacity, 1)), jnp.zeros((n_capacity, 3))], axis=1),
        opacity=z(1), env=jnp.zeros(tuple(env_shape), jnp.float32),
        max_sh_degree=max_sh_degree)
    aux = GaussianAux(
        alive=jnp.zeros(n_capacity, bool),
        max_radii2d=jnp.zeros(n_capacity),
        xyz_gradient_accum=jnp.zeros(n_capacity),
        denom=jnp.zeros(n_capacity),
        active_sh_degree=jnp.int32(0))
    return params, aux


# ---------------------------------------------------------------------------
# PLY artifact I/O — same attribute layout as the reference
# (construct_list_of_attributes, scene/gaussian_model.py:409-424)
# ---------------------------------------------------------------------------

def save_ply(path: str, params: GaussianParams, aux: GaussianAux,
             env_activation: str = "exp") -> None:
    alive = np.asarray(aux.alive)
    sel = lambda x: np.asarray(x)[alive]
    fields = {}
    xyz = sel(params.xyz)
    for i, c in enumerate("xyz"):
        fields[c] = xyz[:, i]
    fdc = sel(params.features_dc).transpose(0, 2, 1).reshape(len(xyz), -1)
    for i in range(fdc.shape[1]):
        fields[f"f_dc_{i}"] = fdc[:, i]
    frest = sel(params.features_rest).transpose(0, 2, 1).reshape(len(xyz), -1)
    for i in range(frest.shape[1]):
        fields[f"f_rest_{i}"] = frest[:, i]
    fields["opacity"] = sel(params.opacity)[:, 0]
    fields["metallic"] = sel(params.metallic)[:, 0]
    fields["roughness"] = sel(params.roughness)[:, 0]
    bc = sel(params.base_color)
    for i in range(3):
        fields[f"base_color_{i}"] = bc[:, i]
    sc = sel(params.scaling)
    for i in range(sc.shape[1]):
        fields[f"scale_{i}"] = sc[:, i]
    rt = sel(params.rotation)
    for i in range(4):
        fields[f"rot_{i}"] = rt[:, i]
    write_ply(path, structured_from_dict(fields), comments=("irgs_tpu gaussian surfels",))
    # envmap sidecars (≙ save_ply's `<stem>1.map` + `<stem>1.exr`,
    # gaussian_model.py:449-468): the .map carries the RAW trainable grid in
    # the reference's torch format ({"state_dict": {"base": ...},
    # "activation": name}) so reference-layout dirs interoperate both ways;
    # the .exr is an HDR image of the activated map; the .npy stays as the
    # fast exact-roundtrip local format.
    env_raw = np.asarray(params.env)
    np.save(path.replace(".ply", "_env.npy"), env_raw)
    from ..utils.exr import write_exr
    write_exr(path.replace(".ply", "1.exr"),
              np.asarray(envlight.activate(jnp.asarray(env_raw),
                                           env_activation), np.float32))
    try:
        import torch
        torch.save({"state_dict": {"base": torch.from_numpy(env_raw.copy())},
                    "activation": env_activation},
                   path.replace(".ply", "1.map"))
    except ImportError:
        pass


def load_ply(path: str, n_capacity: int, max_sh_degree: int = 3,
             env_activation: str = "exp"):
    el = read_ply(path)["vertex"].data
    n = len(el)
    assert n <= n_capacity, f"{n} points > capacity {n_capacity}"
    k = (max_sh_degree + 1) ** 2

    def col(*names):
        return np.stack([np.asarray(el[nm], np.float32) for nm in names], axis=1)

    xyz = col("x", "y", "z")
    fdc = col("f_dc_0", "f_dc_1", "f_dc_2").reshape(n, 3, 1)
    rest_names = sorted((nm for nm in el.dtype.names if nm.startswith("f_rest_")),
                        key=lambda s: int(s.split("_")[-1]))
    frest = col(*rest_names).reshape(n, 3, k - 1) if rest_names else np.zeros((n, 3, 0), np.float32)
    base_color = col("base_color_0", "base_color_1", "base_color_2")
    scaling = col("scale_0", "scale_1")
    rot = col("rot_0", "rot_1", "rot_2", "rot_3")

    def pad(x, fill=0.0):
        out = np.full((n_capacity,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    import os
    env_path = path.replace(".ply", "_env.npy")
    map_path = path.replace(".ply", "1.map")
    exr_path = path.replace(".ply", "1.exr")
    if os.path.exists(env_path):
        env = jnp.asarray(np.load(env_path))
    elif os.path.exists(map_path):
        # reference torch sidecar (gaussian_model.py:468,513-519)
        import torch
        blob = torch.load(map_path, map_location="cpu", weights_only=False)
        base = blob["state_dict"]["base"]
        env = jnp.asarray(np.asarray(base.detach().numpy(), np.float32))
        if blob.get("activation", "exp") != env_activation:
            raise ValueError(
                f"envmap sidecar {map_path} was saved with activation "
                f"{blob.get('activation')!r} but the model is configured "
                f"for {env_activation!r}; the raw grid would be "
                f"misinterpreted")
    elif os.path.exists(exr_path):
        # HDR image of the ACTIVATED map: invert the configured activation
        # so the recovered raw grid round-trips (ADVICE r4)
        from ..utils.exr import read_exr_rgb
        act = jnp.maximum(jnp.asarray(read_exr_rgb(exr_path)), 1e-8)
        if env_activation == "exp":
            env = jnp.log(act)
        elif env_activation == "softplus":
            # inverse softplus: log(expm1(y)); stable for large y via
            # y + log1p(-exp(-y))
            env = jnp.where(act > 20.0, act,
                            jnp.log(jnp.expm1(jnp.minimum(act, 20.0))))
        else:
            raise ValueError(
                f"cannot invert envmap activation {env_activation!r} from "
                f"the .exr sidecar {exr_path}; save the raw grid instead")
    else:
        env = jnp.zeros((64, 128, 3), jnp.float32)

    params = GaussianParams(
        xyz=pad(xyz),
        base_color=pad(base_color),
        metallic=pad(col("metallic")),
        roughness=pad(col("roughness")),
        features_dc=pad(fdc.transpose(0, 2, 1)),
        features_rest=pad(frest.transpose(0, 2, 1)),
        scaling=pad(scaling, fill=-10.0),
        rotation=pad(rot, fill=1.0),
        opacity=pad(col("opacity"), fill=-12.0),
        env=env,
        max_sh_degree=max_sh_degree,
    )
    aux = GaussianAux(
        alive=jnp.arange(n_capacity) < n,
        max_radii2d=jnp.zeros(n_capacity),
        xyz_gradient_accum=jnp.zeros(n_capacity),
        denom=jnp.zeros(n_capacity),
        active_sh_degree=jnp.int32(max_sh_degree),
    )
    return params, aux


def from_refgs(ref_params, ref_aux, *, env_resolution: int = 128,
               env_init_value: float = 1.5, env_activation: str = "exp",
               init_base_color: float = 0.5, init_metallic: float = 0.5,
               init_roughness: float = 0.5):
    """Stage-1 -> stage-2 adapter (≙ GaussianModel.restore_from_refgs,
    scene/gaussian_model.py:211-270): keep the Ref-Gaussian geometry and SH
    appearance, re-initialize materials to their stage-2 starting values and
    replace the stage-1 cubemaps with a fresh trainable lat-long envmap."""
    from ..scene import envlight

    n = ref_params.n_capacity
    params = GaussianParams(
        xyz=ref_params.xyz,
        base_color=jnp.full(
            (n, 3), float(inverse_base_color_activation(
                jnp.float32(init_base_color)))),
        metallic=jnp.full(
            (n, 1), float(math3d.inverse_sigmoid(jnp.float32(init_metallic)))),
        roughness=jnp.full(
            (n, 1), float(math3d.inverse_sigmoid(jnp.float32(init_roughness)))),
        features_dc=ref_params.features_dc,
        features_rest=ref_params.features_rest,
        scaling=ref_params.scaling,
        rotation=ref_params.rotation,
        opacity=ref_params.opacity,
        env=envlight.init_env(env_resolution, env_init_value, env_activation),
        max_sh_degree=ref_params.max_sh_degree,
    )
    aux = GaussianAux(
        alive=ref_aux.alive,
        max_radii2d=jnp.zeros(n),
        xyz_gradient_accum=jnp.zeros(n),
        denom=jnp.zeros(n),
        active_sh_degree=ref_aux.active_sh_degree,
    )
    return params, aux
