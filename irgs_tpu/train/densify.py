"""Densification & pruning at static capacity.

≙ GaussianModel.densify_and_prune / densify_and_clone / densify_and_split /
prune_points (scene/gaussian_model.py:531-710). The reference reallocates
parameter tensors and performs Adam-state "surgery"; here capacity is fixed,
so the same logic becomes pure gathers/scatters over the [N_max] axis:

* clone/split write new Gaussians into *dead* slots (rank-matched via sort),
* prune just clears the alive mask,
* optimizer moments for newly written rows are zeroed in-place.

No shapes change ⇒ no recompiles, and the optimizer state stays a plain
pytree.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

import dataclasses

from ..scene.gaussians import GaussianAux, GaussianParams
from ..utils.math3d import quat_to_rotmat


def _per_point_fields(params):
    """Data fields with a leading per-Gaussian axis (works for both
    GaussianParams and RefGaussianParams)."""
    n = params.n_capacity
    names = []
    for f in dataclasses.fields(params):
        if f.name == "max_sh_degree":
            continue
        v = getattr(params, f.name)
        if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == n \
                and f.name not in ("env",):
            names.append(f.name)
    return tuple(names)


def _copy_rows(params, src_idx, dst_idx, ok):
    """params[dst] = params[src] where ok (per selected row)."""
    def cp(x):
        rows = x[src_idx]
        mask = ok.reshape((-1,) + (1,) * (rows.ndim - 1))
        return x.at[dst_idx].set(jnp.where(mask, rows, x[dst_idx]))
    return dataclasses.replace(
        params, **{k: cp(getattr(params, k)) for k in _per_point_fields(params)})


def _alloc_dead_slots(alive, selected, max_new: int):
    """Match the first `max_new` selected rows to dead slots.

    Returns (src [max_new], dst [max_new], ok [max_new]).
    """
    n = alive.shape[0]
    # dead slots first (stable)
    dead_order = jnp.argsort(alive.astype(jnp.int32), stable=True)
    num_dead = jnp.sum(~alive)
    sel_order = jnp.argsort(~selected, stable=True)       # selected first
    num_sel = jnp.sum(selected)
    k = jnp.arange(max_new)
    src = sel_order[jnp.minimum(k, n - 1)]
    dst = dead_order[jnp.minimum(k, n - 1)]
    ok = (k < jnp.minimum(num_sel, num_dead))
    return src, dst, ok


def zero_opt_rows(opt_state, dst_idx, ok, n_capacity: int):
    """Zero optimizer-moment rows for freshly written Gaussians
    (≙ cat_tensors_to_optimizer zero-init, gaussian_model.py:594-607)."""
    def z(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n_capacity:
            mask = ok.reshape((-1,) + (1,) * (x.ndim - 1))
            return x.at[dst_idx].set(jnp.where(mask, jnp.zeros_like(x[dst_idx]),
                                               x[dst_idx]))
        return x
    return jax.tree.map(z, opt_state)


@functools.partial(jax.jit, static_argnames=("max_new", "percent_dense",
                                             "n_split", "max_screen_size"))
def densify_and_prune(params: GaussianParams, aux: GaussianAux, opt_state, key,
                      *, grad_threshold: float, min_opacity: float,
                      extent: float, max_screen_size: int,
                      percent_dense: float = 0.01, max_new: int = 4096,
                      n_split: int = 2):
    """One densification round. Returns (params, aux, opt_state, stats)."""
    n = params.n_capacity
    grads = jnp.nan_to_num(aux.xyz_gradient_accum / jnp.maximum(aux.denom, 1e-12))
    scaling = params.get_scaling()
    max_scale = jnp.max(scaling, axis=-1)
    high_grad = (grads >= grad_threshold) & aux.alive

    # --- clone (small gaussians): copy in place (gaussian_model.py:671-690)
    clone_sel = high_grad & (max_scale <= percent_dense * extent)
    src, dst, ok = _alloc_dead_slots(aux.alive, clone_sel, max_new)
    n_cloned = jnp.sum(ok)            # clones actually written this round
    params = _copy_rows(params, src, dst, ok)
    opt_state = zero_opt_rows(opt_state, dst, ok, n)
    alive = aux.alive.at[dst].set(jnp.where(ok, True, aux.alive[dst]))

    # --- split (large gaussians): n_split children, parent pruned
    # (gaussian_model.py:640-669)
    split_sel = high_grad & (max_scale > percent_dense * extent)
    new_alive = alive
    for rep in range(n_split):
        src, dst, ok = _alloc_dead_slots(new_alive, split_sel, max_new)
        params = _copy_rows(params, src, dst, ok)
        opt_state = zero_opt_rows(opt_state, dst, ok, n)
        # perturb position by N(0, scale) in the splat frame; shrink scale
        key, k1 = jax.random.split(key)
        stds = scaling[src]                               # [max_new, 2]
        samples = jax.random.normal(k1, (max_new, 3)) * jnp.concatenate(
            [stds, jnp.zeros((max_new, 1))], axis=-1)
        rot = quat_to_rotmat(params.rotation[src])
        offset = jnp.einsum("nij,nj->ni", rot, samples)
        new_xyz = params.xyz[src] + offset
        new_scaling = jnp.log(jnp.maximum(stds / (0.8 * n_split), 1e-12))
        okm = ok[:, None]
        params = dataclasses.replace(
            params,
            xyz=params.xyz.at[dst].set(jnp.where(okm, new_xyz, params.xyz[dst])),
            scaling=params.scaling.at[dst].set(
                jnp.where(okm, new_scaling, params.scaling[dst])))
        new_alive = new_alive.at[dst].set(jnp.where(ok, True, new_alive[dst]))
    # parents of splits die
    new_alive = jnp.where(split_sel, False, new_alive)

    # --- prune (gaussian_model.py:692-704)
    prune = params.get_opacity()[:, 0] < min_opacity
    if max_screen_size > 0:
        prune = prune | (aux.max_radii2d > max_screen_size) \
                | (max_scale > 0.1 * extent)
    new_alive = new_alive & ~prune

    aux = GaussianAux(
        alive=new_alive,
        max_radii2d=jnp.zeros(n),
        xyz_gradient_accum=jnp.zeros(n),
        denom=jnp.zeros(n),
        active_sh_degree=aux.active_sh_degree,
    )
    stats = {"n_alive": jnp.sum(new_alive),
             "n_cloned": n_cloned,
             "n_split": jnp.sum(split_sel)}
    return params, aux, opt_state, stats


def add_densification_stats(aux: GaussianAux, means2d_grad, radii):
    """≙ add_densification_stats + max_radii2D update (gaussian_model.py:708,
    train_refgaussian.py:197-199)."""
    vis = radii > 0
    gnorm = jnp.linalg.norm(means2d_grad, axis=-1)
    return GaussianAux(
        alive=aux.alive,
        max_radii2d=jnp.where(vis, jnp.maximum(aux.max_radii2d, radii), aux.max_radii2d),
        xyz_gradient_accum=aux.xyz_gradient_accum + jnp.where(vis, gnorm, 0.0),
        denom=aux.denom + vis.astype(aux.denom.dtype),
        active_sh_degree=aux.active_sh_degree,
    )


def reset_opacity(params: GaussianParams, opt_state, n_capacity: int,
                  max_opacity: float = 0.01):
    """≙ reset_opacity (clip opacities to ≤ max, zero the Adam moments)."""
    from ..utils.math3d import inverse_sigmoid
    new_op = jnp.minimum(params.get_opacity(), max_opacity)
    params = dataclasses.replace(
        params, opacity=inverse_sigmoid(jnp.clip(new_op, 1e-6, 1 - 1e-6)))

    def z(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n_capacity:
            return jnp.zeros_like(x)
        return x
    # zero only the opacity group's moments
    import optax
    if hasattr(opt_state, "inner_states") and "opacity" in getattr(opt_state, "inner_states", {}):
        states = dict(opt_state.inner_states)
        states["opacity"] = jax.tree.map(z, states["opacity"])
        opt_state = opt_state._replace(inner_states=states)
    else:
        opt_state = jax.tree.map(z, opt_state)
    return params, opt_state
