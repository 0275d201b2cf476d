"""Multi-chip parallelism via jax.sharding + shard_map.

The reference is strictly single-GPU (SURVEY §2.3: no torch.distributed /
NCCL anywhere); multi-chip is new design headroom, architected TPU-first:

* **Training**: data-parallel over cameras. Gaussian/env params are
  replicated; each device runs the full stage-2 forward/backward for its own
  camera (rasterize → pixel subset → MC shade → losses) and gradients are
  combined with one `psum` over the ICI mesh. The tracer grid is replicated
  (it is derived state, rebuilt per iteration).
* **Eval**: the Monte-Carlo sample axis shards across devices — each chip
  traces 1/D of the incident-direction samples for every pixel and the
  radiance estimates average with a `pmean` (see eval_mc_sharded).

Collectives ride the ICI mesh; no host transfers inside the step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

import optax

from ..train import stage2 as s2


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np
    return Mesh(np.array(devs), (axis,))


def stage2_dp_step(mesh: Mesh, st: s2.Stage2Static, optimizer):
    """Build a jitted data-parallel stage-2 step.

    Inputs: state (replicated), grid (replicated), batched CameraParams with
    leading axis = n_devices, gt_images [D, H, W, 3], keys [D, 2].
    """
    axis = mesh.axis_names[0]

    def device_step(state: s2.TrainState, grid, cams, gt_images, keys):
        # leading device axis is size-1 per shard
        cam = jax.tree.map(lambda x: x[0], cams)
        gt = gt_images[0]
        key = keys[0]

        def loss_fn(params):
            return s2.stage2_forward_loss(params, state.aux, grid, cam, gt,
                                          None, key, state.step, st)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, axis)
        metrics = jax.lax.pmean(metrics, axis)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return s2.TrainState(params, state.aux, opt_state, state.step + 1), metrics

    rep = P()
    shd = P(axis)
    sharded = shard_map(
        device_step, mesh=mesh,
        in_specs=(rep, rep, shd, shd, shd),
        out_specs=(rep, rep),
        check_vma=False,
    )
    return jax.jit(sharded)


def eval_mc_sharded(mesh: Mesh, shade_fn):
    """Wrap a per-pixel MC shading fn so its sample axis shards over devices.

    shade_fn(pixel_inputs, key) -> dict of per-pixel estimates averaged over
    the local sample subset; outputs are pmean'd across the mesh, which is
    exactly the full-sample-count estimator.
    """
    axis = mesh.axis_names[0]

    def device_fn(pixels, keys):
        out = shade_fn(pixels, keys[0])
        return jax.tree.map(lambda x: jax.lax.pmean(x, axis), out)

    return jax.jit(shard_map(device_fn, mesh=mesh,
                             in_specs=(P(), P(axis)), out_specs=P(),
                             check_vma=False))
