"""Flattened training-ray bank for ray-batch sampling.

≙ reference Scene.train_rays + get_batch_rays (scene/__init__.py:96-110,
133-136): every training pixel across every camera becomes one (origin,
direction, rgb) ray record, and batches are drawn uniformly over the whole
bank. Parity note: in the reference tree `get_batch_rays` has ZERO call
sites — the bank is built in Scene.__init__ and never consumed by any
shipped trainer (verified by grep over the full tree). This module is the
same surface with the same status: exercised by tests, available for
ray-batch training variants, not on the training hot path.

TPU note: the bank is built lazily per camera and concatenated as numpy on
host (it can reach GBs at 800² x hundreds of cameras — same footprint the
reference keeps on GPU); `get_batch_rays` returns device arrays of a fixed
batch size, so sampling composes with jit'd consumers.
"""

from __future__ import annotations

import numpy as np


class RayBank:
    def __init__(self, cams, batch_size: int = 2 ** 16):
        """cams: list of Camera (scene/cameras.py) with .image loaded."""
        ro, rd, rgb = [], [], []
        for cam in cams:
            cp = cam.params()
            dirs = np.asarray(cp.ray_dirs(cam.width, cam.height,
                                          normalize=True)).reshape(-1, 3)
            origin = np.broadcast_to(np.asarray(cp.cam_pos)[None],
                                     dirs.shape)
            ro.append(origin.astype(np.float32))
            rd.append(dirs.astype(np.float32))
            img = np.asarray(cam.image, np.float32).reshape(-1, 3)
            rgb.append(img)
        self.rays_o = np.concatenate(ro)
        self.rays_d = np.concatenate(rd)
        self.rays_rgb = np.concatenate(rgb)
        self.batch_size = batch_size
        self._rng = np.random.RandomState(0)

    def __len__(self):
        return self.rays_o.shape[0]

    def get_batch_rays(self, rng: np.random.RandomState | None = None):
        """Uniform random ray batch (≙ get_batch_rays,
        scene/__init__.py:133-136). Returns jnp arrays
        (rays_o [B,3], rays_d [B,3], rgb [B,3])."""
        import jax.numpy as jnp
        rng = rng or self._rng
        idx = rng.randint(0, len(self), size=self.batch_size)
        return (jnp.asarray(self.rays_o[idx]), jnp.asarray(self.rays_d[idx]),
                jnp.asarray(self.rays_rgb[idx]))
