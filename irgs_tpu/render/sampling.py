"""Monte-Carlo direction sampling for the rendering equation.

≙ reference fibonacci_sphere_sampling (utils/graphics_utils.py:19-47) and
sample_incident_rays (gaussian_renderer/__init__.py:324-332).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..utils.math3d import rotation_between_z, safe_normalize

_DELTA = math.pi * (3.0 - math.sqrt(5.0))
_ZMIN = math.sin(10.0 / 180.0 * math.pi)


def fibonacci_sphere_sampling(normals, sample_num: int, key=None):
    """Cosine-ish hemisphere sampling around each normal.

    Args:
      normals: [N, 3] unit normals.
      sample_num: S (static).
      key: PRNG key for the random azimuthal rotation (training); None for
        the deterministic eval pattern.
    Returns:
      incident_dirs [N, S, 3], incident_areas [N, S, 1] (constant 2π).
    """
    n = normals.shape[0]
    idx = jnp.arange(sample_num, dtype=jnp.float32)[None]          # [1, S]
    z = jnp.maximum(1.0 - 2.0 * idx / (2.0 * sample_num - 1.0), _ZMIN)
    rad = jnp.sqrt(1.0 - z * z)
    theta = _DELTA * idx
    if key is not None:
        theta = theta + jax.random.uniform(key, (n, 1)) * 2.0 * jnp.pi
    y = jnp.cos(theta) * rad
    x = jnp.sin(theta) * rad
    z_samples = jnp.stack([x, y, jnp.broadcast_to(z, y.shape)], axis=-2)  # [N, 3, S]

    rot = rotation_between_z(normals)                               # [N, 3, 3]
    dirs = jnp.einsum("nij,njs->nis", rot, z_samples,
                      precision=jax.lax.Precision.HIGHEST)
    dirs = safe_normalize(jnp.swapaxes(dirs, -1, -2))               # [N, S, 3]
    areas = jnp.full(dirs.shape[:-1] + (1,), 2.0 * jnp.pi, dirs.dtype)
    return dirs, areas
