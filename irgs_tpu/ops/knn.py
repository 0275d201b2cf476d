"""k-nearest-neighbor mean distance (≙ simple-knn's distCUDA2, spatial.cu:15-26).

Used once at initialization to set Gaussian scales
(scene/gaussian_model.py:349-350). The reference uses a Morton-sorted
windowed search; on TPU a chunked brute-force distance tile is simpler and,
as a one-shot cost, fast enough (O(N²) dense fp32 on the MXU via the
|a-b|² = |a|² + |b|² - 2a·b expansion).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def mean_knn_dist2(points: jnp.ndarray, k: int = 3, chunk: int = 1024) -> jnp.ndarray:
    """Mean squared distance from each point to its k nearest neighbors.

    Args:
      points: [N, 3] float32.
    Returns:
      [N] mean of the k smallest nonzero squared distances.
    """
    n = points.shape[0]
    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)), constant_values=1e9)
    sq = jnp.sum(pts * pts, axis=-1)

    def body(args):
        q, qsq, qidx = args
        d2 = qsq[:, None] + sq[None, :] - 2.0 * (q @ pts.T)   # [chunk, Np]
        # mask self and padding
        col = jnp.arange(pts.shape[0])
        self_mask = qidx[:, None] == col[None, :]
        d2 = jnp.where(self_mask | (col[None, :] >= n), jnp.inf, d2)
        neg_top, _ = jax.lax.top_k(-d2, k)
        return jnp.mean(-neg_top, axis=-1)

    qs = pts.reshape(-1, chunk, 3)
    qsqs = sq.reshape(-1, chunk)
    qidx = jnp.arange(pts.shape[0]).reshape(-1, chunk)
    out = jax.lax.map(body, (qs, qsqs, qidx)).reshape(-1)
    return jnp.maximum(out[:n], 0.0)
