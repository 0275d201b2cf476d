"""Pallas row-gather: many-in-flight async DMA gather of table rows.

The tracer's tiled select reads, per ray, `select_tiles` random rows of the
pair-ordered candidate table (ops/grid_tracer.py:select_hits_tiled). XLA's
gather on this backend issues those row reads with almost no memory-level
parallelism — measured ~17 GB/s / ~19M rows/s on 896-byte rows
(BASELINE.md round-3 profile), ~40x below HBM speed of light — so the
select is gather-bound, and with it the whole eval path
(≙ the OptiX BVH traversal's memory system in
/root/reference/submodules/surfel_tracer/src/optix/gaussiantrace_forward.cu,
which the reference gets "for free" from RT-core hardware).

This kernel keeps the table in HBM (`memory_space=ANY`) and streams rows
into each output block with a rolling window of `inflight` async copies, so
row latency overlaps instead of serializing. Indices ride in SMEM blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, table_ref, out_ref, sems, *, block_rows: int,
                   inflight: int):
    K = inflight

    def get_dma(i):
        row = idx_ref[i]
        return pltpu.make_async_copy(table_ref.at[row], out_ref.at[i],
                                     sems.at[jax.lax.rem(i, K)])

    # warm-up: fill the window
    for j in range(min(K, block_rows)):
        get_dma(j).start()

    def body(i, carry):
        # retire copy i (frees sem slot i%K), then launch i+K on that slot
        get_dma(i).wait()

        @pl.when(i + K < block_rows)
        def _():
            get_dma(i + K).start()

        return carry

    jax.lax.fori_loop(0, block_rows, body, None)


@functools.partial(jax.jit,
                   static_argnames=("block_rows", "inflight", "interpret"))
def gather_rows(table, idx, *, block_rows: int = 256, inflight: int = 8,
                interpret: bool = False):
    """table [T, W], idx [M] int32 (caller-clamped to [0, T)) -> [M, W].

    Equivalent to ``table[idx]`` but gather-latency-hiding. Non-
    differentiable (used on detached candidate indices only).
    """
    T, W = table.shape
    M = idx.shape[0]
    B = min(block_rows, M)
    pad = (-M) % B
    if pad:
        idx = jnp.pad(idx, (0, pad))
    Mp = M + pad

    out = pl.pallas_call(
        functools.partial(_gather_kernel, block_rows=B, inflight=inflight),
        grid=(Mp // B,),
        in_specs=[
            pl.BlockSpec((B,), lambda b: (b,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((B, W), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, W), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((min(inflight, B),))],
        interpret=interpret,
    )(idx, table)
    return out[:M] if pad else out
