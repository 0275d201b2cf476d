"""Pallas TPU kernel for the per-tile surfel blend (forward + backward).

Replaces the XLA two-pass chunked blend in surfel_raster.py with one fused
kernel per tile (≙ renderCUDA forward.cu:272-464 and BACKWARD::render
backward.cu:145-468):

* forward — grid over tiles; each program DMAs its tile's splat slab from
  HBM in K-sized chunks, evaluates alpha for [256 pixels × K] pairs on the
  VPU, computes the front-to-back transmittance prefix with log-step
  shift-adds, accumulates color/feature/normal/depth/distortion with one
  [256,K]@[K,NA] MXU matmul per chunk, and exits early once every pixel
  saturates (T < 1e-4).
* backward — two in-kernel replays per tile: pass A recomputes the total
  Σ_k w_k·(dL/dw_k); pass B emits per-duplicate gradients using the
  telescoped identity dL/dα_k = T_k·dL/dw_k − (Σ_{j>k} w_j·dL/dw_j)/(1−α_k)
  (same structure as the CUDA backward's running-suffix trick,
  backward.cu:369-404). The distortion loss couples through per-pixel totals
  only: Σ_{j≠k} w_j (m_k−m_j)² = m_k²·A + M2 − 2 m_k·M1. Per-pair chains
  from (α, depth, m) back to the 12 geometric slab columns go through
  jax.vjp of the same alpha math, traced into the kernel.

Tile segments are K-ALIGNED by the caller (each tile's duplicate range is
padded to a multiple of K with zero rows), so every gradient DMA window
belongs to exactly one tile — CUDA's atomics become plain contiguous stores
plus one XLA scatter outside the kernel.

Splat slab layout (SLAB_F f32 columns, padded to a multiple of 8):
  0:3 Tu | 3:6 Tv | 6:9 Tw | 9:11 center | 11 opacity | 12:12+NA attrs
  attrs = rgb(3) ‖ feature(S) ‖ normal(3).
Per-tile outputs [256, C_OUT]:
  attrs(NA) | D | D2 | A | M1 | M2 | dist | med_depth | med_ord | T.
med_depth is the true median depth (depth of the last contributing splat
with incoming T > 0.5, ≙ forward.cu:418-421); med_ord is its position in
the tile's duplicate range (-1 = none), used by the backward to route
dL/dmed_depth to exactly that splat's dL/dz (≙ backward.cu:372-373).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
TILE_PIX = TILE * TILE

# when True, pallas_call runs in interpret mode (pure-Python emulation of the
# DMA/VMEM semantics) so the kernel is testable on the CPU CI mesh — flip via
# tests before first trace (the jit cache is keyed on traced code, so set it
# once per process)
INTERPRET = False
NEAR_N = 0.2
FAR_N = 100.0
FILTER_INV_SQUARE = 2.0
ALPHA_EPS = 1.0 / 255.0
T_DONE = 1e-4
K = 128  # gaussians per DMA chunk; tile segments are K-aligned


def n_attr(S: int) -> int:
    return 6 + S


def c_out(S: int) -> int:
    return n_attr(S) + 9


def slab_width(S: int) -> int:
    w = 12 + n_attr(S)
    return ((w + 7) // 8) * 8


def _cumsum_lanes_excl(x):
    """Exclusive prefix sum along the last axis (K lanes) via log-step
    shift-adds — jnp.cumsum does not lower inside Mosaic kernels."""
    s = 1
    total = x
    while s < K:
        shifted = jnp.pad(total, ((0, 0), (s, 0)))[:, :K]
        total = total + shifted
        s *= 2
    return total - x


def _pix_coords(tile_idx, grid_x: int):
    ty = tile_idx // grid_x
    tx = tile_idx % grid_x
    i = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIX, 1), 0)
    px = tx.astype(jnp.float32) * TILE + (i % TILE).astype(jnp.float32)
    py = ty.astype(jnp.float32) * TILE + (i // TILE).astype(jnp.float32)
    return px, py  # [256, 1]


def _alpha_depth(slab, px, py):
    """slab [F, K] (transposed: lane dim = gaussians, aligned for DMA) ×
    pixels [256,1] -> alpha, depth, m each [256, K]. Same per-pair math as
    renderCUDA (forward.cu:361-438). Padding columns are all-zero
    (opacity 0 ⇒ alpha 0)."""
    def col(j):
        return slab[j].reshape(1, K)

    kx = px * col(6) - col(0)
    ky = px * col(7) - col(1)
    kz = px * col(8) - col(2)
    lx = py * col(6) - col(3)
    ly = py * col(7) - col(4)
    lz = py * col(8) - col(5)
    p_x = ky * lz - kz * ly
    p_y = kz * lx - kx * lz
    p_z = kx * ly - ky * lx
    pz_safe = jnp.where(p_z == 0.0, 1.0, p_z)
    sx = p_x / pz_safe
    sy = p_y / pz_safe
    rho3d = sx * sx + sy * sy
    dx = col(9) - px
    dy = col(10) - py
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    rho = jnp.minimum(rho3d, rho2d)
    depth = jnp.where(rho3d <= rho2d,
                      sx * col(6) + sy * col(7) + col(8),
                      jnp.broadcast_to(col(8), rho.shape))
    alpha = jnp.minimum(0.99, col(11) * jnp.exp(-0.5 * rho))
    bad = (p_z == 0.0) | (depth < NEAR_N) | (alpha < ALPHA_EPS)
    alpha = jnp.where(bad, 0.0, alpha)
    m = FAR_N / (FAR_N - NEAR_N) * (1.0 - NEAR_N / jnp.maximum(depth, 1e-6))
    return alpha, depth, m


def _dLdw_terms(attrs_t, depth, m, g_attrs, g_D, g_D2, g_A, g_M1, g_M2,
                g_dist, A_tot, M1_tot, M2_tot):
    # attrs_t: [NA, K]; g_attrs: [256, NA] -> [256, K]
    return (jnp.dot(g_attrs, attrs_t, preferred_element_type=jnp.float32)
            + g_D * depth + g_D2 * depth * depth + g_A
            + g_M1 * m + g_M2 * m * m
            + g_dist * (m * m * A_tot + M2_tot - 2.0 * m * M1_tot))


def _make_fwd_kernel(grid_x: int, S: int, b_cap: int):
    NA = n_attr(S)
    CO = c_out(S)

    def kernel(starts_ref, counts_ref, splat_hbm, out_ref, slab_vmem, sem):
        t = pl.program_id(0)
        start = starts_ref[t]
        count = counts_ref[t]              # K-aligned
        n_chunks = count // K
        px, py = _pix_coords(t, grid_x)

        out_ref[0] = jnp.zeros((TILE_PIX, CO), jnp.float32)
        out_ref[0, :, CO - 2] = jnp.full((TILE_PIX,), -1.0, jnp.float32)
        out_ref[0, :, CO - 1] = jnp.ones((TILE_PIX,), jnp.float32)

        def body(state):
            c, _ = state
            offs = pl.multiple_of(start + c * K, K)
            dma = pltpu.make_async_copy(
                splat_hbm.at[:, pl.ds(offs, K)], slab_vmem, sem)
            dma.start()
            dma.wait()
            slab = slab_vmem[:]
            alpha, depth, m = _alpha_depth(slab, px, py)

            T_tile = out_ref[0, :, CO - 1].reshape(TILE_PIX, 1)
            A_prev = out_ref[0, :, NA + 2]
            M1_prev = out_ref[0, :, NA + 3]
            M2_prev = out_ref[0, :, NA + 4]

            lg = jnp.log1p(-alpha)
            T_in = T_tile * jnp.exp(_cumsum_lanes_excl(lg))
            w = alpha * T_in
            w = jnp.where(T_in * (1.0 - alpha) < T_DONE, 0.0, w)

            # median depth: last contributing splat with incoming T > 0.5
            # (forward.cu:418-421); overwrite carries across chunks
            mmask = (w > 0.0) & (T_in > 0.5)
            iota_k = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIX, K), 1).astype(jnp.float32)
            ordf = (c * K).astype(jnp.float32) + iota_k
            cand = jnp.max(jnp.where(mmask, ordf, -1.0), axis=1)
            selm = mmask & (ordf == cand[:, None])
            cand_d = jnp.sum(jnp.where(selm, depth, 0.0), axis=1)
            has = cand >= 0.0
            out_ref[0, :, CO - 3] = jnp.where(has, cand_d,
                                              out_ref[0, :, CO - 3])
            out_ref[0, :, CO - 2] = jnp.where(has, cand,
                                              out_ref[0, :, CO - 2])

            attrs_t = slab[12:12 + NA, :]                  # [NA, K]
            out_ref[0, :, 0:NA] += jax.lax.dot_general(
                w, attrs_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            sw = jnp.sum(w, axis=1)
            mw = m * w
            m2w = m * mw
            aw = _cumsum_lanes_excl(w)
            m1c = _cumsum_lanes_excl(mw)
            m2c = _cumsum_lanes_excl(m2w)
            dist_intra = jnp.sum(m * m * w * aw + w * m2c - 2.0 * m * w * m1c,
                                 axis=1)
            dist_cross = (jnp.sum(m2w, 1) * A_prev + sw * M2_prev
                          - 2.0 * jnp.sum(mw, 1) * M1_prev)

            out_ref[0, :, NA] += jnp.sum(w * depth, axis=1)
            out_ref[0, :, NA + 1] += jnp.sum(w * depth * depth, axis=1)
            out_ref[0, :, NA + 2] = A_prev + sw
            out_ref[0, :, NA + 3] = M1_prev + jnp.sum(mw, axis=1)
            out_ref[0, :, NA + 4] = M2_prev + jnp.sum(m2w, axis=1)
            out_ref[0, :, NA + 5] += dist_intra + dist_cross
            T_new = T_tile[:, 0] * jnp.exp(jnp.sum(lg, axis=1))
            out_ref[0, :, CO - 1] = T_new
            return c + 1, jnp.max(T_new)

        jax.lax.while_loop(
            lambda s: (s[0] < n_chunks) & (s[1] > T_DONE), body,
            (jnp.int32(0), jnp.float32(1.0)))

    return kernel


def _make_bwd_kernel(grid_x: int, S: int, b_cap: int):
    NA = n_attr(S)
    CO = c_out(S)

    def kernel(starts_ref, counts_ref, splat_hbm, fwd_out, cot, dslab_hbm,
               slab_vmem, grad_vmem, sem_in, sem_out):
        t = pl.program_id(0)
        start = starts_ref[t]
        count = counts_ref[t]
        n_chunks = count // K
        px, py = _pix_coords(t, grid_x)

        A_tot = fwd_out[0, :, NA + 2].reshape(TILE_PIX, 1)
        M1_tot = fwd_out[0, :, NA + 3].reshape(TILE_PIX, 1)
        M2_tot = fwd_out[0, :, NA + 4].reshape(TILE_PIX, 1)
        T_final = fwd_out[0, :, CO - 1].reshape(TILE_PIX, 1)
        g_attrs = cot[0, :, 0:NA]
        g_D = cot[0, :, NA].reshape(TILE_PIX, 1)
        g_D2 = cot[0, :, NA + 1].reshape(TILE_PIX, 1)
        g_A = cot[0, :, NA + 2].reshape(TILE_PIX, 1)
        g_M1 = cot[0, :, NA + 3].reshape(TILE_PIX, 1)
        g_M2 = cot[0, :, NA + 4].reshape(TILE_PIX, 1)
        g_dist = cot[0, :, NA + 5].reshape(TILE_PIX, 1)
        g_med = cot[0, :, CO - 3].reshape(TILE_PIX, 1)
        med_ord = fwd_out[0, :, CO - 2].reshape(TILE_PIX, 1)
        g_T = cot[0, :, CO - 1].reshape(TILE_PIX, 1)
        # cot[CO - 2] (med_ord, an index) is deliberately ignored — the
        # reference exposes the median contributor via n_contrib with no
        # gradient either

        def load_chunk(c):
            offs = pl.multiple_of(start + c * K, K)
            dma = pltpu.make_async_copy(
                splat_hbm.at[:, pl.ds(offs, K)], slab_vmem, sem_in)
            dma.start()
            dma.wait()
            return slab_vmem[:]

        # pass A: total Σ_k w_k·dL/dw_k per pixel
        def passA(state):
            c, T_carry, S_tot = state
            slab = load_chunk(c)
            alpha, depth, m = _alpha_depth(slab, px, py)
            lg = jnp.log1p(-alpha)
            T_in = T_carry * jnp.exp(_cumsum_lanes_excl(lg))
            w = jnp.where(T_in * (1.0 - alpha) < T_DONE, 0.0, alpha * T_in)
            dLdw = _dLdw_terms(slab[12:12 + NA, :], depth, m, g_attrs, g_D,
                               g_D2, g_A, g_M1, g_M2, g_dist,
                               A_tot, M1_tot, M2_tot)
            return (c + 1,
                    T_carry * jnp.exp(jnp.sum(lg, 1)).reshape(TILE_PIX, 1),
                    S_tot + jnp.sum(w * dLdw, 1).reshape(TILE_PIX, 1))

        ones = jnp.ones((TILE_PIX, 1), jnp.float32)
        _, _, S_tot = jax.lax.while_loop(
            lambda s: s[0] < n_chunks, passA,
            (jnp.int32(0), ones, jnp.zeros((TILE_PIX, 1), jnp.float32)))

        # pass B: emit per-duplicate gradients
        def passB(state):
            c, T_carry, S_pref = state
            slab = load_chunk(c)

            def geo(sl):
                return _alpha_depth(sl, px, py)

            (alpha, depth, m), pullback = jax.vjp(geo, slab)
            lg = jnp.log1p(-alpha)
            T_in = T_carry * jnp.exp(_cumsum_lanes_excl(lg))
            live = T_in * (1.0 - alpha) >= T_DONE
            w = jnp.where(live, alpha * T_in, 0.0)

            attrs_t = slab[12:12 + NA, :]
            dLdw = _dLdw_terms(attrs_t, depth, m, g_attrs, g_D, g_D2, g_A,
                               g_M1, g_M2, g_dist, A_tot, M1_tot, M2_tot)
            dLdm = w * (g_dist * (2.0 * m * A_tot - 2.0 * M1_tot)
                        + g_M1 + 2.0 * m * g_M2)

            wdLdw = w * dLdw
            pref_incl = S_pref + _cumsum_lanes_excl(wdLdw) + wdLdw
            remainder = S_tot - pref_incl
            one_m = jnp.maximum(1.0 - alpha, 1e-6)
            dalpha = jnp.where(
                live & (alpha > 0.0),
                T_in * dLdw - remainder / one_m - g_T * T_final / one_m,
                0.0)
            ddepth = w * (g_D + 2.0 * depth * g_D2)
            # median-depth grad: only the median contributor receives it
            # (≙ backward.cu:372-373)
            iota_k = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIX, K), 1).astype(jnp.float32)
            ordf = (c * K).astype(jnp.float32) + iota_k
            ddepth = ddepth + jnp.where(ordf == med_ord, g_med, 0.0)

            # per-pixel sums -> per-gaussian rows through the alpha-math vjp
            (dslab,) = pullback((dalpha, ddepth, dLdm))
            # dL/dattrs[a, k] = Σ_px g_attrs[px, a]·w[px, k]
            dattrs_t = jax.lax.dot_general(
                g_attrs, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [NA, K]
            grad_vmem[:] = dslab
            grad_vmem[12:12 + NA, :] += dattrs_t
            offs_o = pl.multiple_of(start + c * K, K)
            out_dma = pltpu.make_async_copy(
                grad_vmem, dslab_hbm.at[:, pl.ds(offs_o, K)], sem_out)
            out_dma.start()
            out_dma.wait()
            return (c + 1,
                    T_carry * jnp.exp(jnp.sum(lg, 1)).reshape(TILE_PIX, 1),
                    pref_incl[:, K - 1:K])

        jax.lax.while_loop(
            lambda s: s[0] < n_chunks, passB,
            (jnp.int32(0), ones, jnp.zeros((TILE_PIX, 1), jnp.float32)))

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def blend_tiles(splat, starts, counts, grid_x, n_tiles, S):
    """splat [SLAB_F, B_pad] TRANSPOSED (K-aligned tile segments along the
    lane axis, zero padding columns), starts/counts [n_tiles] int32 (counts
    multiples of K) -> [n_tiles, 256, C_OUT]."""
    return _blend_fwd_call(splat, starts, counts, grid_x, n_tiles, S)


def _blend_fwd_call(splat, starts, counts, grid_x, n_tiles, S):
    kernel = _make_fwd_kernel(grid_x, S, splat.shape[0])
    CO = c_out(S)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, TILE_PIX, CO), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((splat.shape[0], K), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, TILE_PIX, CO), jnp.float32),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(starts, counts, splat)


def _blend_fwd(splat, starts, counts, grid_x, n_tiles, S):
    out = _blend_fwd_call(splat, starts, counts, grid_x, n_tiles, S)
    return out, (splat, starts, counts, out)


def _blend_bwd(grid_x, n_tiles, S, res, cot):
    splat, starts, counts, fwd_out = res
    kernel = _make_bwd_kernel(grid_x, S, splat.shape[0])
    CO = c_out(S)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, TILE_PIX, CO), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_PIX, CO), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((splat.shape[0], K), jnp.float32),
            pltpu.VMEM((splat.shape[0], K), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    dsplat = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(splat.shape, jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERPRET,
    )(starts, counts, splat, fwd_out, cot)
    # the kernel writes only columns inside some tile's [start, start+count)
    # range; global padding columns past the last range are never touched and
    # would return uninitialized HBM (NaN garbage that poisons the gradient
    # scatter depending on buffer reuse) — zero them explicitly
    covered = jnp.max(starts + counts)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, splat.shape[1]), 1)
    dsplat = jnp.where(col < covered, dsplat, 0.0)
    return dsplat, None, None


blend_tiles.defvjp(_blend_fwd, _blend_bwd)
