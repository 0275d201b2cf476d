"""TPU-native differentiable 2D-Gaussian-surfel ray tracer.

Replaces the reference's OptiX tracer (submodules/surfel_tracer: GAS over
bounding-icosahedron proxies, 16-hit k-buffer anyhit
gaussiantrace_forward.cu:12-141, analytic backward
gaussiantrace_backward.cu) with a uniform voxel grid and a **two-phase
collect-then-blend** traversal shaped for TPU memory bandwidth:

* **build/refit** — per-Gaussian bounding sphere r = √(2·ln(o/α_min))·max(s)
  (≙ get_boundings, scene/gaussian_model.py:712-723) rasterized into grid
  cells with the same gather-style duplicate+sort+CSR machinery as the image
  rasterizer. Rebuild per iteration ≙ GaussianTracer.update_bvh.
* **phase 1 (collect)** — a `lax.while_loop` 3D-DDA walk that touches ONLY
  integer cell metadata (4-byte occupancy reads): each ray records up to
  `max_cells` non-empty cells as (CSR start, count, t_in, t_out). No Gaussian
  data is read here, so the loop is bandwidth-trivial; this is where the
  dense design wins back the sparsity OptiX gets from its BVH.
* **phase 2 (blend)** — the recorded cell ranges unroll into a dense
  [R, max_hits] candidate table via per-ray cumsum arithmetic (the same
  searchsorted-duplication trick as the rasterizer binning). One dense pass
  evaluates the exact surfel-plane hit d = -(n·(o-μ))(n·dir)/(n·dir)²,
  accepts hits inside their cell's [t_in, t_out) window (each hit counted
  exactly once, globally ordered after a per-ray depth argsort), and
  alpha-composites color (SH, per-ray basis hoisted), normal, feature,
  depth, alpha — the same outputs as the CUDA raygen loop.

Because phase 2 is pure dense gather/arithmetic, **JAX AD provides the exact
backward** (deterministic scatter-adds into the per-Gaussian arrays and ray
origins/directions) — no hand-written VJP, unlike the CUDA implementation's
530-line backward kernel.

The reference's full "re-trace the segment until T < 0.03" semantics
(gaussiantrace_forward.cu:27-103) are reproduced by **segmented re-trace**
(TracerConfig.n_segments > 1, `retrace_pass`/`trace_segments`): rays whose
budgets truncated while still transmissive are compacted and traced again
from their per-ray restart state (blended-depth watermark, cell frontier,
candidate offset), with the carried transmittance differentiable so the
segment products chain exactly like the CUDA running T.

Known deviations (revisit in later rounds):
* Gaussians spanning more than `span_cap` cells per axis are truncated to a
  centered span_cap³ window.
* n_segments bounds the re-trace statically (the reference loops until
  T < 0.03 or t > 100); retrace_frac bounds how many rays re-trace per
  round.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import sh as sh_utils

INF = jnp.float32(1e16)


@dataclasses.dataclass(frozen=True)
class TracerConfig:
    grid_res: int = 64
    pair_capacity: int = 2 ** 21
    max_cells: int = 12            # non-empty cells recorded per ray
    max_hits: int = 48             # candidates paying the EXACT hit test
    prefilter_width: int = 0       # tier-1 cheap-screen width (0 = off):
                                   # candidates enumerated and screened by
                                   # the conservative ray-line-distance test
                                   # before compaction into max_hits exact
                                   # slots. In candidate-rich low-acceptance
                                   # cells (~2% accept) this sets the real
                                   # per-segment progress rate.
    hit_budget: int = 16           # nearest accepted hits actually blended
                                   # (≙ the reference's 16-slot k-buffer,
                                   # surfel_tracer auxiliary.h:10); the SH
                                   # gather/scatter cost scales with this
    max_crossings: int = 0         # per-axis boundary crossings considered
                                   # per ray (0 -> grid_res, exact; ~2/3 of
                                   # grid_res is a safe practical cap)
    span_cap: int = 6              # max cells per axis per gaussian
    # OVERSIZE HANDLING: gaussians spanning > span_cap cells per axis (a
    # dominant floor/sky surfel) cannot be registered in the grid without
    # unbounded window shapes. With oversize_cap > 0, the largest such
    # gaussians (by bounding radius, up to the cap) are EXCLUDED from the
    # grid and instead brute-force intersected against every ray and
    # depth-merged into each round's k-buffer before the blend — exact, at
    # the cost of one [R, cap] hit eval + a (kb+cap)-wide blend per round.
    # 0 (default) keeps the old centered-window truncation, counted loudly
    # in Grid.oversize. ≙ OptiX handles arbitrary-extent proxies natively
    # (surfel_tracer/src/bvh.cu:69-160); this is the grid rebuild's answer.
    oversize_cap: int = 0
    # TILED select (select_tiles > 0): candidates examined in `tile`-wide
    # CONTIGUOUS blocks of the pair-ordered candidate table — one gather row
    # per `tile` candidates instead of one per candidate (per-row gather
    # latency is the eval-path wall on this backend). Dedup is exact via
    # hit-cell == pair-cell (a hit's cell always contains its gaussian's
    # pair), replacing the per-candidate window tests. Overrides the
    # prefilter/per-candidate path when set.
    select_tiles: int = 0          # TILE-wide blocks examined per segment
    tile: int = 16                 # candidates per block: the table row is
                                   # 14·tile floats (224 -> 256 lanes, 1.14x
                                   # pad); smaller tiles waste less on
                                   # sparse cells, larger ones cut gather
                                   # rows per ray
    retrace_select_tiles: int = 0  # re-trace rounds (0 = inherit)
    select_topk: bool = False      # tiled select: keep the kb nearest hits
                                   # via a stable top_k + one-hot-matmul
                                   # extraction instead of sorting all
                                   # select_tiles*tile lanes (exact same
                                   # hits and tie order; A/B on device)
    pallas_gather: int = 0         # tiled select: gather pair-table rows
                                   # with the latency-hiding Pallas DMA
                                   # kernel (ops/gather_pallas.py) instead
                                   # of XLA's serialized gather; value =
                                   # copies kept in flight (0 = XLA)
    table_bf16: bool = False       # pair table stored bf16 with CELL-
                                   # RELATIVE means (halves the bandwidth-
                                   # bound row gather). The select becomes a
                                   # widened screen (accept threshold
                                   # alpha_min/2); blend re-tests with exact
                                   # f32 alpha, so false accepts are always
                                   # discarded. False rejects at the margin
                                   # are possible for gaussians much smaller
                                   # than a grid cell (mean quantization
                                   # ~cell·2^-9 is O(1) in Mahalanobis units
                                   # when scale << cell) — validate on the
                                   # target scene before enabling.
    tiled_direct: bool = False     # tiled select reads the DDA's segment
                                   # list UNPACKED: collect skips its
                                   # compaction sort + one-hot einsum (the
                                   # dominant non-gather collect cost) and
                                   # max_cells stops truncating — the tile
                                   # budget (select_tiles) is the only cap
    # coarse-occupancy DDA (empty-space skip + completeness check). Costs
    # ~40% of a narrow collect; it is what makes the eval re-trace loop
    # demand-proportional (escaping rays stop being flagged truncated).
    coarse_scan: bool = True
    transmittance_min: float = 0.03
    alpha_min: float = 1.0 / 255.0
    # segmented re-trace (≙ the CUDA raygen's "re-trace the segment until
    # T < transmittance_min or t > T_SCENE_MAX", gaussiantrace_forward.cu:
    # 27-103): rays whose hit list was truncated while still transmissive
    # get compacted and traced again from past their last blended hit.
    # n_segments=1 reproduces the round-1 single-pass budgets.
    n_segments: int = 1
    retrace_frac: float = 0.25     # capacity of each re-trace pass, as a
                                   # fraction of the ray count
    # re-trace round budgets (0 / -1 = inherit the first-pass value). The
    # narrow-first eval strategy: run EVERY ray through a lean first pass,
    # then send only the compacted truncated-and-transmissive subset through
    # wide-budget rounds — most rays (escaped or saturated) never pay the
    # wide-candidate costs.
    retrace_max_cells: int = 0
    retrace_max_hits: int = 0
    retrace_prefilter_width: int = 0
    retrace_hit_budget: int = 0
    retrace_max_crossings: int = -1
    # capacity multiplier per successive round: round r gets
    # retrace_frac * retrace_decay^r of the rays. Early rounds do the bulk;
    # the geometric tail keeps total wide-budget work ~2*frac while deep
    # rays still get many extension rounds.
    retrace_decay: float = 1.0
    # capacity ladder: run each re-trace round at the smallest precompiled
    # rung that fits the measured demand (lax.switch), skipping entirely
    # when no ray needs it. Result-identical to full capacity. OFF by
    # default: under reverse-mode AD the switch multiplies differentiated
    # re-trace bodies (rounds x rungs) and their blend-gather residuals
    # OOM'd the train step (BENCH_r04). Enable for forward-only eval paths
    # (from_pipe(eval=True) does).
    adaptive: bool = False
    # ITERATIVE DEEPENING (eval-only: lax.while_loop is not reverse-mode
    # differentiable): after `retrace_bulk` unrolled rounds at retrace_frac
    # capacity (the demand bulk), fixed SMALL-capacity
    # transmittance-prioritized rounds repeat until NO ray is
    # truncated-and-transmissive, up to n_segments-1 rounds total. Cost
    # scales with actual demand per dispatch — robust to block-to-block
    # demand heterogeneity (a shadow-heavy block runs many rounds, a sky
    # block runs none) — while the cheap tail rounds stop a handful of
    # stubborn deep rays from dragging full-capacity rounds.
    retrace_while: bool = False
    retrace_bulk: int = 2          # unrolled full-capacity rounds first
    retrace_tail_frac: float = 0.02

    def round_capacity(self, n_rays: int, rnd: int) -> int:
        frac = self.retrace_frac * (self.retrace_decay ** rnd)
        return max(1, min(n_rays, int(n_rays * frac)))

    def retrace_cfg(self) -> "TracerConfig":
        return dataclasses.replace(
            self,
            max_cells=self.retrace_max_cells or self.max_cells,
            max_hits=self.retrace_max_hits or self.max_hits,
            prefilter_width=(self.retrace_prefilter_width
                             or self.prefilter_width),
            select_tiles=self.retrace_select_tiles or self.select_tiles,
            hit_budget=self.retrace_hit_budget or self.hit_budget,
            max_crossings=(self.max_crossings if self.retrace_max_crossings < 0
                           else self.retrace_max_crossings))

    @classmethod
    def from_pipe(cls, pipe, eval: bool = False) -> "TracerConfig":
        """Build from a PipelineConfig (config.py) — training or eval
        budgets. Keeps every CLI on one construction path."""
        if eval:
            return cls(
                grid_res=pipe.tracer_grid_res,
                max_cells=pipe.tracer_max_cells_eval,
                max_hits=pipe.tracer_max_hits_eval,
                prefilter_width=getattr(pipe, "tracer_prefilter_width_eval",
                                        0),
                retrace_prefilter_width=getattr(
                    pipe, "tracer_retrace_prefilter_width_eval", 0),
                select_tiles=getattr(pipe, "tracer_select_tiles_eval", 0),
                retrace_select_tiles=getattr(
                    pipe, "tracer_retrace_select_tiles_eval", 0),
                tile=getattr(pipe, "tracer_tile", 16),
                tiled_direct=getattr(pipe, "tracer_tiled_direct", False),
                hit_budget=pipe.tracer_hit_budget_eval,
                max_crossings=pipe.tracer_max_crossings_eval,
                n_segments=pipe.tracer_n_segments_eval,
                retrace_frac=pipe.tracer_retrace_frac_eval,
                retrace_decay=pipe.tracer_retrace_decay_eval,
                retrace_while=getattr(pipe, "tracer_retrace_while_eval",
                                      False),
                retrace_bulk=getattr(pipe, "tracer_retrace_bulk_eval", 2),
                retrace_tail_frac=getattr(pipe,
                                          "tracer_retrace_tail_frac_eval",
                                          0.02),
                retrace_max_cells=pipe.tracer_retrace_max_cells_eval,
                retrace_max_hits=pipe.tracer_retrace_max_hits_eval,
                retrace_hit_budget=pipe.tracer_retrace_hit_budget_eval,
                retrace_max_crossings=pipe.tracer_retrace_max_crossings_eval,
                table_bf16=getattr(pipe, "tracer_table_bf16_eval", False),
                select_topk=getattr(pipe, "tracer_select_topk_eval", True),
                adaptive=getattr(pipe, "tracer_adaptive_eval", True),
                oversize_cap=getattr(pipe, "tracer_oversize_cap", 0),
                transmittance_min=pipe.transmittance_min,
                alpha_min=pipe.alpha_min)
        return cls(
            grid_res=pipe.tracer_grid_res,
            max_cells=pipe.tracer_max_cells,
            max_hits=pipe.tracer_max_hits,
            prefilter_width=getattr(pipe, "tracer_prefilter_width", 0),
            select_tiles=getattr(pipe, "tracer_select_tiles", 0),
            tile=getattr(pipe, "tracer_tile", 16),
            tiled_direct=getattr(pipe, "tracer_tiled_direct", False),
            hit_budget=pipe.tracer_hit_budget,
            max_crossings=pipe.tracer_max_crossings,
            n_segments=pipe.tracer_n_segments,
            retrace_frac=pipe.tracer_retrace_frac,
            table_bf16=getattr(pipe, "tracer_table_bf16", False),
            adaptive=getattr(pipe, "tracer_adaptive", False),
            oversize_cap=getattr(pipe, "tracer_oversize_cap", 0),
            transmittance_min=pipe.transmittance_min,
            alpha_min=pipe.alpha_min)


# cell_meta packing: one int32 per cell = (CSR start << 10) | min(count, 1023).
# A flat scalar gather avoids both a second gather (latency-bound here) and
# the [*, 2] tiled-layout lane padding that inflates a wide gather 64x.
_COUNT_BITS = 10
_COUNT_MASK = (1 << _COUNT_BITS) - 1


def pack_cell_meta(start, count):
    # start must fit in 31 - _COUNT_BITS bits (pair_capacity <= 2^21 - 1)
    start = jnp.minimum(start, (1 << (31 - _COUNT_BITS)) - 1)
    return (start << _COUNT_BITS) | jnp.minimum(count, _COUNT_MASK)


def unpack_cell_meta(meta):
    return meta >> _COUNT_BITS, meta & _COUNT_MASK


class Grid(NamedTuple):
    sorted_gauss: jnp.ndarray    # [P] int32 gaussian id per (cell, gaussian)
                                 # pair, cell-major with gaussian-ID order
                                 # INSIDE each cell (the oracle's stable
                                 # depth-tie order rides on this)
    sorted_cell: jnp.ndarray     # [P] int32 cell id per pair (hit-cell
                                 # dedup in the tiled select)
    cell_meta: jnp.ndarray       # [G^3] int32 packed (start, count)
    bb_min: jnp.ndarray          # [3]
    inv_cell: jnp.ndarray        # [3]
    cell_size: jnp.ndarray       # [3]
    overflow: jnp.ndarray        # scalar int32
    oversize: jnp.ndarray        # scalar int32: alive gaussians whose
                                 # bounding box spans > span_cap cells on
                                 # some axis — their insertion was TRUNCATED
                                 # to a centered span_cap window (rays far
                                 # from the center silently miss them).
                                 # Nonzero => raise span_cap / lower
                                 # grid_res / raise oversize_cap, or
                                 # expect bias (loud warning at call sites)
    oversize_ids: jnp.ndarray    # [oversize_cap] int32 gaussian ids kept
                                 # OUT of the grid and brute-force merged
                                 # per ray (merge_oversize); -1 padding.
                                 # Shape [0] when oversize_cap == 0.
    coarse_occ: jnp.ndarray      # [Gc^3] int32 0/1 occupancy of
                                 # COARSE_FACTOR^3 supercells (exact — a
                                 # supercell is 1 iff some fine cell in it
                                 # has candidates); traversed by an exact
                                 # coarse DDA for empty-space skipping +
                                 # traversal-completeness checks


# fine cells per coarse supercell along each axis
COARSE_FACTOR = 4


class TraceInputs(NamedTuple):
    """Per-Gaussian arrays consumed by the tracer (≙ GaussianTracer.trace
    arguments, surfel_tracer/raytracer.py:84-122)."""
    means3d: jnp.ndarray   # [N, 3]
    opacity: jnp.ndarray   # [N]
    ru: jnp.ndarray        # [N, 3]  R[:,0] / s_u
    rv: jnp.ndarray        # [N, 3]  R[:,1] / s_v
    normals: jnp.ndarray   # [N, 3]  unit, pre-flipped toward camera
    shs: jnp.ndarray       # [N, C, 3]
    features: jnp.ndarray  # [N, S]


class TraceOut(NamedTuple):
    color: jnp.ndarray    # [R, 3]
    normal: jnp.ndarray   # [R, 3]
    feature: jnp.ndarray  # [R, S]
    depth: jnp.ndarray    # [R]
    alpha: jnp.ndarray    # [R]
    trans: jnp.ndarray    # [R] final transmittance Π(1-αᵢ) over blended hits
                          # (the re-trace carry; ≙ the CUDA raygen's running T)


class Cells(NamedTuple):
    """Per-ray recorded cell windows from collect_cells."""
    starts: jnp.ndarray     # [R, C] CSR start per recorded cell
    counts: jnp.ndarray     # [R, C] gaussians in the cell (0 = unused slot)
    tin: jnp.ndarray        # [R, C] window entry t
    tout: jnp.ndarray       # [R, C] window exit t
    truncated: jnp.ndarray  # [R] bool: more non-empty cells existed than C,
                            # or the crossing budget ended inside the grid
    resume: jnp.ndarray     # [R] traversal horizon to resume from when the
                            # crossing budget truncated (0 otherwise)


class SelectedHits(NamedTuple):
    """Depth-ordered k-buffer from select_hits (index-only, detached)."""
    gs: jnp.ndarray       # [R, kb] gaussian ids
    valid: jnp.ndarray    # [R, kb] accepted mask
    t_last: jnp.ndarray   # [R] depth of the farthest kept hit (0 if none);
                          # re-trace ACCEPTANCE restart (excludes re-blends)
    t_cell: jnp.ndarray   # [R] re-trace COLLECTION restart: cells whose
                          # candidates were all examined can be skipped, so
                          # the next segment makes progress even when
                          # nothing was accepted
    more: jnp.ndarray     # [R] bool: the hit list was truncated (accepted
                          # candidates beyond the k-buffer, the candidate
                          # cap, or the recorded-cell cap)
    cand_skip: jnp.ndarray  # [R] candidates of the first cell at t_cell
                          # already examined — the re-trace skips them, so
                          # a single cell holding more than max_hits
                          # candidates still makes progress


def bounding_radius(opacity, scales, alpha_min: float):
    """√(2·ln(o/α_min)) · max(s_u, s_v); 0 when o ≤ α_min."""
    ratio = jnp.maximum(opacity / alpha_min, 1.0)
    return jnp.sqrt(2.0 * jnp.log(ratio)) * jnp.max(scales, axis=-1)


@functools.partial(jax.jit, static_argnames=("grid_res", "pair_capacity",
                                             "span_cap", "oversize_cap"))
def build_grid(means3d, radius, alive, *, grid_res: int, pair_capacity: int,
               span_cap: int = 6, normals=None, oversize_cap: int = 0) -> Grid:
    """Uniform grid over per-Gaussian bounding spheres.

    With `normals` given, cells are culled to those the surfel's DISK PLANE
    actually passes through (slab test |n·(c−μ)| ≤ extent(n) + radial
    bound): a flat 2D surfel overlaps O(span²) of its bounding cube's
    span³ cells, so this cuts both per-cell candidate counts and pair
    capacity pressure ~2-3x — the grid analog of OptiX's triangle-proxy
    tightness (bounding icosahedra, scene/gaussian_model.py:712-723).
    """
    g = grid_res
    n = means3d.shape[0]

    def _bounds(alive_m):
        rr = jnp.where(alive_m, radius, 0.0)
        masked = jnp.where(alive_m[:, None], means3d, jnp.nan)
        bmn = jnp.nan_to_num(jnp.nanmin(masked - rr[:, None], axis=0),
                             nan=-1.0) - 1e-3
        bmx = jnp.nan_to_num(jnp.nanmax(masked + rr[:, None], axis=0),
                             nan=1.0) + 1e-3
        cl = (bmx - bmn) / g
        ic = 1.0 / cl
        lo_ = jnp.clip(jnp.floor((means3d - rr[:, None] - bmn) * ic
                                 ).astype(jnp.int32), 0, g - 1)
        hi_ = jnp.clip(jnp.floor((means3d + rr[:, None] - bmn) * ic
                                 ).astype(jnp.int32), 0, g - 1)
        ov = (alive_m & (rr > 0)) & jnp.any(hi_ - lo_ + 1 > span_cap,
                                            axis=-1)
        return rr, bmn, cl, ic, lo_, hi_, ov

    if oversize_cap > 0:
        # PASS A: find the largest oversize gaussians under the inclusive
        # bounds. They leave the grid entirely (the tracer brute-force
        # depth-merges them per ray — merge_oversize); the bbox is then
        # RECOMPUTED without them, so a dominant floor no longer inflates
        # the cell size for everything else.
        r_a, _, _, _, _, _, ov_a = _bounds(alive)
        K = min(oversize_cap, n)
        score = jnp.where(ov_a, r_a, -1.0)
        top_r, top_i = jax.lax.top_k(score, K)
        taken = top_r > 0.0
        ov_ids = jnp.where(taken, top_i, -1).astype(jnp.int32)
        # scatter-max: untaken lanes write False = no-op (a plain .set
        # with a dummy index could clear a real entry)
        handled = jnp.zeros((n,), bool).at[top_i].max(taken)
        alive = alive & ~handled
    else:
        ov_ids = jnp.zeros((0,), jnp.int32)

    # PASS B (the only pass when oversize_cap == 0): bounds over what the
    # grid actually holds. Still-oversize gaussians (cap exceeded, or made
    # oversize by the tightened cells) fall back to the centered
    # span_cap-window TRUNCATION — rays outside it miss them — and are
    # counted loudly in Grid.oversize.
    r, bb_min, cell, inv_cell, lo, hi, oversize_mask = _bounds(alive)
    n_oversize = jnp.sum(oversize_mask).astype(jnp.int32)
    span = jnp.minimum(hi - lo + 1, span_cap)
    cc = jnp.clip(jnp.floor((means3d - bb_min) * inv_cell).astype(jnp.int32), 0, g - 1)
    lo = jnp.clip(cc - (span - 1) // 2, lo, hi - span + 1)

    from .surfel_raster import counts_by_id, rank_against_arange
    slots = jnp.arange(pair_capacity, dtype=jnp.int32)

    if normals is not None:
        # per-gaussian exact kept-cell mask over the unrolled span_cap³
        # window: disk-slab + radial cull BEFORE capacity accounting, so the
        # pair capacity is spent only on cells a hit can actually occur in
        W = span_cap
        off = jnp.arange(W, dtype=jnp.int32)
        wx_all = (off[:, None, None] * jnp.ones((1, W, W), jnp.int32)).reshape(-1)
        wy_all = (off[None, :, None] * jnp.ones((W, 1, W), jnp.int32)).reshape(-1)
        wz_all = (off[None, None, :] * jnp.ones((W, W, 1), jnp.int32)).reshape(-1)
        in_win = ((wx_all[None] < span[:, 0:1]) & (wy_all[None] < span[:, 1:2])
                  & (wz_all[None] < span[:, 2:3]))            # [N, W³]
        cxw = (lo[:, 0:1] + wx_all[None]).astype(jnp.float32)
        cyw = (lo[:, 1:2] + wy_all[None]).astype(jnp.float32)
        czw = (lo[:, 2:3] + wz_all[None]).astype(jnp.float32)
        dx = bb_min[0] + (cxw + 0.5) * cell[0] - means3d[:, 0:1]
        dy = bb_min[1] + (cyw + 0.5) * cell[1] - means3d[:, 1:2]
        dz = bb_min[2] + (czw + 0.5) * cell[2] - means3d[:, 2:3]
        plane = jnp.abs(dx * normals[:, 0:1] + dy * normals[:, 1:2]
                        + dz * normals[:, 2:3])
        # conservative epsilon: an axis-aligned disk plane that lands
        # EXACTLY on a cell boundary (the generic case for a dominant
        # floor surfel — its own bounding sphere centers the bbox so the
        # plane sits on the 8/16-boundary) must keep BOTH neighbor cells;
        # the hit-cell dedup then assigns boundary hits to whichever cell
        # the rounded hit point lands in, which needs that cell's pair
        slab = (0.5 * (jnp.abs(normals[:, 0:1]) * cell[0]
                       + jnp.abs(normals[:, 1:2]) * cell[1]
                       + jnp.abs(normals[:, 2:3]) * cell[2])
                * (1.0 + 1e-4) + 1e-6 * jnp.linalg.norm(cell))
        rad2 = dx * dx + dy * dy + dz * dz
        rmax = (r + 0.5 * jnp.linalg.norm(cell))[:, None]
        keep = in_win & (plane <= slab) & (rad2 <= rmax * rmax)
        keep = keep & (alive & (r > 0))[:, None]
        kcum = jnp.cumsum(keep.astype(jnp.int32), axis=-1)    # [N, W³]
        count = kcum[:, -1]

        cum = jnp.cumsum(count)
        total = cum[-1]
        offsets = cum - count
        gi = jnp.minimum(rank_against_arange(cum, pair_capacity), n - 1)
        local = slots - offsets[gi]
        # slot -> local-th kept window index, via 8-step binary search on the
        # gaussian's kcum row (flat scalar gathers; a full [B, W³] row gather
        # would be gigabytes)
        kflat = kcum.reshape(-1)
        lo_w = jnp.zeros_like(slots)
        hi_w = jnp.full_like(slots, W ** 3 - 1)

        def bstep(_, lh):
            lo_i, hi_i = lh
            mid = (lo_i + hi_i) // 2
            val = kflat[gi * (W ** 3) + mid]
            gt_ = val > local
            return jnp.where(gt_, lo_i, mid + 1), jnp.where(gt_, mid, hi_i)

        import math as _math
        n_steps = max(1, int(_math.ceil(_math.log2(W ** 3))))
        lo_w, hi_w = jax.lax.fori_loop(0, n_steps, bstep, (lo_w, hi_w))
        windex = lo_w
        cx = lo[gi, 0] + wx_all[windex]
        cy = lo[gi, 1] + wy_all[windex]
        cz = lo[gi, 2] + wz_all[windex]
    else:
        count = jnp.where(alive & (r > 0),
                          span[:, 0] * span[:, 1] * span[:, 2], 0)
        cum = jnp.cumsum(count)
        total = cum[-1]
        offsets = cum - count
        gi = jnp.minimum(rank_against_arange(cum, pair_capacity), n - 1)
        local = slots - offsets[gi]
        sx, sy = span[gi, 0], span[gi, 1]
        cx = lo[gi, 0] + local % sx
        cy = lo[gi, 1] + (local // sx) % sy
        cz = lo[gi, 2] + local // (sx * sy)

    cell_id = (cz * g + cy) * g + cx
    cell_id = jnp.where(slots < total, cell_id, g * g * g)

    # two keys: pairs cell-major AND gaussian-id-ordered within a cell —
    # coplanar splats covering one hit point live in that point's cell, so
    # pair order there = id order = the oracle's stable depth-tie order
    sorted_cell, sorted_gauss = jax.lax.sort((cell_id, gi), num_keys=2)
    per_cell = counts_by_id(cell_id, g * g * g)
    start = jnp.cumsum(per_cell) - per_cell

    # exact coarse occupancy (COARSE_FACTOR^3 supercells): 1 iff any fine
    # cell inside has candidates. Traversed by an exact coarse DDA in
    # collect_cells for empty-space skipping + completeness checks.
    gc = -(-g // COARSE_FACTOR)
    occ = (per_cell > 0).reshape(g, g, g)                  # [z, y, x]
    pad = gc * COARSE_FACTOR - g
    occ = jnp.pad(occ, ((0, pad),) * 3)
    occ = occ.reshape(gc, COARSE_FACTOR, gc, COARSE_FACTOR, gc, COARSE_FACTOR)
    occ = jnp.any(occ, axis=(1, 3, 5))                     # [gc, gc, gc]
    return Grid(sorted_gauss=sorted_gauss, sorted_cell=sorted_cell,
                cell_meta=pack_cell_meta(start, per_cell),
                bb_min=bb_min, inv_cell=inv_cell, cell_size=cell,
                overflow=jnp.maximum(total - pair_capacity, 0),
                oversize=n_oversize, oversize_ids=ov_ids,
                coarse_occ=occ.reshape(-1).astype(jnp.int32))


def build_grid_from_gaussians(params, aux, cfg: TracerConfig) -> Grid:
    """Convenience: ≙ GaussianModel.build_bvh/update_bvh
    (scene/gaussian_model.py:725-731). Surfel normals enable the disk-slab
    insertion cull (sign irrelevant — the slab test is two-sided)."""
    from ..utils.math3d import quat_to_rotmat
    radius = bounding_radius(params.get_opacity()[:, 0], params.get_scaling(),
                             cfg.alpha_min)
    normals = quat_to_rotmat(params.rotation)[:, :, 2]
    return build_grid(params.xyz, radius, aux.alive, grid_res=cfg.grid_res,
                      pair_capacity=cfg.pair_capacity, span_cap=cfg.span_cap,
                      normals=normals, oversize_cap=cfg.oversize_cap)


# ---------------------------------------------------------------------------
# local hit math
# ---------------------------------------------------------------------------

def _hit_geom(mean, opa, ru, rv, nrm, ray_o, ray_d):
    """Batched Gaussian×ray geometric hit -> (alpha, n_flip, depth).
    ≙ the raygen per-hit math (gaussiantrace_forward.cu:61-92)."""
    o_g = jnp.sum(nrm * (ray_o - mean), axis=-1)
    d_g = jnp.sum(nrm * ray_d, axis=-1)
    d = -o_g * d_g / jnp.maximum(1e-6, d_g * d_g)
    pos = ray_o + d[..., None] * ray_d - mean
    pg_u = jnp.sum(ru * pos, axis=-1)
    pg_v = jnp.sum(rv * pos, axis=-1)
    alpha = jnp.minimum(0.99, opa * jnp.exp(-0.5 * (pg_u * pg_u + pg_v * pg_v)))

    cosr = -jnp.sum(ray_d * nrm, axis=-1)
    n_flip = jnp.where((cosr > 0)[..., None], nrm, -nrm)
    return alpha, n_flip, d


def _hit_geom_cols(cols, ray_o, ray_d):
    """Componentwise hit math on a transposed candidate slab.

    cols [13, R, H] (mean3 | opacity | ru3 | rv3 | normal3), ray_o/ray_d
    [R, 3]. Returns (alpha, depth, d·n) each [R, H]. Same math as
    _hit_geom, laid out so the candidate axis lives in vector lanes.
    """
    ox, oy, oz = ray_o[:, 0:1], ray_o[:, 1:2], ray_o[:, 2:3]
    dx, dy, dz = ray_d[:, 0:1], ray_d[:, 1:2], ray_d[:, 2:3]
    mx, my, mz = cols[0], cols[1], cols[2]
    opa = cols[3]
    nx, ny, nz = cols[10], cols[11], cols[12]
    o_g = nx * (ox - mx) + ny * (oy - my) + nz * (oz - mz)
    d_g = nx * dx + ny * dy + nz * dz
    d = -o_g * d_g / jnp.maximum(1e-6, d_g * d_g)
    px = ox + d * dx - mx
    py = oy + d * dy - my
    pz = oz + d * dz - mz
    pu = cols[4] * px + cols[5] * py + cols[6] * pz
    pv = cols[7] * px + cols[8] * py + cols[9] * pz
    alpha = jnp.minimum(0.99, opa * jnp.exp(-0.5 * (pu * pu + pv * pv)))
    return alpha, d, d_g


def _hit_geom_cols10(cols, ray_o, ray_d):
    """Hit math on a 10-component candidate slab (mean3 | opacity | ru3 |
    rv3) — the surfel plane normal is recomputed in-lane as the NORMALIZED
    cross product of the scaled tangent axes. The raw ru x rv direction is
    the frame orientation, NOT the camera-flipped stored normal
    (flip_align_view) — the table build folds the flip into ru's sign
    (_pair_tab_from_geom), after which depth AND the back-cull d_g sign
    match _hit_geom_cols with the stored normal up to last-ulp rounding.
    Saves 3 gathered components per candidate in the tiled select, whose
    row gather is bandwidth-bound."""
    ox, oy, oz = ray_o[:, 0:1], ray_o[:, 1:2], ray_o[:, 2:3]
    dx, dy, dz = ray_d[:, 0:1], ray_d[:, 1:2], ray_d[:, 2:3]
    mx, my, mz = cols[0], cols[1], cols[2]
    opa = cols[3]
    rux, ruy, ruz = cols[4], cols[5], cols[6]
    rvx, rvy, rvz = cols[7], cols[8], cols[9]
    cx = ruy * rvz - ruz * rvy
    cy = ruz * rvx - rux * rvz
    cz = rux * rvy - ruy * rvx
    inv = jax.lax.rsqrt(jnp.maximum(cx * cx + cy * cy + cz * cz, 1e-30))
    nx, ny, nz = cx * inv, cy * inv, cz * inv
    o_g = nx * (ox - mx) + ny * (oy - my) + nz * (oz - mz)
    d_g = nx * dx + ny * dy + nz * dz
    d = -o_g * d_g / jnp.maximum(1e-6, d_g * d_g)
    px = ox + d * dx - mx
    py = oy + d * dy - my
    pz = oz + d * dz - mz
    pu = rux * px + ruy * py + ruz * pz
    pv = rvx * px + rvy * py + rvz * pz
    alpha = jnp.minimum(0.99, opa * jnp.exp(-0.5 * (pu * pu + pv * pv)))
    return alpha, d, d_g


def _sh_basis(sh_deg: int, dirs):
    """SH basis b [..., C]: pre-clamp color = Σ_j b_j·sh_j + 0.5
    (computeColorFromSH convention). Evaluated once per ray."""
    from ..utils.sh import C0, C1, C2, C3
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    terms = [C0 * one]
    if sh_deg > 0:
        terms += [-C1 * y, C1 * z, -C1 * x]
    if sh_deg > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        terms += [C2[0] * xy, C2[1] * yz, C2[2] * (2 * zz - xx - yy),
                  C2[3] * xz, C2[4] * (xx - yy)]
    if sh_deg > 2:
        terms += [C3[0] * y * (3 * xx - yy), C3[1] * xy * z,
                  C3[2] * y * (4 * zz - xx - yy),
                  C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                  C3[4] * x * (4 * zz - xx - yy), C3[5] * z * (xx - yy),
                  C3[6] * x * (xx - 3 * yy)]
    return jnp.stack(terms, axis=-1)


def _hit_quantities(mean, opa, ru, rv, nrm, sh, feat, ray_o, ray_d, sh_deg: int):
    """Full per-hit outputs (used by the brute-force reference oracle)."""
    alpha, n_flip, d = _hit_geom(mean, opa, ru, rv, nrm, ray_o, ray_d)
    dirs = jnp.broadcast_to(ray_d, jnp.broadcast_shapes(ray_d.shape, mean.shape))
    color = sh_utils.eval_sh_color(sh_deg, jnp.swapaxes(sh, -1, -2), dirs)
    color = jnp.broadcast_to(color, jnp.broadcast_shapes(color.shape, mean.shape))
    return alpha, color, n_flip, feat, d


# ---------------------------------------------------------------------------
# phase 1: DDA cell collection (integer-only traffic)
# ---------------------------------------------------------------------------

def _ray_setup(ray_o, ray_d, grid: Grid, grid_res: int, t_start=None):
    g = grid_res
    bb_max = grid.bb_min + grid.cell_size * g
    inv_d = jnp.where(jnp.abs(ray_d) < 1e-12, INF, 1.0 / ray_d)
    t_lo = (grid.bb_min - ray_o) * inv_d
    t_hi = (bb_max - ray_o) * inv_d
    t0 = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
    t1 = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
    t_enter = jnp.maximum(t0, 1e-6)
    if t_start is not None:
        # re-trace: restart the DDA at the resume point so the crossing
        # budget covers a FRESH traversal window (without this, every
        # segment would re-enumerate the same initial crossings and rays
        # truncated by max_crossings could never make progress)
        t_enter = jnp.maximum(t_enter, t_start)
    hit_box = t1 > t_enter

    p = ray_o + (t_enter[:, None] + 1e-5) * ray_d
    cell = jnp.clip(jnp.floor((p - grid.bb_min) * grid.inv_cell).astype(jnp.int32), 0, g - 1)
    sgn = jnp.where(ray_d >= 0, 1, -1).astype(jnp.int32)
    tdelta = jnp.abs(grid.cell_size * inv_d)
    next_bound = grid.bb_min + (cell + (sgn > 0)).astype(jnp.float32) * grid.cell_size
    tmax = jnp.where(jnp.abs(ray_d) < 1e-12, INF, (next_bound - ray_o) * inv_d)
    return cell, sgn, tdelta, tmax, t_enter, t1, hit_box


def _coarse_scan(ray_o, ray_d, grid: Grid, grid_res: int):
    """Exact loop-free DDA over the coarse occupancy supercells.

    The full coarse traversal is only 3·Gc merged crossings (complete by
    construction — no budget), so it is cheap relative to the fine DDA.
    Returns per-ray (t_first_occ, t_in_seg [R,Sc+1], t_out_seg [R,Sc+1],
    occ_seg [R,Sc+1]):
    * t_first_occ — entry t of the first occupied supercell (INF if the ray
      meets none): every candidate-bearing fine cell lies inside an occupied
      supercell, so the fine DDA can start here and miss nothing.
    * occ_seg/t_out_seg — support `any occupied supercell beyond t` checks
      that clear spurious traversal-incomplete flags.
    """
    g = grid_res
    gc = -(-g // COARSE_FACTOR)
    csize = grid.cell_size * COARSE_FACTOR
    bb_max = grid.bb_min + grid.cell_size * g
    R = ray_o.shape[0]
    Sc = 3 * gc

    inv_d = jnp.where(jnp.abs(ray_d) < 1e-12, INF, 1.0 / ray_d)
    t_lo_a = (grid.bb_min - ray_o) * inv_d
    t_hi_a = (bb_max - ray_o) * inv_d
    t0 = jnp.maximum(jnp.max(jnp.minimum(t_lo_a, t_hi_a), axis=-1), 1e-6)
    t1 = jnp.min(jnp.maximum(t_lo_a, t_hi_a), axis=-1)
    hit_box = t1 > t0

    p = ray_o + (t0[:, None] + 1e-5) * ray_d
    cell0 = jnp.clip(jnp.floor((p - grid.bb_min) / csize).astype(jnp.int32),
                     0, gc - 1)
    sgn = jnp.where(ray_d >= 0, 1, -1).astype(jnp.int32)
    tdelta = jnp.abs(csize * inv_d)
    next_bound = grid.bb_min + (cell0 + (sgn > 0)).astype(jnp.float32) * csize
    tmax = jnp.where(jnp.abs(ray_d) < 1e-12, INF, (next_bound - ray_o) * inv_d)

    k = jnp.arange(gc, dtype=jnp.float32)
    times = (tmax[:, :, None] + k[None, None, :] * tdelta[:, :, None]
             ).reshape(R, Sc)
    axis_lbl = jnp.broadcast_to(
        jnp.arange(3, dtype=jnp.int32)[None, :, None], (R, 3, gc)).reshape(R, Sc)
    # single-operand bit-packed merge (see collect_cells)
    tbits = jax.lax.bitcast_convert_type(jnp.maximum(times, 1e-30), jnp.int32)
    ikey_s = jax.lax.sort((tbits & ~3) | axis_lbl, dimension=-1,
                          is_stable=False)
    t_sorted = jax.lax.bitcast_convert_type(ikey_s & ~3, jnp.float32)
    ax_sorted = ikey_s & 3
    onehot = jax.nn.one_hot(ax_sorted, 3, dtype=jnp.int32)
    steps = jnp.cumsum(onehot, axis=1)
    cells_j = jnp.concatenate(
        [cell0[:, None], cell0[:, None] + sgn[:, None] * steps], axis=1)
    t_in_j = jnp.concatenate([t0[:, None], t_sorted], axis=1)
    t_out_j = jnp.minimum(
        jnp.concatenate([t_sorted, jnp.full((R, 1), INF)], axis=1), t1[:, None])
    in_bounds = jnp.all((cells_j >= 0) & (cells_j < gc), axis=-1)
    seg_valid = in_bounds & hit_box[:, None] & (t_in_j < t_out_j)
    cc = jnp.clip(cells_j, 0, gc - 1)
    cid = (cc[..., 2] * gc + cc[..., 1]) * gc + cc[..., 0]
    occ_seg = (grid.coarse_occ[cid] > 0) & seg_valid       # [R, Sc+1]
    t_first = jnp.min(jnp.where(occ_seg, t_in_j, INF), axis=-1)
    return t_first, t_in_j, t_out_j, occ_seg


def collect_cells(ray_o, ray_d, grid: Grid, cfg: TracerConfig,
                  t_start=None) -> Cells:
    """[R] rays -> Cells: up to max_cells non-empty cells in traversal
    order. Non-differentiable. `t_start` [R] restricts to windows ending
    past it (the re-trace restart point).

    LOOP-FREE: a DDA trajectory is the merge of three arithmetic sequences
    of axis-boundary crossing times, so the entire visited-cell list is one
    [R, 3g] sort plus prefix sums — no `while_loop` (whose per-iteration
    dispatch overhead dominated a sequential implementation on TPU).
    """
    g = cfg.grid_res
    R = ray_o.shape[0]
    C = cfg.max_cells
    k_ax = cfg.max_crossings if cfg.max_crossings > 0 else g
    k_ax = min(k_ax, g)
    S = 3 * k_ax  # merged boundary crossings considered

    # coarse-occupancy scan: (a) skip leading PROVEN-EMPTY span so the
    # crossing budget is spent where matter is; (b) after the DDA, clear the
    # incomplete flag when the span past the horizon is proven empty —
    # without (b) every escaping ray in an open scene is flagged for
    # re-trace by the crossing budget (measured 84% spurious on the bench
    # scene). Both directions are conservative via the dilated map.
    if cfg.coarse_scan:
        t_first_c, _tin_c, tout_c, occ_c = _coarse_scan(ray_o, ray_d, grid, g)
        eps_skip = 1e-4 * jnp.min(grid.cell_size)
        t_skip = jnp.minimum(t_first_c - eps_skip, INF)    # INF when no matter
        if t_start is not None:
            t_start = jnp.maximum(t_start, t_skip)
        else:
            t_start = jnp.maximum(jnp.zeros(R, ray_o.dtype), t_skip)

    cell0, sgn, tdelta, tmax, t_enter, t_exit, hit_box = _ray_setup(
        ray_o, ray_d, grid, g, t_start=t_start)

    # crossing times per axis: tmax_a + k*tdelta_a  -> [R, 3, k_ax]
    k = jnp.arange(k_ax, dtype=jnp.float32)
    times = tmax[:, :, None] + k[None, None, :] * tdelta[:, :, None]
    times = times.reshape(R, S)
    axis_lbl = jnp.broadcast_to(
        jnp.arange(3, dtype=jnp.int32)[None, :, None], (R, 3, k_ax)).reshape(R, S)

    # single-operand merge: crossing times are strictly positive, so their
    # f32 bit patterns order as int32 — pack the axis label into the two
    # mantissa LSBs and sort ONE int32 operand instead of (f32, i32). The
    # 2^-22 relative perturbation of window edges is harmless: windows
    # still PARTITION the traversal (t_out_j == t_in_{j+1}), so every hit
    # is accepted exactly once. (take_along_axis lowers to a pathologically
    # slow serialized gather on this backend; payload sorts are the fast
    # path, and fewer operands are faster still.)
    tbits = jax.lax.bitcast_convert_type(jnp.maximum(times, 1e-30), jnp.int32)
    ikey = (tbits & ~3) | axis_lbl
    ikey_s = jax.lax.sort(ikey, dimension=-1, is_stable=False)
    t_sorted = jax.lax.bitcast_convert_type(ikey_s & ~3, jnp.float32)
    ax_sorted = ikey_s & 3

    # cell after j crossings = cell0 + sgn * (#crossings per axis among first j)
    onehot = jax.nn.one_hot(ax_sorted, 3, dtype=jnp.int32)          # [R, S, 3]
    steps = jnp.cumsum(onehot, axis=1)
    # visited segment j (j = 0..S): cells[j], window [t_in_j, t_out_j)
    cells_j = jnp.concatenate(
        [cell0[:, None], cell0[:, None] + sgn[:, None] * steps], axis=1)  # [R, S+1, 3]
    t_in_j = jnp.concatenate([t_enter[:, None], t_sorted], axis=1)        # [R, S+1]
    t_out_j = jnp.concatenate([t_sorted, jnp.full((R, 1), INF)], axis=1)
    t_out_j = jnp.minimum(t_out_j, t_exit[:, None])

    in_bounds = jnp.all((cells_j >= 0) & (cells_j < g), axis=-1)
    seg_valid = (in_bounds & hit_box[:, None]
                 & (t_in_j < t_out_j) & (t_in_j < t_exit[:, None]))
    # crossing-budget horizon: the budget is PER AXIS, so the enumerated
    # cell sequence is only valid until the FIRST MISSING crossing —
    # min over axes of (tmax_a + k_ax·tdelta_a). Beyond that t the axis
    # that exhausted its budget silently freezes and the derived cells are
    # phantoms (a ray moving fast along one axis drifts a whole cell off —
    # measured as alpha=0-vs-oracle-1 rays on the dense stress scene).
    # Windows are clipped to the horizon and the traversal flagged
    # incomplete so a re-trace resumes there with a fresh DDA.
    horizon = jnp.min(tmax + k_ax * tdelta, axis=-1)
    incomplete = hit_box & (horizon < t_exit)
    if cfg.coarse_scan:
        # coarse completeness: if no occupied supercell's window extends
        # past the horizon, nothing was missed — the traversal is complete
        # even though the crossing budget ended inside the box
        beyond = jnp.any(occ_c & (tout_c > horizon[:, None]), axis=-1)
        incomplete = incomplete & beyond
    t_out_j = jnp.minimum(t_out_j, horizon[:, None])
    seg_valid = seg_valid & (t_in_j < horizon[:, None])
    if t_start is not None:
        # re-trace restart: only windows that end past t_start matter; the
        # entry edge is clipped so hit acceptance starts at the restart point
        seg_valid = seg_valid & (t_out_j > t_start[:, None])
        t_in_j = jnp.maximum(t_in_j, t_start[:, None])
    cc = jnp.clip(cells_j, 0, g - 1)
    cid = (cc[..., 2] * g + cc[..., 1]) * g + cc[..., 0]
    meta = grid.cell_meta[cid]                             # one flat gather
    # zero the meta of invalid/empty segments: the packed word is nonzero
    # iff the segment is a valid non-empty cell (count > 0 lives in the low
    # bits), so (start, count) ride the pack sort as ONE int32 payload
    meta_v = jnp.where(seg_valid & ((meta & _COUNT_MASK) > 0), meta, 0)

    if cfg.select_tiles > 0 and cfg.tiled_direct:
        # DIRECT mode: hand the tiled select the segment list as-is —
        # interior empty segments cost it nothing (zero tiles), so the
        # compaction sort + one-hot einsum below are pure overhead, and
        # with no max_cells cap the crossing-budget horizon becomes the
        # only truncation source
        starts_all, counts_all = unpack_cell_meta(meta_v)
        resume = jnp.where(incomplete, horizon, 0.0)
        return Cells(starts_all, counts_all, t_in_j, t_out_j, incomplete,
                     resume)

    # pack the first max_cells non-empty segments per ray. The sort key IS
    # the segment position, so payloads are redundant: sort ONE operand
    # (4x less sort traffic than carrying meta/t_in/t_out through every
    # compare-exchange pass) and reconstruct the C surviving segments'
    # values with a tiny one-hot einsum from the unsorted arrays.
    nonempty = meta_v != 0
    S1 = meta_v.shape[1]
    pos = jnp.broadcast_to(jnp.arange(S1, dtype=jnp.int32)[None],
                           meta_v.shape)
    BIG = jnp.int32(1 << 30)
    key_s = jax.lax.sort(jnp.where(nonempty, pos, BIG), dimension=-1,
                         is_stable=False)
    if C > S1:                                             # more slots than segments
        key_s = jnp.pad(key_s, ((0, 0), (0, C - S1)), constant_values=1 << 30)
    posC = key_s[:, :C]                                    # [R, C]
    validC = posC < BIG
    onehot = ((jnp.where(validC, posC, -1)[:, :, None]
               == jnp.arange(S1, dtype=jnp.int32)[None, None])
              ).astype(jnp.float32)                        # [R, C, S1]
    starts_all, counts_all = unpack_cell_meta(meta_v)
    # f32-exact: start < 2^21 (pack_cell_meta bound), count < 2^10
    vals = jnp.stack([starts_all.astype(jnp.float32),
                      counts_all.astype(jnp.float32), t_in_j, t_out_j],
                     axis=-1)                              # [R, S1, 4]
    ext = jnp.einsum("rcs,rsv->rcv", onehot, vals)         # [R, C, 4]
    starts_p = ext[..., 0].astype(jnp.int32)
    counts_p = ext[..., 1].astype(jnp.int32)               # 0 on empty slots
    tin_p, tout_p = ext[..., 2], ext[..., 3]
    truncated = (jnp.sum(nonempty.astype(jnp.int32), axis=-1) > C) | incomplete
    resume = jnp.where(incomplete, horizon, 0.0)
    return Cells(starts_p, counts_p, tin_p, tout_p, truncated, resume)


# ---------------------------------------------------------------------------
# phase 2: dense candidate blend (differentiable by JAX AD)
# ---------------------------------------------------------------------------

def _pack_geom(inputs: TraceInputs):
    # one wide 13-float gather instead of five narrow ones: gathers on this
    # backend are per-row latency-bound, so row width is nearly free
    return jnp.concatenate(
        [inputs.means3d, inputs.opacity[:, None], inputs.ru, inputs.rv,
         inputs.normals], axis=-1)                       # [N, 13]


def _pack_prefilter(geom):
    """[7, N] transposed (center ‖ normal ‖ bounding radius) table for the
    tier-1 candidate pre-filter; derived from the packed geometry table
    (mean3 | opacity | ru3 | rv3 | normal3). The radius folds opacity in:
    a plane-intersection point farther than r from the center provably has
    α < α_min (isotropic bound |p_world| ≤ s_max·|p_local|)."""
    su = 1.0 / jnp.maximum(jnp.linalg.norm(geom[:, 4:7], axis=-1), 1e-12)
    sv = 1.0 / jnp.maximum(jnp.linalg.norm(geom[:, 7:10], axis=-1), 1e-12)
    r = bounding_radius(geom[:, 3], jnp.stack([su, sv], -1), 1.0 / 255.0)
    return jnp.concatenate([geom[:, 0:3].T, geom[:, 10:13].T, r[None]],
                           axis=0)


def pack_pair_table(grid: Grid, inputs: TraceInputs, tile: int = 16,
                    bf16: bool = False):
    """Pair-ordered tile-row candidate table (see _pair_tab_from_geom):
    11 components (mean3 | opacity | ru3 | rv3 | bitcast cell id) gathered
    into PAIR order; the surfel normal is recomputed in-lane as normalized
    ru x rv (orientation folded into ru's sign). Built once per
    (grid, params) — the tiled select then reads candidates as whole
    tile rows, never by per-candidate random access."""
    return _pair_tab_from_geom(grid, _pack_geom(inputs), tile, bf16=bf16)


_TAB_COMPS = 11    # mean3 | opacity | ru3 | rv3 | bitcast cell id


def _pair_tab_from_geom(grid: Grid, geom, tile: int = 16, bf16: bool = False):
    """[ceil(P/tile), pad128(11·tile)] TILE-ROW candidate table: tile t's
    row holds the 11 components (mean3 | opacity | ru3 | rv3 | bitcast
    cell id) of pairs [t·tile, (t+1)·tile), component-major, padded to a
    128-lane multiple. The tiled select gathers whole rows — the one
    gather shape this backend runs at full rate, PROVIDED the row width is
    lane-aligned: a gather on 224-float rows measured 40x slower than on
    256-float rows (the (8,128) tiling makes unaligned row starts straddle
    tiles; tools/_prof_gather*). The surfel plane normal is NOT stored:
    the gather is bandwidth-bound at tile=32, and ru x rv (computed
    in-lane, normalized) is the same direction — 3 fewer components cuts
    the row 512 -> 384 floats at tile=32.
    """
    sg = grid.sorted_gauss
    # the build runs EVERY training step (geometry moves): one aligned
    # row-gather from a 128-padded copy of the geometry table instead of
    # 13 per-component element gathers (26M scalar gathers = 385 ms/step
    # at the bench workload; the padded row-gather moves 10x the bytes but
    # runs at the per-row rate — tools/_prof_train_split.py)
    gp = jnp.pad(geom, ((0, 0), (0, 128 - geom.shape[1])))
    rows13 = gp[sg][:, :13]                                # [P, 13]
    # The stored normal (cols 10:13) is camera-flipped (flip_align_view),
    # while ru x rv is the raw frame orientation — the two disagree in sign
    # for ~half the gaussians. Fold the flip into ru's sign: negating ru
    # flips the recomputed cross product to match the stored normal while
    # leaving alpha (pu enters squared) and depth d = -o_g*d_g/d_g^2 (both
    # factors flip) unchanged, so back_culling's d_g test is sign-exact.
    ru, rv, n_st = rows13[:, 4:7], rows13[:, 7:10], rows13[:, 10:13]
    cr = jnp.cross(ru, rv)
    flip = jnp.where(jnp.sum(cr * n_st, axis=-1) < 0.0, -1.0, 1.0)
    rows = jnp.concatenate(
        [rows13[:, 0:4], ru * flip[:, None], rv], axis=-1)  # [P, 10]
    if bf16:
        # bf16 halves the bandwidth-bound row gather. Means are stored
        # CELL-RELATIVE (|rel| <= dilated radius + cell/2), keeping the
        # absolute bf16 quantization ~cell_size * 2^-9 instead of
        # scene_extent * 2^-9; the select reconstructs mean = rel + center
        # from the pair's cell id. The cell id rides as its raw int32 bits
        # bitcast into two bf16 lanes (pure data movement, bit-preserving).
        g = grid.cell_meta.shape[0]
        gres = round(g ** (1 / 3))
        while gres ** 3 < g:
            gres += 1
        cid = grid.sorted_cell
        cz, rem = cid // (gres * gres), cid % (gres * gres)
        cy, cx = rem // gres, rem % gres
        cell = jnp.stack([cx, cy, cz], axis=-1).astype(jnp.float32)
        center = grid.bb_min[None] + (cell + 0.5) * grid.cell_size[None]
        rel = rows[:, 0:3] - center
        geo16 = jnp.concatenate([rel, rows[:, 3:10]],
                                axis=-1).astype(jnp.bfloat16)   # [P, 10]
        cid16 = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(cid, jnp.uint16), jnp.bfloat16)
        tab = jnp.concatenate([geo16, cid16], axis=-1)          # [P, 12]
    else:
        cellf = jax.lax.bitcast_convert_type(grid.sorted_cell, jnp.float32)
        tab = jnp.concatenate([rows, cellf[:, None]], axis=-1)  # [P, 11]
    P = tab.shape[0]
    pad = (-P) % tile
    tab = jnp.pad(tab, ((0, pad), (0, 0)))
    T = (P + pad) // tile
    nc = tab.shape[1]
    tab = tab.reshape(T, tile, nc).transpose(0, 2, 1).reshape(T, nc * tile)
    wpad = (-(nc * tile)) % 128
    return jnp.pad(tab, ((0, 0), (0, wpad))) if wpad else tab


def select_hits_tiled(ray_o, ray_d, grid: Grid, cells: Cells, pair_tab,
                      cfg: TracerConfig, back_culling: bool,
                      t_start=None, cand_skip=None) -> SelectedHits:
    """Tiled hit selection: examine candidates in `cfg.tile`-wide contiguous
    blocks of the pair table (cfg.select_tiles blocks per ray), exact hit
    math on all lanes, dedup by hit-cell == pair-cell, then one
    (depth, pair-pos) two-key sort keeps the nearest hit_budget hits with
    the oracle's stable tie order (pair pos is gaussian-id-ordered within a
    cell). ≙ the OptiX anyhit k-buffer (gaussiantrace_forward.cu:120-141)
    with the BVH's "only true intersections" property traded for cheap
    dense lane tests on contiguous memory.

    `cand_skip` counts TILES of the first recorded cell already examined by
    the previous segment (tile-unit analog of select_hits' candidate skip).
    """
    TILE = cfg.tile
    ST = cfg.select_tiles
    S1 = ST * TILE
    R, C = cells.starts.shape
    P = grid.sorted_gauss.shape[0]
    kb = cfg.hit_budget
    g = cfg.grid_res

    starts, counts, tout = cells.starts, cells.counts, cells.tout
    if cand_skip is not None:
        # skip whole ALIGNED tiles of the FIRST NON-EMPTY cell (examined
        # last segment); the residue start % TILE is unchanged, so tile
        # chaining is exact. Masked form: in direct (unpacked) mode the
        # first non-empty segment can sit at any index.
        ne = counts > 0
        fne = ne & (jnp.cumsum(ne.astype(jnp.int32), axis=-1) == 1)  # [R, C]
        s0 = jnp.sum(jnp.where(fne, starts, 0), axis=-1)
        c0 = jnp.sum(jnp.where(fne, counts, 0), axis=-1)
        skip0 = jnp.minimum(cand_skip, (s0 % TILE + c0 + TILE - 1) // TILE)
        adv = jnp.minimum(skip0 * TILE - s0 % TILE * (skip0 > 0), c0)
        adv = jnp.maximum(adv, 0)
        starts = jnp.where(fne, starts + adv[:, None], starts)
        counts = jnp.where(fne, counts - adv[:, None], counts)

    # ALIGNED tile cover of each cell's pair range [start, start+count):
    # first tile = start//TILE, lanes outside the range masked per element —
    # no padded table, no scatter, and every gathered row is tile-aligned
    tcnt = jnp.where(counts > 0,
                     (starts % TILE + counts + TILE - 1) // TILE, 0)
    cumT = jnp.cumsum(tcnt, axis=-1)                      # [R, C]
    exclT = cumT - tcnt
    s = jnp.arange(ST, dtype=jnp.int32)[None]             # [1, ST]
    cidx = jnp.zeros((R, ST), jnp.int32)
    for c in range(C):
        cidx = cidx + (cumT[:, c:c + 1] <= s).astype(jnp.int32)

    def take_rc(x):
        out = jnp.broadcast_to(x[:, C - 1:C], cidx.shape)
        for c in range(C - 1):
            out = jnp.where(cidx == c, x[:, c:c + 1], out)
        return out

    tt = s - take_rc(exclT)                               # tile within cell
    start_c = take_rc(starts)
    count_c = take_rc(counts)
    row_idx = start_c // TILE + tt                        # [R, ST] table row
    tile_valid = (s < cumT[:, -1:]) & (cidx < C)
    n_rows = pair_tab.shape[0]
    row_idx = jnp.where(tile_valid, jnp.minimum(row_idx, n_rows - 1), 0)

    # ONE row gather: [R, ST] tile rows of pad128(11·TILE) floats
    # (12·TILE bf16 lanes when the table is bf16)
    if cfg.pallas_gather:
        from irgs_tpu.ops.gather_pallas import gather_rows
        rows = gather_rows(pair_tab, row_idx.reshape(-1),
                           inflight=cfg.pallas_gather
                           ).reshape(R, ST, pair_tab.shape[1])
    else:
        rows = pair_tab[row_idx]                   # [R, ST, pad128(nc*TILE)]
    if pair_tab.dtype == jnp.bfloat16:
        nc = _TAB_COMPS + 1                        # 10 geom + 2 cid lanes
        blocks = rows[..., :nc * TILE].reshape(R, ST, nc, TILE)
        pair_cid = jax.lax.bitcast_convert_type(
            blocks[:, :, 10:12, :].transpose(0, 1, 3, 2),
            jnp.int32).reshape(R, S1)
        cols = [blocks[:, :, i, :].reshape(R, S1).astype(jnp.float32)
                for i in range(10)]
        # means are stored cell-relative: reconstruct mean = rel + center
        # of the PAIR's cell (f32 center — only the residual paid bf16)
        pcz, prem = pair_cid // (g * g), pair_cid % (g * g)
        pcy, pcx = prem // g, prem % g
        cols[0] = cols[0] + (grid.bb_min[0]
                             + (pcx.astype(jnp.float32) + 0.5)
                             * grid.cell_size[0])
        cols[1] = cols[1] + (grid.bb_min[1]
                             + (pcy.astype(jnp.float32) + 0.5)
                             * grid.cell_size[1])
        cols[2] = cols[2] + (grid.bb_min[2]
                             + (pcz.astype(jnp.float32) + 0.5)
                             * grid.cell_size[2])
        # conservative screen: accepting at half the threshold absorbs the
        # typical bf16 rounding depression of a true alpha_min hit, and the
        # blend re-tests survivors with exact f32 alpha (blend_hits).
        # CAVEAT: the cell-relative mean quantization (~cell_size * 2^-9
        # absolute) maps to O(1) error in the Mahalanobis coords pu/pv for
        # gaussians much SMALLER than a grid cell, where a true hit can
        # still fall below alpha_min/2 (and the hit-cell dedup can flip
        # near cell boundaries) — validated only on the dense stress scene;
        # default-off (config.tracer_table_bf16) pending validation on a
        # trained small-gaussian scene.
        accept_min = cfg.alpha_min * 0.5
    else:
        nc = _TAB_COMPS
        blocks = rows[..., :nc * TILE].reshape(R, ST, nc, TILE)
        cols = [blocks[:, :, i, :].reshape(R, S1) for i in range(nc - 1)]
        pair_cid = jax.lax.bitcast_convert_type(
            blocks[:, :, nc - 1, :], jnp.int32).reshape(R, S1)
        accept_min = cfg.alpha_min
    lane = jnp.arange(TILE, dtype=jnp.int32)[None, None]  # [1, 1, TILE]
    pos3 = row_idx[:, :, None] * TILE + lane              # global pair pos
    lane_valid = (tile_valid[:, :, None]
                  & (pos3 >= start_c[:, :, None])
                  & (pos3 < (start_c + count_c)[:, :, None])).reshape(R, S1)

    alpha, d, d_g = _hit_geom_cols10(cols, ray_o, ray_d)
    # hit-cell dedup: the hit point's cell always contains the gaussian's
    # pair (insertion is radius-dilated), so each true hit is accepted from
    # EXACTLY one pair — no per-candidate window tests, no tolerance
    hx = jnp.clip(jnp.floor((ray_o[:, 0:1] + d * ray_d[:, 0:1]
                             - grid.bb_min[0]) * grid.inv_cell[0]
                            ).astype(jnp.int32), 0, g - 1)
    hy = jnp.clip(jnp.floor((ray_o[:, 1:2] + d * ray_d[:, 1:2]
                             - grid.bb_min[1]) * grid.inv_cell[1]
                            ).astype(jnp.int32), 0, g - 1)
    hz = jnp.clip(jnp.floor((ray_o[:, 2:3] + d * ray_d[:, 2:3]
                             - grid.bb_min[2]) * grid.inv_cell[2]
                            ).astype(jnp.int32), 0, g - 1)
    hcid = (hz * g + hy) * g + hx
    accept = (lane_valid & (alpha >= accept_min) & (d > 1e-6)
              & (hcid == pair_cid))
    if t_start is not None:
        accept = accept & (d > t_start[:, None])
    # traversal-incomplete horizon: hits past the resume point belong to the
    # NEXT segment (its restarted DDA re-records their cells), else a
    # re-trace with t_start at the horizon would re-blend them
    accept = accept & (d < jnp.where(cells.resume > 0, cells.resume,
                                     INF)[:, None])
    if back_culling:
        accept = accept & (d_g < 0)

    pair_pos = pos3.reshape(R, S1)
    d_key = jnp.where(accept, d, INF)
    n_accepted = jnp.sum(accept, axis=-1)
    # --- tile-budget bookkeeping (needed BEFORE the k-buffer extraction:
    # the partial-cell blend cap below filters the kept hits) -------------
    more = ((n_accepted > kb)
            | (cumT[:, -1] > ST)
            | cells.truncated)
    fully = (cumT <= ST) & (counts > 0)
    tout_frontier = jnp.max(jnp.where(fully, tout, 0.0), axis=-1)
    all_ex = cumT[:, -1] <= ST
    frontier = jnp.where(all_ex,
                         jnp.maximum(tout_frontier, cells.resume),
                         tout_frontier)
    overflowed = n_accepted > kb
    nT_before = jnp.max(jnp.where(fully, cumT, 0), axis=-1)
    # budget died MID-CELL (some cells fully examined, one partial): within
    # a cell, pair order is gaussian-id order, NOT depth order, so the
    # partial cell's unexamined suffix can hold hits NEARER than t_last —
    # resuming acceptance at t_last would lose them forever (measured:
    # 2/256 dense-stress rays under-blended at tile=32). Exact rule:
    #  * keep this round's hits and resume at t_last ONLY when the k-buffer
    #    overflowed before the frontier (everything dropped is >= t_last,
    #    and every unexamined-suffix hit is >= frontier >= t_last);
    #  * otherwise blend ONLY hits from fully-examined cells (d < frontier
    #    — when not overflowed nothing below the frontier was dropped, and
    #    when overflowed with t_last > frontier every accepted d < frontier
    #    hit is among the kb nearest) and resume collection AND acceptance
    #    at the frontier; the partial cell re-runs whole next round.
    if cfg.select_topk:
        # only the kb nearest survive, so a top-k beats sorting all S1
        # lanes. top_k is stable (equal keys -> lower index first) and
        # pair_pos increases along the lane axis, so EXACT depth ties keep
        # the oracle's gaussian-id order, same as the two-key sort below.
        bits = jax.lax.bitcast_convert_type(d_key, jnp.int32)  # d>0 ⇒ monotone
        negk, idx = jax.lax.top_k(jnp.int32(0x7FFFFFFF) - bits, kb)
        d_kb = jax.lax.bitcast_convert_type(jnp.int32(0x7FFFFFFF) - negk,
                                            jnp.float32)
        # extract pair_pos at idx via one-hot matmul (take_along_axis
        # serializes on this backend; pair positions < 2^24 are f32-exact)
        oh = (idx[:, :, None] == jnp.arange(S1, dtype=jnp.int32)[None, None]
              ).astype(jnp.float32)
        pos_kb = jnp.einsum("rks,rs->rk", oh,
                            pair_pos.astype(jnp.float32)).astype(jnp.int32)
        valid_kb = d_kb < INF
        gs_kb = grid.sorted_gauss[jnp.clip(pos_kb, 0, P - 1)]
    else:
        d_s, pos_s = jax.lax.sort((d_key, pair_pos), num_keys=2,
                                  dimension=-1, is_stable=False)
        d_kb = d_s[:, :kb]
        valid_kb = d_kb < INF
        gs_kb = grid.sorted_gauss[jnp.clip(pos_s[:, :kb], 0, P - 1)]
    t_last_raw = jnp.max(jnp.where(valid_kb, d_kb, 0.0), axis=-1)

    # Exact partial-cell handling. The returned t_last is the ACCEPTANCE
    # WATERMARK (the re-trace accepts only d just past it), so it must
    # never exceed a depth below which everything has been examined AND
    # blended:
    #  * keep this round's hits and resume at t_last_raw when the k-buffer
    #    overflowed at or before the frontier — everything dropped is
    #    >= t_last_raw, and every unexamined-suffix hit of the partial
    #    cell is >= frontier >= t_last_raw;
    #  * otherwise, when the budget died mid-cell (part), blend ONLY hits
    #    from fully-examined cells (d < frontier: when not overflowed
    #    nothing below the frontier was dropped, and when overflowed with
    #    t_last_raw > frontier every accepted d < frontier hit is among
    #    the kb nearest) — the partial cell re-runs whole next round;
    #  * when a SINGLE cell exceeds the whole tile budget (starv), blend
    #    the examined prefix but keep the watermark at the incoming
    #    t_start so the unexamined suffix (pair order is gaussian-id
    #    order, not depth order — suffix hits can be NEARER than
    #    t_last_raw) is never skipped; cand_skip chains the prefix tiles.
    #    (If the k-buffer ALSO overflowed there, fixed capacity forces the
    #    lossy t_last_raw resume — dropped prefix hits win over suffix.)
    part = ~all_ex & (nT_before > 0)
    starv = ~all_ex & (nT_before == 0)
    keep_all = ~part | (overflowed & (t_last_raw <= frontier))
    valid_kb = valid_kb & (keep_all[:, None] | (d_kb < frontier[:, None]))
    t_last_blend = jnp.max(jnp.where(valid_kb, d_kb, 0.0), axis=-1)
    t_in0 = (t_start if t_start is not None
             else jnp.zeros_like(t_last_raw))
    t_last = jnp.where(all_ex | (part & keep_all) | (starv & overflowed),
                       t_last_raw,
                       jnp.where(part, t_last_blend, t_in0))
    t_cell = jnp.where(
        all_ex,
        jnp.where(overflowed, t_last_raw, jnp.maximum(t_last_raw, frontier)),
        jnp.where(part,
                  jnp.where(keep_all, t_last_raw, frontier),
                  jnp.where(overflowed, t_last_raw, t_in0)))
    skip_next = jnp.where(starv & ~overflowed, ST, 0)
    if cand_skip is not None:
        skip_next = skip_next + jnp.where(starv & ~overflowed, skip0, 0)
    return SelectedHits(gs_kb, valid_kb, t_last, t_cell, more, skip_next)


def select_hits(ray_o, ray_d, sorted_gauss, cells: Cells, geom,
                cfg: TracerConfig, back_culling: bool,
                t_start=None, cand_skip=None, prefilt=None,
                grid=None, pair_tab=None) -> SelectedHits:
    """Index-only hit selection: expand recorded cells into candidates,
    evaluate acceptance, depth-sort, keep the nearest `hit_budget` hits.

    Non-differentiable by design — the backward pass replays a FIXED hit
    list, exactly like the CUDA backward raygen re-traverses the forward's
    hits (gaussiantrace_backward.cu:11-171). Callers run this once outside
    the AD region (analogous to collect_cells), so the expensive 48-wide
    candidate expansion, gather, and sort never appear in the backward.

    TWO-TIER mode (cfg.prefilter_width > max_hits): candidates are first
    enumerated at the wide prefilter width and screened by a CHEAP
    conservative test on a 4-float transposed table — ray-line distance vs
    the bounding radius, plus window overlap of the possible depth range
    [proj−r, proj+r]. A candidate failing it provably has α < α_min, so
    rejection is exact. Survivors are compacted (single-operand sort of
    enumeration indices) into the narrow `max_hits` slots that pay the full
    13-float gather + exact hit math. This decouples "candidates examined
    per segment" (set by acceptance density: ~2% in candidate-rich cells,
    where an OptiX BVH reports only true intersections —
    gaussiantrace_forward.cu:120-141) from the exact-test width.

    `t_start` [R]: only accept hits strictly past it (re-trace restart).
    `cand_skip` [R]: skip that many candidates of the FIRST recorded cell
    (they were examined by the previous segment; TILES in tiled mode).
    """
    if cfg.select_tiles > 0:
        assert grid is not None, "tiled select needs the grid"
        if pair_tab is None:
            pair_tab = _pair_tab_from_geom(grid, geom, cfg.tile,
                                           bf16=cfg.table_bf16)
        return select_hits_tiled(ray_o, ray_d, grid, cells, pair_tab, cfg,
                                 back_culling, t_start=t_start,
                                 cand_skip=cand_skip)
    starts, counts, tin, tout = (cells.starts, cells.counts,
                                 cells.tin, cells.tout)
    if cand_skip is not None:
        skip0 = jnp.minimum(cand_skip, counts[:, 0])
        starts = starts.at[:, 0].add(skip0)
        counts = counts.at[:, 0].add(-skip0)
    R, C = starts.shape
    H2 = cfg.max_hits                                     # exact-test width
    H1 = max(cfg.prefilter_width, H2)                     # enumeration width
    two_tier = H1 > H2
    BIG = jnp.int32(1 << 30)

    cum = jnp.cumsum(counts, axis=-1)                     # [R, C]
    excl = cum - counts

    def expand(h):
        """candidate h -> (cell idx, pair pos, window, valid); h [1, W].
        cidx built by an unrolled loop over the small static C axis — a
        [R, W, C] one-hot cube is gigabytes at wide W, and take_along_axis
        lowers to a pathologically slow gather on this backend."""
        cidx = jnp.zeros((R, h.shape[1]), jnp.int32)
        for c in range(C):
            cidx = cidx + (cum[:, c:c + 1] <= h).astype(jnp.int32)

        def take_rc(x):
            out = jnp.broadcast_to(x[:, C - 1:C], cidx.shape)
            for c in range(C - 1):
                out = jnp.where(cidx == c, x[:, c:c + 1], out)
            return out

        offset = h - take_rc(excl)
        pos = take_rc(starts) + offset
        valid = (h < cum[:, -1:]) & (cidx < C) & (offset < take_rc(counts))
        pos = jnp.clip(pos, 0, sorted_gauss.shape[0] - 1)
        return pos, valid, take_rc(tin), take_rc(tout)

    h1 = jnp.arange(H1, dtype=jnp.int32)[None]            # [1, H1]
    pos1, valid1, tin1, tout1 = expand(h1)
    gs1 = sorted_gauss[pos1]

    if two_tier:
        if prefilt is None:
            prefilt = _pack_prefilter(geom)
        # tier 1: cheap conservative screen on the [7, N] table, candidate
        # axis in lanes (wide widths pad 10x+ under row layout). EXACT plane
        # intersection + isotropic radius bound: the ray-LINE distance alone
        # is far too loose for oblique rays (the plane hit lands much
        # farther than the line-closest point — measured ~30% tier-1 pass
        # vs ~2% true acceptance on the dense stress scene).
        # per-component flat 1-D gathers: a fused [7, M] gather materializes
        # index-major [M, 7] and tile-pads 7 -> 128 lanes (25 GB at eval
        # widths); seven [M] gathers reshape to [R, H1] with H1 in lanes
        flat = gs1.reshape(-1)
        c7 = [prefilt[i][flat].reshape(R, H1) for i in range(7)]
        ox, oy, oz = ray_o[:, 0:1], ray_o[:, 1:2], ray_o[:, 2:3]
        dx, dy, dz = ray_d[:, 0:1], ray_d[:, 1:2], ray_d[:, 2:3]
        nx, ny, nz = c7[3], c7[4], c7[5]
        r_b = c7[6]
        o_g = nx * (ox - c7[0]) + ny * (oy - c7[1]) + nz * (oz - c7[2])
        d_g = nx * dx + ny * dy + nz * dz
        d1 = -o_g * d_g / jnp.maximum(1e-6, d_g * d_g)    # same formula as
        px = ox + d1 * dx - c7[0]                         # _hit_geom_cols
        py = oy + d1 * dy - c7[1]
        pz = oz + d1 * dz - c7[2]
        q2 = px * px + py * py + pz * pz
        # window test with a small tolerance: tier-2 recomputes d in a
        # different op order; the slack keeps edge-of-window candidates from
        # being rejected here while the partition logic assumes tier-2 saw
        # them (the duplicate in the neighboring cell covers the hit)
        tol = 1e-4 * (tout1 - tin1)
        pass1 = (valid1 & (q2 <= r_b * r_b)
                 & (d1 >= tin1 - tol) & (d1 < tout1 + tol))
        if t_start is not None:
            pass1 = pass1 & (d1 > t_start[:, None] - tol)
        # compact survivors: single-operand sort of enumeration indices
        key1 = jnp.where(pass1, jnp.broadcast_to(h1, pass1.shape), BIG)
        key_s = jax.lax.sort(key1, dimension=-1, is_stable=False)
        h_s = key_s[:, :H2]                               # [R, H2]
        valid2 = h_s < BIG
        # examined-candidate count E: everything before the first UNTESTED
        # survivor was either conclusively tier-1-rejected or exactly tested
        E = jnp.where(key_s[:, H2] < BIG, key_s[:, H2], H1)
        pos2, _, t_in_h, t_out_h = expand(jnp.where(valid2, h_s, 0))
        gs = sorted_gauss[pos2]
    else:
        gs, valid2, t_in_h, t_out_h = gs1, valid1, tin1, tout1
        E = jnp.full((R,), H1, jnp.int32)

    # candidate geometry gather. Narrow width: plain row gather [R, H2, 13]
    # (fastest; tile padding is tolerable). Wide (single-tier eval configs):
    # the row layout pads 10x under (8,128) tiling — gigabytes — so gather
    # transposed [13, R, H2] with the candidate axis in lanes instead.
    if H2 <= 64:
        rows_g = geom[gs]                                 # [R, H2, 13]
        cols = jnp.moveaxis(rows_g, -1, 0)
    else:
        geom_t = geom.T                                   # [13, N]
        cols = geom_t[:, gs.reshape(-1)].reshape(13, *gs.shape)
    alpha, d, d_dot_n = _hit_geom_cols(cols, ray_o, ray_d)
    accept = (valid2 & (alpha >= cfg.alpha_min)
              & (d >= jnp.maximum(t_in_h, 1e-6)) & (d < t_out_h))
    if t_start is not None:
        accept = accept & (d > t_start[:, None])
    if back_culling:
        accept = accept & (d_dot_n < 0)

    # depth sort: one multi-operand lax.sort carrying payloads (fast native
    # TPU sort) instead of argsort + take_along_axis
    d_key = jnp.where(accept, d, INF)
    d_s, gs_s, acc_s = jax.lax.sort(
        (d_key, gs, accept.astype(jnp.int32)),
        num_keys=1, dimension=-1, is_stable=False)
    # k-buffer: keep only the nearest hit_budget accepted hits (rejected
    # candidates sorted to the end); T saturates within ~16 hits anyway
    kb = min(cfg.hit_budget, H2)
    valid_kb = acc_s[:, :kb] > 0
    # re-trace metadata: restart points + was anything dropped?
    n_accepted = jnp.sum(accept, axis=-1)
    t_last = jnp.max(jnp.where(valid_kb, d_s[:, :kb], 0.0), axis=-1)
    more = ((n_accepted > kb)
            | (cum[:, -1] > E)      # candidate examination truncated
            | cells.truncated)      # recorded-cell list truncated
    # collection frontier: the exit t of the last cell whose candidates all
    # fit within the per-ray examined width E — those cells are fully
    # examined and the next segment can skip them. When the k-buffer
    # overflowed, dropped accepted hits may live inside examined cells, so
    # the frontier must stay at t_last (their windows still overlap it).
    fully_examined = (cum <= E[:, None]) & (counts > 0)
    tout_frontier = jnp.max(jnp.where(fully_examined, tout, 0.0), axis=-1)
    # when every recorded candidate was examined, the resume point may jump
    # to the traversal horizon (covers crossing-budget truncation with few
    # or zero recorded cells)
    all_examined = cum[:, -1] <= E
    frontier = jnp.where(all_examined,
                         jnp.maximum(tout_frontier, cells.resume),
                         tout_frontier)
    overflowed = n_accepted > kb
    t_cell = jnp.where(overflowed, t_last, jnp.maximum(t_last, frontier))
    # candidates of the partially-examined cell at the frontier already
    # consumed: E minus the candidates of the fully-examined cells. In
    # overflow mode the re-trace must re-visit examined cells (dropped
    # accepted hits live there), so nothing is skipped.
    n_before = jnp.max(jnp.where(fully_examined, cum, 0), axis=-1)
    skip_next = jnp.where(overflowed | all_examined, 0,
                          jnp.maximum(E - n_before, 0))
    # ... and only valid while the frontier cell is first in the re-collect,
    # i.e. when no accepted hit moved t_cell past the frontier
    skip_next = jnp.where(t_cell > frontier, 0, skip_next)
    if cand_skip is not None:
        # offsets chain across segments while the FIRST cell stays partial
        # (no cell fully examined this pass ⇒ frontier did not advance)
        same_cell = ~overflowed & ~all_examined & (n_before == 0)
        skip_next = skip_next + jnp.where(same_cell, skip0, 0)
    return SelectedHits(gs_s[:, :kb], valid_kb, t_last, t_cell, more,
                        skip_next)


def blend_hits(ray_o, ray_d, inputs: TraceInputs, gs_s, valid_s,
               cfg: TracerConfig, sh_deg: int, t0=None):
    """Differentiable front-to-back blend of a pre-selected, depth-ordered
    hit list (≙ the per-hit accumulation of gaussiantrace_forward.cu:61-97;
    its backward — deterministic scatter-adds at k-buffer width — comes from
    plain JAX AD). Gradients flow to every TraceInputs field and ray o/d.

    `t0` [R]: incoming transmittance carried from the previous segment
    (differentiable — the segment products chain exactly as the CUDA
    raygen's single running T does)."""
    n_coeff = (sh_deg + 1) ** 2
    n = inputs.means3d.shape[0]
    # ONE fused per-gaussian table gather (geometry ‖ SH ‖ features): row
    # gathers are per-row latency-bound on this backend, so one wide gather
    # beats three narrow ones 3x in the forward AND its VJP scatter
    sh_flat = inputs.shs[:, :n_coeff].reshape(n, n_coeff * 3)
    table = jnp.concatenate([_pack_geom(inputs), sh_flat, inputs.features],
                            axis=-1)
    # lane-align the fused rows: a gather on rows that straddle (8,128)
    # tiles collapses up to 40x (tools/_prof_gather.py; same fix as the
    # pair table) — and the VJP's row-scatter is alignment-bound too
    wpad = (-table.shape[1]) % 128
    if wpad:
        table = jnp.pad(table, ((0, 0), (0, wpad)))
    rows = table[gs_s]                                    # [R, kb, pad128]
    geom_g = rows[..., 0:13]
    sh_g = rows[..., 13:13 + 3 * n_coeff].reshape(
        gs_s.shape + (n_coeff, 3))
    feat = rows[..., 13 + 3 * n_coeff:
                13 + 3 * n_coeff + inputs.features.shape[-1]]
    alpha, n_flip, d = _hit_geom(
        geom_g[..., 0:3], geom_g[..., 3], geom_g[..., 4:7], geom_g[..., 7:10],
        geom_g[..., 10:13], ray_o[:, None], ray_d[:, None])
    # exact alpha_min re-test (≙ the anyhit's alpha_min skip,
    # gaussiantrace.h): a no-op after the f32 select, but the bf16-table
    # select is a CONSERVATIVE screen whose false accepts land here
    alpha = jnp.where(valid_s & (alpha >= cfg.alpha_min), alpha, 0.0)

    lg = jnp.log1p(-alpha)
    T_in = jnp.exp(jnp.cumsum(lg, -1) - lg)
    if t0 is not None:
        T_in = T_in * t0[:, None]
    w = alpha * T_in
    # CUDA stops accumulating once T < transmittance_min
    # (gaussiantrace_forward.cu:95-97)
    w = jnp.where(T_in > cfg.transmittance_min, w, 0.0)

    basis = _sh_basis(sh_deg, ray_d)                      # [R, C_sh]
    color = jnp.maximum(
        jnp.einsum("rc,rhcd->rhd", basis, sh_g) + 0.5, 0.0)

    trans = jnp.exp(jnp.sum(lg, -1))
    if t0 is not None:
        trans = trans * t0
    return TraceOut(
        color=jnp.einsum("rh,rhd->rd", w, color),
        normal=jnp.einsum("rh,rhd->rd", w, n_flip),
        feature=jnp.einsum("rh,rhs->rs", w, feat),
        depth=jnp.sum(w * d, -1),
        alpha=jnp.sum(w, -1),
        trans=trans,
    )


def merge_oversize(gs, valid, more, t_last, ro, rd, geom, grid: Grid,
                   cfg: TracerConfig, back_culling: bool, t_lo=None):
    """Depth-merge the grid-EXCLUDED oversize gaussians (Grid.oversize_ids,
    floor/sky surfels spanning > span_cap cells) into a selected hit list
    before the blend — the grid rebuild's answer to OptiX's native support
    for arbitrary-extent proxies (surfel_tracer/src/bvh.cu:69-160).

    Exactness across segmented re-trace: each round accepts oversize hits
    in the window (t_lo, bound(t_hi)], where t_hi is the round's GRID
    watermark while more grid matter may exist (more=True) and INF once
    the traversal is exhausted, and bound() is the same t_last*(1+1e-5) +
    1e-6 formula the next round's acceptance restart uses — so round
    windows exactly partition the ray and every oversize hit is blended
    exactly once, in global depth order. No-op (identity) when
    oversize_cap == 0."""
    K = grid.oversize_ids.shape[0]
    if K == 0:
        return gs, valid
    ro = jax.lax.stop_gradient(ro)
    rd = jax.lax.stop_gradient(rd)
    ov = grid.oversize_ids
    ok = ov >= 0
    rows = geom[jnp.maximum(ov, 0)]                          # [K, 13]
    alpha, _nf, d = _hit_geom(
        rows[None, :, 0:3], rows[None, :, 3], rows[None, :, 4:7],
        rows[None, :, 7:10], rows[None, :, 10:13], ro[:, None], rd[:, None])
    v = ok[None] & (alpha >= cfg.alpha_min) & (d > 1e-6)
    if back_culling:
        d_g = jnp.sum(rows[None, :, 10:13] * rd[:, None], -1)
        v = v & (d_g < 0)
    t_hi = jnp.where(more, t_last, INF)
    if t_lo is not None:
        v = v & (d > t_lo[:, None])
    v = v & (d <= t_hi[:, None] * (1.0 + 1e-5) + 1e-6)
    # existing hits' depths recomputed from geometry (small [R, kb] gather,
    # only compiled when oversize_cap > 0)
    rows_e = geom[gs]                                        # [R, kb, 13]
    _, _, d_e = _hit_geom(
        rows_e[..., 0:3], rows_e[..., 3], rows_e[..., 4:7],
        rows_e[..., 7:10], rows_e[..., 10:13], ro[:, None], rd[:, None])
    R = gs.shape[0]
    gs_all = jnp.concatenate(
        [gs, jnp.broadcast_to(jnp.maximum(ov, 0)[None], (R, K))], axis=-1)
    v_all = jnp.concatenate([valid, v], axis=-1)
    d_all = jnp.concatenate(
        [jnp.where(valid, d_e, INF), jnp.where(v, d, INF)], axis=-1)
    # (depth, gaussian id) two-key sort = the oracle's stable tie order
    _, gs_s, v_s = jax.lax.sort((d_all, gs_all, v_all.astype(jnp.int32)),
                                dimension=-1, num_keys=2)
    return gs_s, v_s.astype(bool)


def trace(ray_o, ray_d, grid: Grid, inputs: TraceInputs, *, cfg: TracerConfig,
          sh_deg: int, back_culling: bool = False,
          cells=None, hits=None) -> TraceOut:
    """Differentiable trace of [R, 3] rays. Gradients flow to every
    TraceInputs field and to ray origins/directions (≙ _GaussianTrace,
    surfel_tracer/raytracer.py:5-66) through plain JAX AD of the dense
    k-buffer blend. Cell collection and hit selection are index-only and
    detached; callers that chunk the ray axis should precompute `cells`
    (and optionally `hits` = (gs_s, valid_s) from select_hits) once outside
    the differentiated loop — see render/ir.make_trace_fn."""
    geom = None
    if hits is None:
        ro = jax.lax.stop_gradient(ray_o)
        rd = jax.lax.stop_gradient(ray_d)
        if cells is None:
            cells = collect_cells(ro, rd, grid, cfg)
        geom = jax.lax.stop_gradient(_pack_geom(inputs))
        hits = select_hits(ro, rd, grid.sorted_gauss, cells, geom, cfg,
                           back_culling, grid=grid)
    gs, valid = hits.gs, hits.valid
    if grid.oversize_ids.shape[0] > 0:
        if geom is None:
            geom = jax.lax.stop_gradient(_pack_geom(inputs))
        gs, valid = merge_oversize(gs, valid, hits.more, hits.t_last,
                                   ray_o, ray_d, geom, grid, cfg,
                                   back_culling)
    return blend_hits(ray_o, ray_d, inputs, gs, valid, cfg, sh_deg)


def retrace_pass(out: TraceOut, hits: SelectedHits, ray_o, ray_d, grid: Grid,
                 inputs: TraceInputs, cfg: TracerConfig, sh_deg: int,
                 capacity: int, back_culling: bool = False, pair_tab=None):
    """One compacted re-trace round (≙ the CUDA raygen's next k-buffer
    segment, gaussiantrace_forward.cu:27-103).

    Rays still transmissive (T > transmittance_min) whose hit list was
    truncated get gathered into a fixed `capacity`-sized batch, traced again
    from just past their last blended hit with the carried transmittance,
    and scatter-added back. Returns (out', hits' with updated t_last/more).
    The carried T is differentiable, so gradients chain across segments
    exactly as through the reference's single running product.
    """
    ro = jax.lax.stop_gradient(ray_o)
    rd = jax.lax.stop_gradient(ray_d)
    need = hits.more & (jax.lax.stop_gradient(out.trans)
                        > cfg.transmittance_min)
    if cfg.adaptive:
        # CAPACITY LADDER: run the round at the smallest precompiled
        # capacity that fits the actual demand (lax.switch executes ONE
        # branch on TPU). Result-identical to always running at full
        # capacity: top_k compaction places every needy ray before the
        # padding slots, and padding contributions are `picked`-masked to
        # zero — capacity beyond the need count is pure wasted compute.
        # Rung 0 skips the round entirely (≙ the old any(need) cond).
        rungs = sorted({max(1024, capacity // 16),
                        max(1024, capacity // 4), capacity})
        rungs = [c for c in rungs if c <= capacity] or [capacity]

        def make_branch(c):
            def _run(_):
                return _retrace_body(out, hits, need, ray_o, ray_d, grid,
                                     inputs, cfg, sh_deg, c, back_culling,
                                     pair_tab=pair_tab)
            return _run

        branches = [lambda _: (out, hits)] + [make_branch(c) for c in rungs]
        n_need = jnp.sum(need)
        sel = (n_need > 0).astype(jnp.int32)
        for c in rungs[:-1]:
            sel = sel + (n_need > c).astype(jnp.int32)
        return jax.lax.switch(sel, branches, operand=None)

    # non-ladder (training / AD) path: ONE differentiated body behind a
    # quiesce skip — the round-3 shipping structure (1.095 iter/s measured,
    # BASELINE.md) whose JVP residuals fit on-chip
    def _run(_):
        return _retrace_body(out, hits, need, ray_o, ray_d, grid, inputs,
                             cfg, sh_deg, capacity, back_culling,
                             pair_tab=pair_tab)

    return jax.lax.cond(jnp.any(need), _run, lambda _: (out, hits),
                        operand=None)


def _retrace_body(out, hits, need, ray_o, ray_d, grid, inputs, cfg, sh_deg,
                  capacity, back_culling, pair_tab=None):
    ro = jax.lax.stop_gradient(ray_o)
    rd = jax.lax.stop_gradient(ray_d)
    # compaction, prioritized by remaining transmittance: when more rays
    # need re-tracing than the round's capacity, the most transmissive ones
    # (largest un-resolved radiance fraction) win the slots
    score = jnp.where(need, jax.lax.stop_gradient(out.trans), 0.0)
    _, idx = jax.lax.top_k(score, capacity)
    picked = need[idx]                                     # [capacity]

    # two restart thresholds: collection skips fully-examined cells (so the
    # segment makes progress even with zero accepted hits), acceptance
    # excludes only already-blended hits
    t_accept = hits.t_last[idx] * (1.0 + 1e-5) + 1e-6
    t_collect = jnp.maximum(hits.t_cell[idx], 0.0)
    geom = jax.lax.stop_gradient(_pack_geom(inputs))
    if pair_tab is None and cfg.select_tiles > 0:
        pair_tab = _pair_tab_from_geom(grid, geom, cfg.tile,
                                           bf16=cfg.table_bf16)

    def sel(ro_i, rd_i, t_c, t_a, skip_i):
        cells2 = collect_cells(ro_i, rd_i, grid, cfg, t_start=t_c)
        return select_hits(ro_i, rd_i, grid.sorted_gauss, cells2, geom, cfg,
                           back_culling, t_start=t_a, cand_skip=skip_i,
                           grid=grid, pair_tab=pair_tab)

    # bound the [rays, max_hits] candidate working set like make_trace_fn's
    # select chunking (wide-candidate configs would otherwise allocate
    # gigabytes here)
    sel_w = max(cfg.select_tiles * cfg.tile, cfg.prefilter_width,
                cfg.max_hits)
    chunk_cap = max(2 ** 12, (2 ** 18 * 48) // max(sel_w, 48))
    args = (ro[idx], rd[idx], t_collect, t_accept, hits.cand_skip[idx])
    if capacity > chunk_cap:
        n_g = -(-capacity // chunk_cap)
        pad = n_g * chunk_cap - capacity
        padded = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                       for a in args)
        grouped = tuple(a.reshape(n_g, chunk_cap, *a.shape[1:]) for a in padded)
        h2 = jax.lax.map(lambda ab: sel(*ab), grouped)
        h2 = jax.tree.map(
            lambda x: x.reshape(n_g * chunk_cap, *x.shape[2:])[:capacity], h2)
    else:
        h2 = sel(*args)
    valid2 = h2.valid & picked[:, None]
    gs2 = h2.gs
    if grid.oversize_ids.shape[0] > 0:
        # oversize window for this round: (t_accept, bound(new watermark)];
        # unpicked rays get an empty window via t_lo = INF
        gs2, valid2 = merge_oversize(
            gs2, valid2, h2.more, jnp.maximum(h2.t_last, hits.t_last[idx]),
            ro[idx], rd[idx], geom, grid, cfg, back_culling,
            t_lo=jnp.where(picked, t_accept, INF))
    # blend in bounded ray groups as well — the fused-table gather is
    # [rays*kb, 61+S] rows and would be tens of GB at full eval capacity
    kb = min(cfg.hit_budget, cfg.max_hits) + grid.oversize_ids.shape[0]
    blend_cap = max(2 ** 12, (2 ** 22) // max(kb, 1))
    if capacity > blend_cap:
        n_b = -(-capacity // blend_cap)
        padb = n_b * blend_cap - capacity
        def bpad(a):
            return jnp.pad(a, ((0, padb),) + ((0, 0),) * (a.ndim - 1)).reshape(
                (n_b, blend_cap) + a.shape[1:])
        seg = jax.lax.map(
            lambda ab: blend_hits(ab[0], ab[1], inputs, ab[2], ab[3], cfg,
                                  sh_deg, t0=ab[4]),
            (bpad(ray_o[idx]), bpad(ray_d[idx]), bpad(gs2), bpad(valid2),
             bpad(out.trans[idx])))
        seg = TraceOut(*[
            x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])[:capacity]
            for x in seg])
    else:
        seg = blend_hits(ray_o[idx], ray_d[idx], inputs, gs2, valid2, cfg,
                         sh_deg, t0=out.trans[idx])

    add2 = lambda a, b: a.at[idx].add(jnp.where(picked[:, None], b, 0.0))
    add1 = lambda a, b: a.at[idx].add(jnp.where(picked, b, 0.0))
    new_out = TraceOut(
        color=add2(out.color, seg.color),
        normal=add2(out.normal, seg.normal),
        feature=add2(out.feature, seg.feature),
        depth=add1(out.depth, seg.depth),
        alpha=add1(out.alpha, seg.alpha),
        trans=out.trans.at[idx].set(
            jnp.where(picked, seg.trans, out.trans[idx])),
    )
    # the new acceptance restart must never move backwards (h2.t_last is 0
    # when the segment accepted nothing)
    new_hits = SelectedHits(
        gs=hits.gs, valid=hits.valid,
        t_last=hits.t_last.at[idx].set(
            jnp.where(picked, jnp.maximum(h2.t_last, hits.t_last[idx]),
                      hits.t_last[idx])),
        t_cell=hits.t_cell.at[idx].set(
            jnp.where(picked, jnp.maximum(h2.t_cell, hits.t_cell[idx]),
                      hits.t_cell[idx])),
        more=hits.more.at[idx].set(jnp.where(picked, h2.more, False)),
        cand_skip=hits.cand_skip.at[idx].set(
            jnp.where(picked, h2.cand_skip, hits.cand_skip[idx])),
    )
    return new_out, new_hits


def retrace_rounds(out: TraceOut, hits: SelectedHits, ray_o, ray_d,
                   grid: Grid, inputs: TraceInputs, cfg: TracerConfig,
                   sh_deg: int, back_culling: bool = False, pair_tab=None):
    """Run the configured re-trace rounds on a first-pass (out, hits).

    Two schedules: the decayed unrolled one (differentiable — training), or
    iterative deepening (cfg.retrace_while, eval-only): a while_loop of
    fixed-capacity transmittance-prioritized rounds that stops as soon as no
    ray is truncated-and-transmissive (≙ the CUDA raygen's unbounded
    per-segment loop, gaussiantrace_forward.cu:27-103, bounded by
    n_segments-1 rounds)."""
    if cfg.n_segments <= 1:
        return out, hits
    rcfg = cfg.retrace_cfg()
    if pair_tab is None and rcfg.select_tiles > 0:
        # one tile-row candidate table serves every round (it depends only
        # on grid/geom/tile width, not on the per-round budget)
        pair_tab = _pair_tab_from_geom(
            grid, jax.lax.stop_gradient(_pack_geom(inputs)), rcfg.tile,
            bf16=rcfg.table_bf16)
    n_rays = ray_o.shape[0]
    if cfg.retrace_while:
        cap = max(1, min(n_rays, int(n_rays * cfg.retrace_frac)))
        tail_cap = max(1, min(n_rays, int(n_rays * cfg.retrace_tail_frac)))
        tmin = cfg.transmittance_min
        n_bulk = min(cfg.retrace_bulk, cfg.n_segments - 1)

        # bulk: unrolled full-capacity rounds (lax.cond-gated inside)
        for _ in range(n_bulk):
            out, hits = retrace_pass(out, hits, ray_o, ray_d, grid, inputs,
                                     rcfg, sh_deg, cap, back_culling,
                                     pair_tab=pair_tab)

        def cond(carry):
            o, h, rnd = carry
            need = h.more & (o.trans > tmin)
            return (rnd < cfg.n_segments - 1 - n_bulk) & jnp.any(need)

        def body(carry):
            o, h, rnd = carry
            need = h.more & (o.trans > tmin)
            o2, h2 = _retrace_body(o, h, need, ray_o, ray_d, grid, inputs,
                                   rcfg, sh_deg, tail_cap, back_culling,
                                   pair_tab=pair_tab)
            return o2, h2, rnd + 1

        out, hits, _ = jax.lax.while_loop(cond, body,
                                          (out, hits, jnp.int32(0)))
        return out, hits
    for rnd in range(cfg.n_segments - 1):
        out, hits = retrace_pass(out, hits, ray_o, ray_d, grid, inputs, rcfg,
                                 sh_deg, cfg.round_capacity(n_rays, rnd),
                                 back_culling, pair_tab=pair_tab)
    return out, hits


def trace_segments(ray_o, ray_d, grid: Grid, inputs: TraceInputs, *,
                   cfg: TracerConfig, sh_deg: int,
                   back_culling: bool = False) -> TraceOut:
    """Differentiable trace with the reference's full re-trace semantics:
    after the first k-buffer blend, up to cfg.n_segments - 1 compacted
    re-trace rounds extend truncated rays until T < transmittance_min
    (≙ gaussiantrace_forward.cu:27-103's unbounded per-segment loop,
    bounded here by a static segment count + per-round capacity)."""
    ro = jax.lax.stop_gradient(ray_o)
    rd = jax.lax.stop_gradient(ray_d)
    cells = collect_cells(ro, rd, grid, cfg)
    geom = jax.lax.stop_gradient(_pack_geom(inputs))
    pair_tab = (_pair_tab_from_geom(grid, geom, cfg.tile,
                                    bf16=cfg.table_bf16)
                if cfg.select_tiles > 0 else None)
    hits = select_hits(ro, rd, grid.sorted_gauss, cells, geom, cfg,
                       back_culling, grid=grid, pair_tab=pair_tab)
    gs1, valid1 = merge_oversize(hits.gs, hits.valid, hits.more,
                                 hits.t_last, ray_o, ray_d, geom, grid,
                                 cfg, back_culling)
    out = blend_hits(ray_o, ray_d, inputs, gs1, valid1, cfg, sh_deg)
    out, hits = retrace_rounds(out, hits, ray_o, ray_d, grid, inputs, cfg,
                               sh_deg, back_culling, pair_tab=pair_tab)
    return out


def trace_forward_only(ray_o, ray_d, grid, inputs, *, cfg: TracerConfig,
                       sh_deg: int, back_culling: bool = False) -> TraceOut:
    return jax.lax.stop_gradient(
        trace(ray_o, ray_d, grid, jax.lax.stop_gradient(inputs),
              cfg=cfg, sh_deg=sh_deg, back_culling=back_culling))


def first_hit(ray_o, ray_d, grid: Grid, inputs: TraceInputs, *, cfg: TracerConfig):
    """Boolean any-hit test (≙ intersection_test,
    gaussiantrace_intersection_test.cu:12-35). Non-differentiable."""
    out = trace_forward_only(ray_o, ray_d, grid, inputs, cfg=cfg, sh_deg=0)
    return out.alpha > 0.0


# ---------------------------------------------------------------------------
# brute-force reference (test oracle)
# ---------------------------------------------------------------------------

def trace_reference(ray_o, ray_d, inputs: TraceInputs, alive, *,
                    alpha_min: float = 1.0 / 255.0,
                    transmittance_min: float = 0.03,
                    t_min: float = 1e-6, sh_deg: int = 3,
                    back_culling: bool = False) -> TraceOut:
    """O(R·N): every Gaussian against every ray, globally depth-sorted,
    terminated at T < transmittance_min. Differentiable by JAX AD."""
    alpha, color, n_flip, feat, d = _hit_quantities(
        inputs.means3d[None], inputs.opacity[None], inputs.ru[None],
        inputs.rv[None], inputs.normals[None], inputs.shs[None],
        inputs.features[None], ray_o[:, None], ray_d[:, None], sh_deg)
    accept = alive[None] & (alpha >= alpha_min) & (d >= t_min)
    if back_culling:
        accept = accept & (jnp.sum(ray_d[:, None] * inputs.normals[None], -1) < 0)
    alpha = jnp.where(accept, alpha, 0.0)

    # multi-operand payload sort (argsort + take_along_axis lowers to a
    # pathologically slow serialized gather on this backend). The gaussian
    # INDEX is a secondary key: coplanar splats produce EXACT depth ties
    # (e.g. a ground plane of flat disks), and an unstable single-key sort
    # orders them backend-dependently — the index key restores the stable
    # argsort semantics the grid tracer's select also uses.
    feat_b = jnp.broadcast_to(feat, d.shape + (feat.shape[-1],))
    idx = jnp.broadcast_to(
        jnp.arange(d.shape[-1], dtype=jnp.int32)[None], d.shape)
    ops = [jnp.where(accept, d, INF), idx, alpha, d,
           color[..., 0], color[..., 1], color[..., 2],
           n_flip[..., 0], n_flip[..., 1], n_flip[..., 2]]
    ops += [feat_b[..., i] for i in range(feat.shape[-1])]
    sorted_ops = jax.lax.sort(tuple(ops), num_keys=2, dimension=-1,
                              is_stable=False)
    alpha_s, d_s = sorted_ops[2], sorted_ops[3]
    color_s = jnp.stack(sorted_ops[4:7], -1)
    nrm_s = jnp.stack(sorted_ops[7:10], -1)
    feat_s = (jnp.stack(sorted_ops[10:], -1) if feat.shape[-1]
              else jnp.zeros(d.shape + (0,)))
    lg = jnp.log1p(-alpha_s)
    T = jnp.exp(jnp.cumsum(lg, -1) - lg)
    w = alpha_s * T
    w = jnp.where(T > transmittance_min, w, 0.0)

    return TraceOut(
        color=jnp.einsum("rk,rkc->rc", w, color_s),
        normal=jnp.einsum("rk,rkc->rc", w, nrm_s),
        feature=jnp.einsum("rk,rks->rs", w, feat_s),
        depth=jnp.sum(w * d_s, -1),
        alpha=jnp.sum(w, -1),
        trans=jnp.exp(jnp.sum(lg, -1)),
    )


def normalize_trace(out: TraceOut, transmittance_min: float) -> TraceOut:
    """≙ GaussianModel.trace post-normalization (gaussian_model.py:751-756):
    saturated rays (alpha ≥ 1 - t_min) get outputs divided by alpha and
    alpha snapped to 1."""
    a = out.alpha[:, None]
    sat = a >= (1.0 - transmittance_min)
    safe = jnp.maximum(a, 1e-6)
    return TraceOut(
        color=jnp.where(sat, out.color / safe, out.color),
        normal=jnp.where(sat, out.normal / safe, out.normal),
        feature=jnp.where(sat, out.feature / safe, out.feature),
        depth=jnp.where(sat[:, 0], out.depth / safe[:, 0], out.depth),
        alpha=jnp.where(sat[:, 0], 1.0, out.alpha),
        trans=out.trans,
    )
