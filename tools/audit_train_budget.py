"""Default-config tracer bias vs the EXACT brute-force oracle (VERDICT r2
weak #3 / next-round item #2).

Runs the SHIPPING training tracer config (Config().pipe, exactly what
train.py uses) and the shipping eval config against gt.trace_reference on
the dense stress scene (100k overlapping surfels, rays from surface points
in random directions incl. occluded ones — the shadow/interreflection
regime). Prints the |dcolor|/|dalpha| rows for BASELINE.md.

Run solo on the TPU:  python tools/audit_train_budget.py
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, "/root/repo")

import jax

ap = argparse.ArgumentParser()
ap.add_argument("--cpu", action="store_true",
                help="force the CPU backend: bias is SEMANTIC (budget "
                     "truncation), so the numbers are hardware-independent "
                     "— usable during TPU outages")
ap.add_argument("--n_rays", type=int, default=512)
ap.add_argument("--full", action="store_true",
                help="also run the tuning-ladder variants")
ap.add_argument("--tile64", action="store_true",
                help="run the 64-candidate-tile ladder (4KB aligned gather "
                     "rows: 3-4x fewer gather rows per ray at equal "
                     "candidate coverage)")
ap.add_argument("--only", type=str, default="",
                help="run only variants whose name contains this substring")
ap.add_argument("--bf16", action="store_true",
                help="audit the bf16 pair table + top-k extraction ladder "
                     "(the round-4 eval speed candidates)")
ap.add_argument("--t32", action="store_true",
                help="repair ladder for the t32-direct defaults: more "
                     "tiles / more segments to recover oracle-exactness")
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import irgs_tpu  # noqa: F401
from irgs_tpu.config import Config
from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.render import ir
from irgs_tpu.scene import toy
from irgs_tpu.utils import math3d

N_RAYS = args.n_rays
ORACLE_CHUNK = 64

params, aux = toy.make_sphere_scene(n_surface=100_000, n_capacity=2 ** 17,
                                    env_resolution=64)
k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
idx = jax.random.randint(k1, (N_RAYS,), 0, 100_000)
ro = params.xyz[idx] + 0.05 * jax.random.normal(k2, (N_RAYS, 3))
rd = jax.random.normal(k3, (N_RAYS, 3))
rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

s = params.get_scaling()
Rm = math3d.quat_to_rotmat(params.rotation)
inputs = gt.TraceInputs(
    means3d=params.xyz,
    opacity=jnp.where(aux.alive, params.get_opacity()[:, 0], 0.0),
    ru=Rm[:, :, 0] / s[:, 0:1], rv=Rm[:, :, 1] / s[:, 1:2],
    normals=params.world_normals(cam_pos=jnp.zeros(3)),
    shs=params.get_features(), features=jnp.zeros((2 ** 17, 0)))


CACHE = f"/tmp/audit_oracle_{'cpu' if args.cpu else 'tpu'}_{N_RAYS}.npz"
if os.path.exists(CACHE):
    z = np.load(CACHE)
    ref = gt.TraceOut(*[jnp.asarray(z[f]) for f in gt.TraceOut._fields])
    print("oracle loaded from cache", flush=True)
else:
    @jax.jit
    def oracle_chunk(a, b):
        out = gt.trace_reference(a, b, inputs, aux.alive, sh_deg=3)
        return gt.normalize_trace(out, 0.03)

    outs = []
    for c in range(0, N_RAYS, ORACLE_CHUNK):
        o = oracle_chunk(ro[c:c + ORACLE_CHUNK], rd[c:c + ORACLE_CHUNK])
        jax.block_until_ready(o.alpha)
        outs.append(o)
    ref = gt.TraceOut(*[jnp.concatenate([getattr(o, f) for o in outs])
                        for f in gt.TraceOut._fields])
    np.savez(CACHE, **{f: np.asarray(getattr(ref, f))
                       for f in gt.TraceOut._fields})
    print("oracle done", flush=True)

cfg = Config()
train_tc = gt.TracerConfig.from_pipe(cfg.pipe)
eval_tc = gt.TracerConfig.from_pipe(cfg.pipe, eval=True)
variants = [
    ("shipping TRAIN config", train_tc),
    ("shipping EVAL config", eval_tc),
]
# tuning ladder: what closes the bias, and what it costs (pair with a
# bench.py run at the same budgets for the iter/s price)
variants += [] if not args.full else [
    ("train +prefilter256", dataclasses.replace(
        train_tc, prefilter_width=256)),
    ("train +prefilter256 seg2/f0.25", dataclasses.replace(
        train_tc, prefilter_width=256, retrace_frac=0.25)),
    ("train +prefilter512 seg3/f0.25", dataclasses.replace(
        train_tc, prefilter_width=512, n_segments=3, retrace_frac=0.25)),
    ("eval +prefilter256/r1024", dataclasses.replace(
        eval_tc, prefilter_width=256, retrace_prefilter_width=1024)),
    ("eval +prefilter512/r2048 seg8", dataclasses.replace(
        eval_tc, prefilter_width=512, retrace_prefilter_width=2048,
        n_segments=8)),
]
variants += [] if not args.t32 else [
    ("train t32x24 seg5", dataclasses.replace(train_tc, n_segments=5)),
    ("train t32x28 seg4", dataclasses.replace(
        train_tc, select_tiles=28, retrace_select_tiles=28)),
    ("train t32x24 seg4/f0.375", dataclasses.replace(
        train_tc, retrace_frac=0.375)),
    ("eval t32x24/r48 seg5", dataclasses.replace(eval_tc, n_segments=5)),
    ("eval t32x28/r48 seg4", dataclasses.replace(eval_tc, select_tiles=28)),
    # isolate: is the residual bias from DIRECT mode or from tile=32?
    ("train t16x48 direct", dataclasses.replace(
        train_tc, tile=16, select_tiles=48, retrace_select_tiles=48)),
    ("train t32x24 packed", dataclasses.replace(
        train_tc, tiled_direct=False)),
    # cheaper segment schedules under the partial-cell watermark fix
    ("train seg3", dataclasses.replace(train_tc, n_segments=3)),
    ("train seg2", dataclasses.replace(train_tc, n_segments=2)),
    ("train st16 seg5", dataclasses.replace(
        train_tc, select_tiles=16, retrace_select_tiles=16, n_segments=5)),
    ("eval seg3", dataclasses.replace(eval_tc, n_segments=3)),
    ("train decay0.5", dataclasses.replace(train_tc, retrace_decay=0.5)),
    ("train cr16", dataclasses.replace(train_tc, max_crossings=16)),
    ("train cr16 decay0.5", dataclasses.replace(
        train_tc, max_crossings=16, retrace_decay=0.5)),
]
variants += [] if not args.tile64 else [
    (f"train tile64 x{st}", dataclasses.replace(
        train_tc, tile=64, select_tiles=st, retrace_select_tiles=st))
    for st in (10, 12, 16)
] + [
    (f"eval tile64 x{st}/r{rt}", dataclasses.replace(
        eval_tc, tile=64, select_tiles=st, retrace_select_tiles=rt))
    for st, rt in ((12, 24), (16, 24), (16, 32))
]
variants += [] if not args.bf16 else [
    ("train bf16", dataclasses.replace(train_tc, table_bf16=True)),
    ("eval bf16", dataclasses.replace(eval_tc, table_bf16=True)),
    ("eval topk", dataclasses.replace(eval_tc, select_topk=True)),
    ("eval bf16 topk", dataclasses.replace(
        eval_tc, table_bf16=True, select_topk=True)),
]
if args.only:
    variants = [(n, tc) for n, tc in variants if args.only in n]
for name, tc in variants:
    grid = gt.build_grid_from_gaussians(params, aux, tc)
    tf = ir.make_trace_fn(params, aux, grid, tc, jnp.zeros(3), 3)
    f = jax.jit(lambda a, b: tf(a, b))
    out = f(ro, rd)
    jax.block_until_ready(out.alpha)
    d = jnp.abs(out.color - ref.color).max(-1)          # per-ray max-channel
    da_r = jnp.abs(out.alpha - ref.alpha)
    dc = float(jnp.abs(out.color - ref.color).mean())
    da = float(da_r.mean())
    q = np.percentile(np.asarray(d), [50, 90, 99])
    bad = float((d > 0.05).mean())
    print(f"{name} ({tc.max_cells}c,{tc.max_hits}h,{tc.hit_budget}kb,"
          f"{tc.max_crossings}cr,seg{tc.n_segments}/f{tc.retrace_frac}"
          f"d{tc.retrace_decay}): mean|dcolor|={dc:.5f} "
          f"mean|dalpha|={da:.5f} dcolor p50/p90/p99="
          f"{q[0]:.4f}/{q[1]:.4f}/{q[2]:.4f} frac(>0.05)={bad:.3f}",
          flush=True)
