"""Tracer truncation-bias measurement (VERDICT r1 items #2/weak#2).

Measures |dcolor|/|dalpha| of the budgeted tracer against a brute-force-ish
high-budget oracle, across scene DENSITIES and at training AND eval ray
counts, with and without the segmented re-trace. Also times each variant.

Run from /root/repo on the TPU:  python < tools/trace_fidelity.py
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tool_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import irgs_tpu  # noqa: F401
from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.render import ir
from irgs_tpu.scene import toy

N_RAYS = int(jnp.asarray(65536))  # per-density ray batch (eval-scale chunk)


def make_rays(params, n_gauss, n_rays, key):
    k1, k2, k3 = jax.random.split(key, 3)
    idx = jax.random.randint(k1, (n_rays,), 0, n_gauss)
    ro = params.xyz[idx] + 0.05 * jax.random.normal(k2, (n_rays, 3))
    rd = jax.random.normal(k3, (n_rays, 3))
    return ro, rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)


def run(params, aux, ro, rd, **kw):
    cfg = gt.TracerConfig(grid_res=48, pair_capacity=2 ** 21, **kw)
    grid = gt.build_grid_from_gaussians(params, aux, cfg)
    tf = ir.make_trace_fn(params, aux, grid, cfg, jnp.zeros(3), 3)
    f = jax.jit(lambda a, b: tf(a, b))
    out = f(ro, rd)
    jax.block_until_ready(out.alpha)
    t0 = time.time()
    out = f(ro, rd)
    jax.block_until_ready(out.alpha)
    return out, time.time() - t0


# production budget sets; n_segments=1 is the round-1 behavior
VARIANTS = [
    ("train(40h,16kb) seg1", dict(max_cells=12, max_hits=40, hit_budget=16,
                                  max_crossings=24, n_segments=1)),
    ("train(40h,16kb) seg2", dict(max_cells=12, max_hits=40, hit_budget=16,
                                  max_crossings=24, n_segments=2,
                                  retrace_frac=0.25)),
]

for n_gauss, cap, tag in [(100_000, 2 ** 17, "bench"),
                          (200_000, 2 ** 18, "dense")]:
    params, aux = toy.make_sphere_scene(n_surface=n_gauss, n_capacity=cap,
                                        env_resolution=64)
    ro, rd = make_rays(params, n_gauss, 16384, jax.random.PRNGKey(3))
    ref, t_ref = run(params, aux, ro, rd, max_cells=16, max_hits=96,
                     hit_budget=32, max_crossings=0, n_segments=3,
                     retrace_frac=1.0)
    print(f"--- density={tag} ({n_gauss} gaussians), oracle {t_ref*1e3:.0f} ms",
          flush=True)
    for name, kw in VARIANTS:
        o, t = run(params, aux, ro, rd, **kw)
        da = float(jnp.abs(o.alpha - ref.alpha).mean())
        dc = float(jnp.abs(o.color - ref.color).mean())
        print(f"{name}: |dalpha|={da:.5f} |dcolor|={dc:.5f} {t*1e3:.0f} ms",
              flush=True)
