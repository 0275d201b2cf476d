"""Ablation profiler for the stage-2 step: times the full step and variants
with individual cost centers disabled, so optimization effort goes where the
time is. Run solo on the TPU (host contention skews readings — BASELINE.md).

Usage: python tools/profile_stage2.py [--iters 10]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, state, keys, n):
    import jax
    print("  compiling...", flush=True)
    t = time.perf_counter()
    s, _ = fn(state, keys[0])          # compile
    jax.block_until_ready(s.params.xyz)
    print(f"  compiled+step1 in {time.perf_counter() - t:.1f}s", flush=True)
    t0 = time.perf_counter()
    s = state
    for i in range(1, n + 1):
        s, _ = fn(s, keys[i % len(keys)])
    jax.block_until_ready(s.params.xyz)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from irgs_tpu.config import Config
    from irgs_tpu.ops import grid_tracer as gt
    from irgs_tpu.scene import toy
    from irgs_tpu.train import stage2 as s2

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", type=str, default="",
                    help="run a single variant by name (one process per "
                         "variant keeps each run inside a timeout budget)")
    args = ap.parse_args()

    img = 400
    params, aux = toy.make_sphere_scene(n_surface=100_000, n_capacity=2 ** 17,
                                        env_resolution=128)
    cams = toy.make_ring_cameras(8, width=img, height_px=img)
    cfg = Config()
    cfg.pipe.diffuse_sample_num = 256
    cfg.opt.trace_num_rays = 2 ** 18
    st = s2.from_configs(cfg, img_w=img, img_h=img)
    st = dataclasses.replace(st, dup_capacity=2 ** 19)
    grid = gt.build_grid_from_gaussians(params, aux, st.tracer)
    state, optimizer = s2.init_state(params, aux, cfg.opt)
    gt_img = jnp.full((img, img, 3), 0.5)
    cam = cams[0].params()
    keys = list(jax.random.split(jax.random.PRNGKey(0), 8))

    def step_with(st_i):
        def fn(state, key):
            return s2.stage2_step(state, grid, cam, gt_img, None, key,
                                  st=st_i, optimizer=optimizer)
        return fn

    variants = {
        "full": st,
        "wo_indirect(detach trace)": dataclasses.replace(st, detach_indirect=True),
        "hit_budget=8": dataclasses.replace(
            st, tracer=dataclasses.replace(st.tracer, hit_budget=8)),
        "max_hits=32": dataclasses.replace(
            st, tracer=dataclasses.replace(st.tracer, max_hits=32)),
        "max_crossings=20": dataclasses.replace(
            st, tracer=dataclasses.replace(st.tracer, max_crossings=20)),
        "trace_rays/2": dataclasses.replace(st, trace_num_rays=2 ** 17),
    }
    if args.only:
        variants = {k: v for k, v in variants.items() if args.only in k}
    base = None
    for name, st_i in variants.items():
        try:
            dt = timeit(step_with(st_i), state, keys, args.iters)
        except Exception as e:  # keep going; a variant may OOM
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        if base is None:
            base = dt
        print(f"{name:28s} {dt * 1e3:8.1f} ms/step   delta "
              f"{1e3 * (base - dt):+7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
