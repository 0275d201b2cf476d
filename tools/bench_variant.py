"""bench.py workload with a named tracer-config variant — A/B the training
step end-to-end, one variant per process (the in-process accumulation of
compiled graphs skews late measurements).

Usage:  python tools/bench_variant.py <name>
Names:  base | topk | t16x48 | t128x8 | seg3 | seg2 | selchunk2x | st16
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from irgs_tpu.config import Config
    from irgs_tpu.ops import grid_tracer as gt
    from irgs_tpu.scene import toy
    from irgs_tpu.train import stage2 as s2

    name = sys.argv[1] if len(sys.argv) > 1 else "base"

    img = 400
    params, aux = toy.make_sphere_scene(n_surface=100_000, n_capacity=2 ** 17,
                                        env_resolution=128)
    cams = toy.make_ring_cameras(8, width=img, height_px=img)
    cfg = Config()
    cfg.pipe.diffuse_sample_num = 256
    cfg.opt.trace_num_rays = 2 ** 18
    st = s2.from_configs(cfg, img_w=img, img_h=img)
    st = dataclasses.replace(st, dup_capacity=2 ** 19)

    tc = st.tracer
    mods = {
        "base": {},
        "topk": {"select_topk": True},
        "t16x48": {"tile": 16, "select_tiles": 48, "retrace_select_tiles": 48},
        "t128x8": {"tile": 128, "select_tiles": 8, "retrace_select_tiles": 8},
        "seg3": {"n_segments": 3},
        "seg2": {"n_segments": 2},
        "st16": {"select_tiles": 16, "retrace_select_tiles": 16,
                 "n_segments": 5},
    }[name]
    tc = dataclasses.replace(tc, **mods)
    st = dataclasses.replace(st, tracer=tc)

    grid = gt.build_grid_from_gaussians(params, aux, st.tracer)
    state, optimizer = s2.init_state(params, aux, cfg.opt)
    gts = [jnp.full((img, img, 3), 0.5) for _ in cams]
    cam_params = [c.params() for c in cams]
    key = jax.random.PRNGKey(0)

    def step(state, i, key):
        return s2.stage2_step(state, grid, cam_params[i % len(cams)],
                              gts[i % len(cams)], None, key,
                              st=st, optimizer=optimizer)

    state, _ = step(state, 0, key)
    np.asarray(state.params.xyz.ravel()[0])

    n_rounds, n_iters = 3, 8
    best_dt = float("inf")
    i = 0
    for _ in range(n_rounds):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            i += 1
            key, k = jax.random.split(key)
            state, metrics = step(state, i, k)
        np.asarray(state.params.xyz.ravel()[0])
        best_dt = min(best_dt, time.perf_counter() - t0)
    print(json.dumps({"variant": name,
                      "iters_per_sec": round(n_iters / best_dt, 4)}))


if __name__ == "__main__":
    main()
