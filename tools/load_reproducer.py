"""Replay a non-finite-loss reproducer dumped by train.py.

train.py saves the PRE-step TrainState + camera index + PRNG key whenever a
step produces a non-finite loss (≙ the reference rasterizer's debug snapshot
dump, diff_surfel_rasterization/__init__.py:88-95, and --detect_anomaly,
train.py:287). This tool re-runs that exact step with jax_debug_nans enabled
so the first non-finite intermediate raises with a traceback.

Usage:
    python tools/load_reproducer.py <model_dir>/reproducer_NNNNNN.ckpt \
        [--toy] [-s <scene_dir>]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from irgs_tpu.config import Config, load_config
from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.scene import toy
from irgs_tpu.train import stage2 as s2
from irgs_tpu.utils.checkpoint import load_checkpoint


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("reproducer")
    ap.add_argument("--toy", action="store_true")
    ap.add_argument("--debug_nans", action="store_true", default=True)
    args = ap.parse_args()

    with open(args.reproducer + ".json") as f:
        manifest = json.load(f)
    model_dir = os.path.dirname(os.path.abspath(args.reproducer))
    cfg = load_config(model_dir)

    if args.toy or not cfg.model.source_path:
        params, aux = toy.make_sphere_scene(
            n_surface=8192, n_capacity=16384,
            env_resolution=cfg.model.envmap_resolution)
        cams = toy.make_ring_cameras(16, width=256, height_px=256)
        gt_img = jnp.full((256, 256, 3), 0.5)
        mask = None
    else:
        from irgs_tpu.scene.datasets import load_scene
        from irgs_tpu.scene import gaussians as G
        info = load_scene(cfg.model.source_path, cfg.model.white_background,
                          eval_split=cfg.model.eval,
                          resolution=cfg.model.resolution)
        cams = info.train_cameras
        params, aux = G.create_from_pcd(
            info.points, info.colors, cfg.model.max_gaussians,
            cfg.model.sh_degree, cfg.model.envmap_resolution,
            cfg.model.envmap_init_value)
        i = manifest["cam_index"]
        gt_img = jnp.asarray(cams[i].image)
        mask = (jnp.asarray(cams[i].mask)
                if getattr(cams[i], "mask", None) is not None else None)

    h, w = (cams[0].image.shape[:2] if getattr(cams[0], "image", None)
            is not None else (256, 256))
    st = s2.from_configs(cfg, img_w=w, img_h=h)
    template, optimizer = s2.init_state(params, aux, cfg.opt)
    state, it = load_checkpoint(args.reproducer, template)
    print(f"replaying iter {it} (cam {manifest['cam_index']}, "
          f"recorded loss {manifest.get('loss')})", flush=True)

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    grid = gt.build_grid_from_gaussians(state.params, state.aux, st.tracer)
    key = jnp.asarray(np.array(manifest["key"], dtype=np.uint32))
    cam = cams[manifest["cam_index"]].params()
    new_state, metrics = s2.stage2_step(state, grid, cam, gt_img, mask, key,
                                        st=st, optimizer=optimizer)
    print({k: float(v) for k, v in metrics.items()}, flush=True)


if __name__ == "__main__":
    main()
