"""Stage-2 training CLI (material + light decomposition).

≙ reference train.py. Usage:
    python train.py -s <scene_dir> -m <model_dir> [--train_ray ...]
    python train.py --toy -m /tmp/toy_run --iterations 500   (no dataset needed)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from irgs_tpu.config import Config, add_config_args, apply_args
    from irgs_tpu.ops import grid_tracer as gt
    from irgs_tpu.scene import gaussians as G
    from irgs_tpu.scene import toy
    from irgs_tpu.scene.cameras import Camera
    from irgs_tpu.train import stage2 as s2

    parser = argparse.ArgumentParser()
    cfg = Config()
    add_config_args(parser, cfg)
    parser.add_argument("--toy", action="store_true",
                        help="procedural toy scene instead of a dataset")
    parser.add_argument("--start_ply", type=str, default=None,
                        help="stage-1 geometry PLY to start from")
    parser.add_argument("--start_checkpoint", type=str, default=None,
                        help="stage-1 run dir or chkpnt*.ckpt to restore "
                             "geometry from (≙ restore_from_refgs)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--vis_interval", type=int, default=500,
                        help="save an AOV grid every N iters (0 = off)")
    args = parser.parse_args()
    cfg = apply_args(cfg, args)
    if not cfg.model.model_path:
        cfg.model.model_path = "/tmp/irgs_tpu_stage2"
    os.makedirs(cfg.model.model_path, exist_ok=True)
    cfg.save()

    key = jax.random.PRNGKey(args.seed)

    if args.toy:
        params, aux = toy.make_sphere_scene(
            n_surface=8192, n_capacity=16384,
            env_resolution=cfg.model.envmap_resolution)
        cams = toy.make_ring_cameras(16, width=256, height_px=256)
        # ground truth from the true scene; then reset materials
        from irgs_tpu.render.eval import EvalConfig, render_ir_eval
        ecfg = EvalConfig(img_w=256, img_h=256, diffuse_sample_num=64,
                          light_sample_num=0,
                          tracer=gt.TracerConfig(
                              grid_res=cfg.pipe.tracer_grid_res,
                              max_cells=cfg.pipe.tracer_max_cells,
                              max_hits=cfg.pipe.tracer_max_hits,
                              hit_budget=cfg.pipe.tracer_hit_budget,
                              max_crossings=cfg.pipe.tracer_max_crossings))
        grid = gt.build_grid_from_gaussians(params, aux, ecfg.tracer)
        render_j = jax.jit(lambda c: render_ir_eval(params, aux, grid, c, ecfg))
        gt_images = [np.asarray(render_j(c.params())["render"]) for c in cams]
        masks = [None] * len(cams)
        import dataclasses
        from irgs_tpu.utils.math3d import inverse_sigmoid
        from irgs_tpu.scene.gaussians import inverse_base_color_activation
        params = dataclasses.replace(
            params,
            base_color=jnp.full_like(params.base_color, float(
                inverse_base_color_activation(jnp.float32(cfg.opt.init_base_color_value)))),
            roughness=jnp.full_like(params.roughness, float(
                inverse_sigmoid(jnp.float32(cfg.opt.init_roughness_value)))),
            env=jnp.zeros_like(params.env))
        light_transform = None
    else:
        from irgs_tpu.scene.datasets import (LIGHT_ROTATE_TRANSFORM, load_scene)
        info = load_scene(cfg.model.source_path, cfg.model.white_background,
                          eval_split=cfg.model.eval,
                          resolution=cfg.model.resolution)
        cams = info.train_cameras
        gt_images = [c.image for c in cams]
        masks = [c.mask for c in cams]
        if args.start_checkpoint:
            from irgs_tpu.train.stage1_full import load_stage1_checkpoint
            s1_state, s1_iter, _ = load_stage1_checkpoint(args.start_checkpoint)
            params, aux = G.from_refgs(
                s1_state.params, s1_state.aux,
                env_resolution=cfg.model.envmap_resolution,
                env_init_value=cfg.model.envmap_init_value,
                env_activation=cfg.model.envmap_activation,
                init_base_color=cfg.opt.init_base_color_value,
                init_metallic=cfg.opt.init_metallic_value,
                init_roughness=cfg.opt.init_roughness_value)
            print(f"restored stage-1 geometry @ iter {s1_iter} "
                  f"({int(aux.n_alive)} gaussians)")
        elif args.start_ply:
            params, aux = G.load_ply(args.start_ply, cfg.model.max_gaussians,
                                     cfg.model.sh_degree)
        else:
            params, aux = G.create_from_pcd(
                info.points, info.colors, cfg.model.max_gaussians,
                cfg.model.sh_degree, cfg.model.envmap_resolution,
                cfg.model.envmap_init_value)
        # reset materials to init values (train.py:62-72)
        import dataclasses
        from irgs_tpu.utils.math3d import inverse_sigmoid
        from irgs_tpu.scene.gaussians import inverse_base_color_activation
        params = dataclasses.replace(
            params,
            base_color=jnp.full_like(params.base_color, float(
                inverse_base_color_activation(jnp.float32(cfg.opt.init_base_color_value)))),
            roughness=jnp.full_like(params.roughness, float(
                inverse_sigmoid(jnp.float32(cfg.opt.init_roughness_value)))))
        light_transform = LIGHT_ROTATE_TRANSFORM if info.light_rotate else None

    h, w = gt_images[0].shape[:2]
    st = s2.from_configs(cfg, img_w=w, img_h=h)
    grid = gt.build_grid_from_gaussians(params, aux, st.tracer)
    state, optimizer = s2.init_state(params, aux, cfg.opt)
    cam_params = [c.params() for c in cams]
    gt_dev = [jnp.asarray(g) for g in gt_images]

    render_vis_j = None
    if args.vis_interval:
        from irgs_tpu.render.eval import EvalConfig, render_ir_eval
        vcfg = EvalConfig(img_w=w, img_h=h, diffuse_sample_num=64,
                          light_sample_num=0, tracer=st.tracer,
                          white_background=cfg.model.white_background,
                          dup_capacity=st.dup_capacity)
        render_vis_j = jax.jit(
            lambda p, a, g, c: render_ir_eval(p, a, g, c, vcfg))

    rng = np.random.RandomState(args.seed)
    order = rng.permutation(len(cams))
    t0 = time.time()
    log_path = os.path.join(cfg.model.model_path, "train_log.jsonl")
    with open(log_path, "a") as logf:
        for it in range(1, cfg.opt.iterations + 1):
            i = int(order[it % len(cams)])
            if it % len(cams) == 0:
                order = rng.permutation(len(cams))
            key, k = jax.random.split(key)
            mask = jnp.asarray(masks[i]) if masks[i] is not None else None
            state, metrics = s2.stage2_step(state, grid, cam_params[i],
                                            gt_dev[i], mask, k,
                                            st=st, optimizer=optimizer)
            if cfg.opt.lr_scale > 0:
                grid = gt.build_grid_from_gaussians(state.params, state.aux, st.tracer)
            if it % 50 == 0 or it == 1:
                m = {k_: float(v) for k_, v in metrics.items()}
                m.update(iter=it, elapsed=round(time.time() - t0, 1))
                print(json.dumps(m), flush=True)
                logf.write(json.dumps(m) + "\n")
                logf.flush()
            if render_vis_j is not None and (it % args.vis_interval == 0 or it == 1):
                from irgs_tpu.utils.vis import save_aov_grid, save_envmap_png
                out = render_vis_j(state.params, state.aux, grid, cam_params[0])
                panels = {k: out[k] for k in (
                    "render", "render_sh", "diffuse", "specular", "base_color",
                    "roughness", "rend_alpha", "rend_normal", "surf_normal",
                    "surf_depth", "rend_dist", "visibility", "light",
                    "light_indirect", "light_direct", "env_only") if k in out}
                panels["gt"] = np.asarray(gt_dev[0])
                save_aov_grid(os.path.join(cfg.model.model_path, "vis",
                                           f"iter_{it:06d}.png"), panels)
                save_envmap_png(
                    os.path.join(cfg.model.model_path, "vis",
                                 f"env_{it:06d}.png"),
                    jnp.exp(state.params.env))
            if it % 5000 == 0 or it == cfg.opt.iterations:
                out_dir = os.path.join(cfg.model.model_path, "point_cloud",
                                       f"iteration_{it}")
                os.makedirs(out_dir, exist_ok=True)
                G.save_ply(os.path.join(out_dir, "point_cloud.ply"),
                           state.params, state.aux)
    print("done:", cfg.model.model_path)


if __name__ == "__main__":
    main()
