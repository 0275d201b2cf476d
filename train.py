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
    # multi-chip: mesh platform/device count must be configured BEFORE jax
    # initializes a backend, so pre-scan argv (argparse needs jax-free setup)
    argv = sys.argv
    _n_dev = (int(argv[argv.index("--n_devices") + 1])
              if "--n_devices" in argv else 1)
    _mesh_platform = (argv[argv.index("--mesh_platform") + 1]
                      if "--mesh_platform" in argv else "auto")
    if _n_dev > 1:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={_n_dev}")
    import jax
    if _mesh_platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
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
                        help="chkpnt*.ckpt (or run dir; latest taken) to "
                             "restore from. A stage-2 checkpoint resumes "
                             "training in place (≙ reference train.py:52-55); "
                             "a stage-1 checkpoint bridges geometry "
                             "(≙ restore_from_refgs / "
                             "--start_checkpoint_refgs)")
    parser.add_argument("--start_checkpoint_refgs", type=str, default=None,
                        help="explicit stage-1 checkpoint to bridge from "
                             "(≙ reference --start_checkpoint_refgs)")
    parser.add_argument("--checkpoint_interval", type=int, default=5000,
                        help="save a resumable stage-2 chkpnt<it>.ckpt every "
                             "N iters (0 = only at the end; ≙ reference "
                             "checkpoint_iterations, train.py:190-193)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--vis_interval", type=int, default=500,
                        help="save an AOV grid every N iters (0 = off)")
    parser.add_argument("--detect_anomaly", action="store_true",
                        help="check loss finiteness EVERY iter (costs one "
                             "device sync per step) instead of at the log "
                             "interval (≙ reference --detect_anomaly, "
                             "train.py:287,324)")
    parser.add_argument("--anomaly_continue", action="store_true",
                        help="after dumping a reproducer, keep training "
                             "instead of halting")
    parser.add_argument("--inject_nan_at", type=int, default=0,
                        help="TESTING: poison the envmap with NaN before "
                             "iter N to exercise the reproducer path")
    parser.add_argument("--n_devices", type=int, default=1,
                        help="data-parallel over N devices: each step "
                             "consumes N cameras, gradients pmean over the "
                             "ICI mesh (irgs_tpu/parallel/dp.py)")
    parser.add_argument("--mesh_platform", choices=("auto", "cpu"),
                        default="auto",
                        help="'cpu' forces the virtual CPU mesh (testing "
                             "multi-chip sharding without N real chips)")
    args = parser.parse_args()
    cfg = apply_args(cfg, args)
    if not cfg.model.model_path:
        cfg.model.model_path = "/tmp/irgs_tpu_stage2"
    os.makedirs(cfg.model.model_path, exist_ok=True)
    cfg.save()

    # --start_checkpoint dispatch: a stage-2 checkpoint resumes THIS trainer
    # in place (params + optax moments + step, ≙ reference train.py:52-55);
    # anything else is a stage-1 bridge (≙ --start_checkpoint_refgs)
    import glob as _glob
    s2_resume = None
    if args.start_checkpoint:
        cp = args.start_checkpoint
        if os.path.isdir(cp):
            cs = sorted(_glob.glob(os.path.join(cp, "chkpnt*.ckpt")),
                        key=lambda q: int("".join(filter(
                            str.isdigit, os.path.basename(q)))))
            cp = cs[-1] if cs else None
        if cp and os.path.exists(cp + ".json"):
            with open(cp + ".json") as f:
                if json.load(f).get("kind") == "stage2":
                    s2_resume = cp
                    # the stage-1 bridge branches below must not try to
                    # parse a stage-2 checkpoint as a Stage1State (leaf
                    # structure mismatch crashes from_bytes)
                    args.start_checkpoint = None
    if args.start_checkpoint_refgs:
        args.start_checkpoint = args.start_checkpoint_refgs

    key = jax.random.PRNGKey(args.seed)

    if args.toy:
        # CPU (virtual-mesh smoke tests): shrink the toy workload so GT
        # rendering takes seconds, not minutes
        on_cpu = jax.devices()[0].platform == "cpu"
        if on_cpu:
            # virtual-mesh smoke tests: shrink every budget so the whole toy
            # pipeline (GT render + training) takes seconds on CPU
            toy_res, toy_spp, toy_cams = 64, 8, 6
            cfg.pipe.diffuse_sample_num = min(cfg.pipe.diffuse_sample_num, 16)
            cfg.opt.trace_num_rays = min(cfg.opt.trace_num_rays, 2 ** 12)
            cfg.pipe.tracer_grid_res = 16
            cfg.pipe.tracer_max_cells = 8
            cfg.pipe.tracer_max_hits = 16
            cfg.pipe.tracer_hit_budget = 8
            cfg.pipe.tracer_max_crossings = 12
            cfg.pipe.dup_capacity = 2 ** 16
            print("toy on CPU: shrunk sample/tracer budgets for smoke-test "
                  "speed", flush=True)
        else:
            toy_res, toy_spp, toy_cams = 256, 64, 16
        if args.start_checkpoint:
            # two-stage toy pipeline: GT comes from the SAME underlying toy
            # scene train_refgaussian.py --toy reconstructs (its gt_params),
            # so the bridged stage-1 geometry is consistent with the images
            params, aux = toy.make_sphere_scene(
                n_surface=4096, n_capacity=8192,
                env_resolution=cfg.model.envmap_resolution)
        elif on_cpu:
            params, aux = toy.make_sphere_scene(
                n_surface=1024, n_capacity=2048,
                env_resolution=cfg.model.envmap_resolution)
        else:
            params, aux = toy.make_sphere_scene(
                n_surface=8192, n_capacity=16384,
                env_resolution=cfg.model.envmap_resolution)
        cams = toy.make_ring_cameras(toy_cams, width=toy_res, height_px=toy_res)
        # ground truth from the true scene; then reset materials
        import dataclasses
        from irgs_tpu.render.eval import EvalConfig, render_ir_eval
        ecfg = EvalConfig(img_w=toy_res, img_h=toy_res,
                          diffuse_sample_num=toy_spp,
                          light_sample_num=0,
                          env_activation=cfg.model.envmap_activation,
                          dup_capacity=2 ** 16 if on_cpu else 2 ** 21,
                          tracer=dataclasses.replace(
                              gt.TracerConfig.from_pipe(cfg.pipe, eval=True),
                              pair_capacity=2 ** 16 if on_cpu else 2 ** 21))
        grid = gt.build_grid_from_gaussians(params, aux, ecfg.tracer)
        render_j = jax.jit(lambda c: render_ir_eval(params, aux, grid, c, ecfg))
        gt_images = [np.asarray(render_j(c.params())["render"]) for c in cams]
        masks = [None] * len(cams)
        import dataclasses
        from irgs_tpu.utils.math3d import inverse_sigmoid
        from irgs_tpu.scene.gaussians import inverse_base_color_activation
        if args.start_checkpoint:
            # bridge the stage-1 toy reconstruction into stage-2 params
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
            print(f"restored stage-1 toy geometry @ iter {s1_iter} "
                  f"({int(aux.n_alive)} gaussians)", flush=True)
        else:
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
                                     cfg.model.sh_degree,
                                     env_activation=cfg.model.envmap_activation)
        else:
            params, aux = G.create_from_pcd(
                info.points, info.colors, cfg.model.max_gaussians,
                cfg.model.sh_degree, cfg.model.envmap_resolution,
                cfg.model.envmap_init_value,
                env_activation=cfg.model.envmap_activation)
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
    state, optimizer = s2.init_state(params, aux, cfg.opt)
    first_iter = 0
    if s2_resume:
        state, first_iter, optimizer = s2.load_stage2_checkpoint(
            s2_resume, cfg.opt)
        print(f"resumed stage-2 from {s2_resume} @ iter {first_iter}",
              flush=True)
    grid = gt.build_grid_from_gaussians(state.params, state.aux, st.tracer)
    n_ov = int(grid.oversize)
    if cfg.pipe.tracer_oversize_cap < 0:
        # -1 = force the merge OFF (window truncation + warning). Needed
        # 2026-08-21: the remote AOT helper crashes (HTTP 500, helper exit
        # 1) compiling the DIFFERENTIATED oversize merge in stage2_step;
        # the forward-only eval path compiles fine.
        cfg.pipe.tracer_oversize_cap = 0
        if n_ov > 0:
            print(f"WARNING: oversize merge forced off; {n_ov} gaussians "
                  "span > span_cap cells and are window-truncated",
                  flush=True)
    elif n_ov > 0 and cfg.pipe.tracer_oversize_cap == 0:
        # surfels wider than span_cap grid cells (floor/sky planes) would
        # be silently truncated; auto-enable the exact brute-force merge
        # sized to this scene, re-save cfg so evals replay the same setting
        cfg.pipe.tracer_oversize_cap = min(128, ((n_ov + 31) // 32) * 32)
        print(f"auto-enabled tracer_oversize_cap="
              f"{cfg.pipe.tracer_oversize_cap} ({n_ov} gaussians span > "
              f"span_cap cells)", flush=True)
        cfg.save()
        st = s2.from_configs(cfg, img_w=w, img_h=h)
        grid = gt.build_grid_from_gaussians(state.params, state.aux,
                                            st.tracer)
        if int(grid.oversize) > 0:
            print(f"WARNING: {int(grid.oversize)} oversize gaussians "
                  f"beyond the cap remain window-truncated", flush=True)
    cam_params = [c.params() for c in cams]
    gt_dev = [jnp.asarray(g) for g in gt_images]

    dp_step = None
    if args.n_devices > 1:
        from irgs_tpu.parallel import dp as dpm
        from irgs_tpu.scene.cameras import stack_camera_params
        if len(jax.devices()) < args.n_devices:
            raise SystemExit(
                f"--n_devices {args.n_devices} but only "
                f"{len(jax.devices())} devices visible; use "
                "--mesh_platform cpu for a virtual mesh")
        mesh = dpm.make_mesh(args.n_devices)
        dp_step = dpm.stage2_dp_step(mesh, st, optimizer)
        print(f"data-parallel over {args.n_devices} devices "
              f"({jax.devices()[0].platform}); each step consumes "
              f"{args.n_devices} cameras", flush=True)

    render_vis_j = None
    if args.vis_interval:
        from irgs_tpu.render.eval import EvalConfig, render_ir_eval
        vcfg = EvalConfig(img_w=w, img_h=h, diffuse_sample_num=64,
                          light_sample_num=0, tracer=st.tracer,
                          white_background=cfg.model.white_background,
                          env_activation=cfg.model.envmap_activation,
                          dup_capacity=st.dup_capacity)
        render_vis_j = jax.jit(
            lambda p, a, g, c: render_ir_eval(p, a, g, c, vcfg))

    rng = np.random.RandomState(args.seed)
    order = rng.permutation(len(cams))
    t0 = time.time()
    log_path = os.path.join(cfg.model.model_path, "train_log.jsonl")
    with open(log_path, "a") as logf:
        for it in range(first_iter + 1, cfg.opt.iterations + 1):
            i = int(order[it % len(cams)])
            if it % len(cams) == 0:
                order = rng.permutation(len(cams))
            key, k = jax.random.split(key)
            mask = jnp.asarray(masks[i]) if masks[i] is not None else None
            if args.inject_nan_at == it:
                import dataclasses as _dc2
                state = state._replace(params=_dc2.replace(
                    state.params, env=state.params.env * jnp.nan))
            prev_state = state
            if dp_step is not None:
                from irgs_tpu.scene.cameras import stack_camera_params
                idxs = rng.choice(len(cams), size=args.n_devices,
                                  replace=len(cams) < args.n_devices)
                cam_b = stack_camera_params([cams[j] for j in idxs])
                gt_b = jnp.stack([gt_dev[j] for j in idxs])
                keys_b = jax.random.split(k, args.n_devices)
                state, metrics = dp_step(state, grid, cam_b, gt_b, keys_b)
            else:
                state, metrics = s2.stage2_step(state, grid, cam_params[i],
                                                gt_dev[i], mask, k,
                                                st=st, optimizer=optimizer)
            # reproducer dump on non-finite loss (≙ the rasterizer debug
            # snapshot dump, diff_surfel_rasterization/__init__.py:88-95):
            # the PRE-step state + camera + PRNG key are saved so the exact
            # failing step can be replayed offline (tools/load_reproducer.py)
            if args.detect_anomaly or it % 50 == 0 or it == 1:
                loss_now = float(metrics["loss"])
                if not np.isfinite(loss_now):
                    from irgs_tpu.utils.checkpoint import save_checkpoint
                    rp = os.path.join(cfg.model.model_path,
                                      f"reproducer_{it:06d}.ckpt")
                    save_checkpoint(rp, prev_state, it,
                                    extra={"cam_index": i,
                                           "key": np.asarray(k).tolist(),
                                           "loss": loss_now,
                                           "kind": "stage2_nonfinite_loss"})
                    print(f"ERROR iter {it}: non-finite loss ({loss_now}); "
                          f"reproducer dumped to {rp} (replay with "
                          "tools/load_reproducer.py)", file=sys.stderr,
                          flush=True)
                    if not args.anomaly_continue:
                        raise SystemExit(3)
            if cfg.opt.lr_scale > 0:
                grid = gt.build_grid_from_gaussians(state.params, state.aux, st.tracer)
            if it % 50 == 0 or it == 1:
                m = {k_: float(v) for k_, v in metrics.items()}
                m.update(iter=it, elapsed=round(time.time() - t0, 1))
                print(json.dumps(m), flush=True)
                logf.write(json.dumps(m) + "\n")
                logf.flush()
                if m.get("raster_overflow", 0) > 0 or m.get("grid_overflow", 0) > 0:
                    print(f"WARNING iter {it}: CAPACITY OVERFLOW — "
                          f"raster dup {m.get('raster_overflow', 0):.0f}, "
                          f"grid pairs {m.get('grid_overflow', 0):.0f}; "
                          "results silently degrade. Raise --dup_capacity / "
                          "tracer pair_capacity.", file=sys.stderr, flush=True)
                if m.get("grid_oversize", 0) > 0:
                    print(f"WARNING iter {it}: {m['grid_oversize']:.0f} "
                          "gaussians span > span_cap grid cells — their "
                          "insertion is TRUNCATED to a centered window and "
                          "rays far from their center miss them. Raise "
                          "tracer span_cap or lower tracer_grid_res.",
                          file=sys.stderr, flush=True)
                if m.get("trace_more_frac", 0) > 0.05:
                    print(f"WARNING iter {it}: {100*m['trace_more_frac']:.1f}% "
                          "of traced rays still truncated after all re-trace "
                          "rounds — raise tracer_n_segments/retrace_frac.",
                          file=sys.stderr, flush=True)
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
                from irgs_tpu.scene import envlight as EL
                save_envmap_png(
                    os.path.join(cfg.model.model_path, "vis",
                                 f"env_{it:06d}.png"),
                    EL.activate(state.params.env,
                                cfg.model.envmap_activation))
            if it % 5000 == 0 or it == cfg.opt.iterations:
                out_dir = os.path.join(cfg.model.model_path, "point_cloud",
                                       f"iteration_{it}")
                os.makedirs(out_dir, exist_ok=True)
                G.save_ply(os.path.join(out_dir, "point_cloud.ply"),
                           state.params, state.aux,
                           env_activation=cfg.model.envmap_activation)
            ci = args.checkpoint_interval
            if (ci and it % ci == 0) or it == cfg.opt.iterations:
                s2.save_stage2_checkpoint(
                    os.path.join(cfg.model.model_path, f"chkpnt{it}.ckpt"),
                    state, it)
    print("done:", cfg.model.model_path)


if __name__ == "__main__":
    main()
