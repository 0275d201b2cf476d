"""Stage-1 training CLI (Ref-Gaussian geometry reconstruction).

≙ reference train_refgaussian.py. Usage:
    python train_refgaussian.py -s <scene_dir> -m <model_dir>
    python train_refgaussian.py --toy -m /tmp/s1 --iterations 2000
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from irgs_tpu.config import add_config_args, apply_args, stage1_config
    from irgs_tpu.scene import cubemap as cm
    from irgs_tpu.scene import ref_gaussians as rgs
    from irgs_tpu.train import densify as D
    from irgs_tpu.train import stage1_full as s1
    from irgs_tpu.utils.checkpoint import save_checkpoint, save_cmd_provenance

    parser = argparse.ArgumentParser()
    cfg = stage1_config()
    add_config_args(parser, cfg)
    parser.add_argument("--toy", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--mesh_interval", type=int, default=2000)
    # ≙ reference evaluate_psnr during training (train_refgaussian.py:236-249
    # + the train-PSNR tqdm): periodic held-out PSNR, logged to
    # train_log.jsonl. 0 = auto (six evals over the run).
    parser.add_argument("--psnr_eval_interval", type=int, default=0)
    parser.add_argument("--psnr_eval_views", type=int, default=2)
    args = parser.parse_args()
    cfg = apply_args(cfg, args)
    if not cfg.model.model_path:
        cfg.model.model_path = "/tmp/irgs_tpu_stage1"
    os.makedirs(cfg.model.model_path, exist_ok=True)
    cfg.save()
    save_cmd_provenance(cfg.model.model_path)
    opt = cfg.opt

    if args.toy:
        from irgs_tpu.render.eval import EvalConfig  # noqa: F401
        from irgs_tpu.scene import toy
        # toy scene is tiny: shrink the static capacities or every step pays
        # full-scale preprocess/sort cost
        cfg.model.max_gaussians = min(cfg.model.max_gaussians, 2 ** 15)
        cfg.pipe.dup_capacity = min(cfg.pipe.dup_capacity or 2 ** 18, 2 ** 18)
        cfg.save()   # re-save so checkpoint loaders see the clamped capacities
        gt_params, gt_aux = toy.make_sphere_scene(n_surface=4096, n_capacity=8192)
        cams = toy.make_ring_cameras(24, width=128, height_px=128)
        # GT images: plain 2DGS render of the GT scene
        from irgs_tpu.render import ref_gaussian as rr
        render_j = jax.jit(lambda p, a, c: rr.render_initial(
            p, a, c, jnp.zeros(3), img_w=128, img_h=128, active_sh_degree=3,
            dup_capacity=2 ** 18)["render"])
        gt_images = [np.asarray(render_j(gt_params, gt_aux, c.params())) for c in cams]
        masks = [None] * len(cams)
        pts = np.random.RandomState(0).uniform(-1.3, 1.3, (20000, 3)).astype(np.float32)
        colors = np.full((20000, 3), 0.5, np.float32)
        cameras_extent = 3.3
        test_cams = []
    else:
        from irgs_tpu.scene.datasets import load_scene
        info = load_scene(cfg.model.source_path, cfg.model.white_background,
                          eval_split=cfg.model.eval,
                          resolution=cfg.model.resolution)
        cams = info.train_cameras
        gt_images = [c.image for c in cams]
        masks = [c.mask for c in cams]
        pts, colors = info.points, info.colors
        cameras_extent = info.radius
        test_cams = info.test_cameras or []

    params, aux = rgs.init_ref_from_pcd(
        pts, colors, cfg.model.max_gaussians, cfg.model.sh_degree,
        env_res=128, init_metallic=opt.init_metallic_value,
        init_roughness=opt.init_roughness_value)
    optimizer = s1.make_ref_optimizer(opt, cameras_extent)
    state = s1.Stage1State(params, aux, optimizer.init(params), jnp.int32(0))
    fg_lut = cm.compute_fg_lut()
    vol = None

    h, w = gt_images[0].shape[:2]
    key = jax.random.PRNGKey(args.seed)
    rng = np.random.RandomState(args.seed)

    def make_static(phase, sh_deg, use_indirect):
        return s1.Stage1FullStatic(
            img_w=w, img_h=h, active_sh_degree=sh_deg,
            white_background=cfg.model.white_background, phase=phase,
            use_indirect=use_indirect,
            dup_capacity=cfg.pipe.dup_capacity or 2 ** 20,
            lambda_dssim=opt.lambda_dssim, lambda_dist=opt.lambda_dist,
            lambda_normal_render_depth=opt.lambda_normal_render_depth,
            lambda_normal_smooth=opt.lambda_normal_smooth,
            lambda_depth_smooth=opt.lambda_depth_smooth,
            lambda_mask_entropy=opt.lambda_mask_entropy,
            normal_loss_start=opt.normal_loss_start,
            dist_loss_start=opt.dist_loss_start,
            normal_smooth_from_iter=opt.normal_smooth_from_iter,
            normal_smooth_until_iter=opt.normal_smooth_until_iter)

    # held-out PSNR gate (≙ reference evaluate_psnr, train_refgaussian.py
    # :236-249): render test views with the CURRENT phase renderer
    import functools

    from irgs_tpu.render import ref_gaussian as rr
    from irgs_tpu.train import losses as L

    @functools.partial(jax.jit,
                       static_argnames=("phase", "sh_deg", "use_ind"))
    def eval_render(params, p_aux, camp, vol_, *, phase, sh_deg, use_ind):
        bg = jnp.full((3,), 1.0 if cfg.model.white_background else 0.0,
                      jnp.float32)
        kw = dict(img_w=w, img_h=h, active_sh_degree=sh_deg,
                  dup_capacity=cfg.pipe.dup_capacity or 2 ** 20)
        if phase == "initial":
            return rr.render_initial(params, p_aux, camp, bg, **kw)["render"]
        if phase == "volume":
            env2 = s1.EnvMips.build(params.env2)
            return rr.render_volume(params, p_aux, camp, bg, env2, fg_lut,
                                    vol=vol_, use_indirect=use_ind,
                                    **kw)["render"]
        env1 = s1.EnvMips.build(params.env1)
        return rr.render_surfel(params, p_aux, camp, bg, env1, fg_lut,
                                vol=vol_, use_indirect=use_ind,
                                **kw)["render"]

    psnr_iv = args.psnr_eval_interval or max(500, opt.iterations // 6)

    gt_dev = [jnp.asarray(g) for g in gt_images]
    order = rng.permutation(len(cams))
    sh_deg = 0
    use_indirect = False
    t0 = time.time()
    log = open(os.path.join(cfg.model.model_path, "train_log.jsonl"), "a")

    for it in range(1, opt.iterations + 1):
        if it > opt.feature_rest_from_iter and it % 1000 == 0:
            sh_deg = min(sh_deg + 1, cfg.model.sh_degree)
        if it == opt.indirect_from_iter + 1:
            use_indirect = True
        phase = ("initial" if it <= opt.init_until_iter else
                 "volume" if it <= opt.volume_render_until_iter else "surfel")
        st = make_static(phase, sh_deg, use_indirect and vol is not None)

        # material re-init at the volume->surfel phase switch
        # (≙ reset_gaussian_para, train_refgaussian.py:118-119,273-277)
        if (it == opt.volume_render_until_iter + 1
                and opt.volume_render_until_iter > opt.init_until_iter):
            p2 = rgs.reset_base_color(state.params, jax.random.fold_in(key, it))
            p2 = rgs.reset_metallic_full(p2, opt.init_metallic_value)
            p2 = rgs.reset_roughness(p2, opt.init_roughness_value)
            o2 = rgs.zero_adam_moments(
                state.opt_state, ("base_color", "metallic", "roughness"),
                state.params.n_capacity)
            state = state._replace(params=p2, opt_state=o2)

        i = int(order[it % len(cams)])
        if it % len(cams) == 0:
            order = rng.permutation(len(cams))
        mask = jnp.asarray(masks[i]) if masks[i] is not None else None
        state, metrics = s1.stage1_full_step(
            state, cams[i].params(), gt_dev[i], mask, fg_lut, vol,
            st=st, optimizer=optimizer)

        # held-out PSNR BEFORE the densify/reset block: an opacity reset in
        # the same iteration would otherwise be measured as a PSNR crater
        # (observed: 8.6 dB at a reset iter vs 24 dB train PSNR)
        if test_cams and args.psnr_eval_views > 0 and (
                it % psnr_iv == 0 or it == opt.iterations):
            ps = []
            for tc in test_cams[:args.psnr_eval_views]:
                img = eval_render(state.params, state.aux, tc.params(),
                                  vol, phase=phase, sh_deg=sh_deg,
                                  use_ind=use_indirect and vol is not None)
                ps.append(float(L.psnr(jnp.clip(img, 0, 1),
                                       jnp.asarray(tc.image))))
            rec = {"iter": it, "phase": phase,
                   "test_psnr": round(sum(ps) / len(ps), 3),
                   "test_views": len(ps)}
            print(json.dumps(rec), flush=True)
            log.write(json.dumps(rec) + "\n")
            log.flush()

        # densification + resets (train_refgaussian.py:195-234)
        if it < opt.densify_until_iter and it != opt.volume_render_until_iter:
            dens_int = (opt.densification_interval if it <= opt.init_until_iter
                        or it > opt.normal_prop_until_iter
                        else opt.densification_interval_when_prop)
            if it > opt.densify_from_iter and it % dens_int == 0:
                size_thr = 20 if it > opt.opacity_reset_interval else 0
                p2, a2, o2, stats = D.densify_and_prune(
                    state.params, state.aux, state.opt_state,
                    jax.random.fold_in(key, it),
                    grad_threshold=opt.densify_grad_threshold,
                    min_opacity=opt.prune_opacity_threshold,
                    extent=cameras_extent, max_screen_size=size_thr,
                    percent_dense=opt.percent_dense)
                state = s1.Stage1State(p2, a2, o2, state.step)
            has_reset0 = False
            if it % opt.opacity_reset_interval == 0 or (
                    cfg.model.white_background and it == opt.densify_from_iter):
                has_reset0 = True
                p2 = rgs.reset_opacity0(state.params, state.aux.alive)
                p2 = rgs.reset_metallic(p2, opt.init_metallic_value)
                # ≙ replace_tensor_to_optimizer zeroing exp_avg/exp_avg_sq
                # (ref_gaussian_model.py:580-594) — stale second moments
                # would otherwise blast the freshly reset values
                o2 = rgs.zero_adam_moments(state.opt_state,
                                           ("opacity", "metallic"),
                                           state.params.n_capacity)
                state = state._replace(params=p2, opt_state=o2)
            if (opt.init_until_iter < it <= opt.normal_prop_until_iter
                    and it % opt.normal_prop_interval == 0 and not has_reset0):
                p2 = rgs.reset_opacity1(state.params)
                touched = ["opacity", "scaling"]
                if it > opt.volume_render_until_iter > opt.init_until_iter:
                    p2 = rgs.dist_color(p2, jax.random.fold_in(key, 7 * it),
                                        metallic_thr=opt.metallic_msk_thr)
                    touched.append("features_dc")
                p2 = rgs.reset_scale(p2, opt.metallic_msk_thr,
                                     opt.enlarge_scale, opt.rough_msk_thr)
                o2 = rgs.zero_adam_moments(state.opt_state, touched,
                                           state.params.n_capacity)
                state = state._replace(params=p2, opt_state=o2)

        # TSDF refresh for reflection visibility (:236-249)
        if use_indirect and (it % args.mesh_interval == 0
                             or it == opt.indirect_from_iter + 1):
            vol = s1.reconstruct_tsdf(state.params, state.aux, cams,
                                      img_w=w, img_h=h, active_sh_degree=sh_deg,
                                      mesh_res=cfg.opt.mesh_res if cfg.opt.mesh_res <= 256 else 256,
                                      cameras_extent=cameras_extent,
                                      dup_capacity=cfg.pipe.dup_capacity or 2 ** 20)

        if it % 50 == 0 or it == 1:
            m = {k: float(v) for k, v in metrics.items()}
            m.update(iter=it, phase=phase,
                     n_alive=int(jnp.sum(state.aux.alive)),
                     elapsed=round(time.time() - t0, 1))
            if m.get("raster_overflow", 0) > 0:
                print(f"WARNING: capacity overflow at iter {it}: "
                      f"raster dup {m['raster_overflow']:.0f}; "
                      "increase --dup_capacity", flush=True)
            print(json.dumps(m), flush=True)
            log.write(json.dumps(m) + "\n")
            log.flush()
        if it % 10000 == 0 or it == opt.iterations:
            save_checkpoint(os.path.join(cfg.model.model_path, f"chkpnt{it}.ckpt"),
                            state, it,
                            extra=dict(kind="stage1",
                                       n_capacity=int(state.params.n_capacity),
                                       sh_degree=int(cfg.model.sh_degree),
                                       env_res=int(state.params.env1.shape[1])))
    print("done:", cfg.model.model_path)


if __name__ == "__main__":
    main()
