"""NVS rendering + metrics CLI.

≙ reference render.py:32-135: load a trained stage-2 model, render the test
split with all AOVs, write per-image PNGs and nvs_results.json
(PSNR/SSIM/LPIPS).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import imageio.v3 as iio
    import jax
    import jax.numpy as jnp
    import numpy as np

    from irgs_tpu.config import add_config_args, apply_args, load_config
    from irgs_tpu.eval import metrics as M
    from irgs_tpu.ops import grid_tracer as gt
    from irgs_tpu.render.eval import EvalConfig, render_ir_eval
    from irgs_tpu.scene import gaussians as G
    from irgs_tpu.scene.datasets import LIGHT_ROTATE_TRANSFORM, load_scene

    parser = argparse.ArgumentParser()
    # -m/--model_path comes from add_config_args below (config shorthand);
    # adding it here too is an argparse conflict (crashed the e2e NVS step)
    parser.add_argument("--iteration", type=int, default=-1)
    # ≙ reference render.py:124-129 (--skip_train / --skip_test); train-split
    # rendering is opt-in via --no-skip_train
    parser.add_argument("--skip_train", action=argparse.BooleanOptionalAction,
                        default=True)
    parser.add_argument("--skip_test", action="store_true", default=False)
    parser.add_argument("--max_images", type=int, default=-1)
    parser.add_argument("--n_devices", type=int, default=1,
                        help="shard the MC sample axis over N devices "
                             "(render/eval.py render_ir_eval mesh path)")
    cfg0 = load_config(".")
    add_config_args(parser, cfg0)
    args = parser.parse_args()
    if not args.model_path:
        parser.error("-m/--model_path is required")
    cfg = load_config(args.model_path)
    cfg = apply_args(cfg, args)

    # latest iteration dir
    pc_dir = os.path.join(args.model_path, "point_cloud")
    iters = sorted(int(d.split("_")[1]) for d in os.listdir(pc_dir))
    it = args.iteration if args.iteration > 0 else iters[-1]
    ply = os.path.join(pc_dir, f"iteration_{it}", "point_cloud.ply")
    params, aux = G.load_ply(ply, cfg.model.max_gaussians, cfg.model.sh_degree,
                             env_activation=cfg.model.envmap_activation)

    info = load_scene(cfg.model.source_path, cfg.model.white_background,
                      eval_split=True, resolution=cfg.model.resolution)
    splits = []
    if not args.skip_test:
        splits.append(("test", info.test_cameras or info.train_cameras))
    if not args.skip_train:
        splits.append(("train", info.train_cameras))
    cams = splits[0][1] if splits else info.train_cameras
    if args.max_images > 0:
        splits = [(n, cs[:args.max_images]) for n, cs in splits]
        cams = cams[:args.max_images]
    transform = jnp.asarray(LIGHT_ROTATE_TRANSFORM) if info.light_rotate else None

    h, w = cams[0].height, cams[0].width
    ecfg = EvalConfig(
        img_w=w, img_h=h, active_sh_degree=cfg.model.sh_degree,
        diffuse_sample_num=cfg.pipe.diffuse_sample_num,
        light_sample_num=cfg.pipe.light_sample_num,
        wo_indirect=cfg.pipe.wo_indirect,
        white_background=cfg.model.white_background,
        env_activation=cfg.model.envmap_activation,
        tracer=gt.TracerConfig.from_pipe(cfg.pipe, eval=True))
    grid = gt.build_grid_from_gaussians(params, aux, ecfg.tracer)

    mesh = None
    if args.n_devices > 1:
        from irgs_tpu.parallel import make_mesh
        mesh = make_mesh(args.n_devices)
        print(f"sample-sharded eval over {args.n_devices} devices", flush=True)
    # eager: foreground-compacted chunk loop (each chunk is one jitted
    # dispatch; background pixels never pay the MC budget — ≙ reference
    # mask = render_alpha[0] > 0, gaussian_renderer/__init__.py:215-216)
    render_j = lambda p, g, c: render_ir_eval(
        p, aux, g, c, ecfg, env_transform=transform, mesh=mesh)

    vgg = M.load_vgg16_weights()
    for split_name, split_cams in splits:
        out_dir = os.path.join(args.model_path, split_name, f"ours_{it}")
        os.makedirs(out_dir, exist_ok=True)
        psnrs, ssims, lpipss = [], [], []
        for i, cam in enumerate(split_cams):
            out = render_j(params, grid, cam.params())
            render = np.asarray(jnp.clip(out["render"], 0, 1))
            gt_img = cam.image
            psnrs.append(float(M.psnr(jnp.asarray(render), jnp.asarray(gt_img))))
            ssims.append(float(M.ssim(jnp.asarray(render), jnp.asarray(gt_img))))
            lp = M.lpips_fn(jnp.asarray(render), jnp.asarray(gt_img), vgg)
            lpipss.append(lp)
            iio.imwrite(os.path.join(out_dir, f"{cam.image_name}_render.png"),
                        (render * 255).astype(np.uint8))
            for k in ("base_color", "roughness", "diffuse", "specular",
                      "visibility", "light_indirect"):
                img = np.asarray(jnp.clip(out[k], 0, 1))
                if img.shape[-1] == 1:
                    img = np.repeat(img, 3, -1)
                iio.imwrite(os.path.join(out_dir, f"{cam.image_name}_{k}.png"),
                            (img * 255).astype(np.uint8))
            print(f"[{split_name} {i+1}/{len(split_cams)}] {cam.image_name} "
                  f"psnr={psnrs[-1]:.2f}", flush=True)

        results = {
            "psnr": float(np.mean(psnrs)),
            "ssim": float(np.mean(ssims)),
            "lpips": None if lpipss[0] is None else float(np.mean(lpipss)),
            # reference key aliases (render.py:75-82 writes *_avg) so existing
            # collect scripts keep working
            "psnr_avg": float(np.mean(psnrs)),
            "ssim_avg": float(np.mean(ssims)),
            "lpips_avg": None if lpipss[0] is None else float(np.mean(lpipss)),
            "per_image_psnr": psnrs,
        }
        with open(os.path.join(args.model_path, split_name,
                               "nvs_results.json"), "w") as f:
            json.dump(results, f, indent=2)
        print(split_name,
              json.dumps({k: results[k] for k in ("psnr", "ssim", "lpips")}))


if __name__ == "__main__":
    main()
