"""Material (albedo/roughness) evaluation + albedo-scale computation CLI.

≙ reference compute_albedo_scale_syn4.py (median per-channel GT/pred albedo
ratio over train views → albedo_scale.json) and eval_material_syn4.py
(albedo/roughness PSNR after channel rescale). Run with --compute_scale
first, then the eval pass.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def find_gt_map(source_path, subdir, name):
    d = os.path.join(source_path, subdir)
    if not os.path.isdir(d):
        return None
    base = os.path.basename(name).split(".")[0]
    # exact stem first (r_1 must not match r_10.png), substring fallback
    for f in sorted(os.listdir(d)):
        if os.path.splitext(f)[0] == base:
            return os.path.join(d, f)
    for f in sorted(os.listdir(d)):
        if base in f:
            return os.path.join(d, f)
    return None


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from irgs_tpu.config import load_config
    from irgs_tpu.eval import metrics as M
    from irgs_tpu.ops import grid_tracer as gt
    from irgs_tpu.ops import surfel_raster as sr
    from irgs_tpu.render import ir
    from irgs_tpu.scene import gaussians as G
    from irgs_tpu.scene.datasets import _load_image_any, load_scene
    from irgs_tpu.utils.math3d import rgb_to_srgb, srgb_to_rgb

    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model_path", required=True)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--compute_scale", action="store_true")
    parser.add_argument("--albedo_rescale", type=int, default=2)
    parser.add_argument("--albedo_subdir", default="albedo")
    parser.add_argument("--roughness_subdir", default="roughness")
    args = parser.parse_args()
    cfg = load_config(args.model_path)

    pc_dir = os.path.join(args.model_path, "point_cloud")
    iters = sorted(int(d.split("_")[1]) for d in os.listdir(pc_dir))
    it = args.iteration if args.iteration > 0 else iters[-1]
    params, aux = G.load_ply(
        os.path.join(pc_dir, f"iteration_{it}", "point_cloud.ply"),
        cfg.model.max_gaussians, cfg.model.sh_degree,
        env_activation=cfg.model.envmap_activation)

    info = load_scene(cfg.model.source_path, cfg.model.white_background, True,
                      resolution=cfg.model.resolution)
    cams = info.train_cameras if args.compute_scale else (info.test_cameras or info.train_cameras)
    h, w = cams[0].height, cams[0].width

    def load_gt_map(path):
        """GT map resized to the eval resolution (the dataset may be at
        native 800^2 while the model trained/evals at -r 2 = 400^2)."""
        img = jnp.asarray(_load_image_any(path))
        if img.shape[:2] != (h, w):
            img = jax.image.resize(img, (h, w) + img.shape[2:], "bilinear")
        return img

    # material maps only need the rasterized G-buffer (material_only path,
    # render_ir __init__.py:177-192)
    @jax.jit
    def material_maps(params, cam):
        feats = jnp.concatenate([params.get_base_color(), params.get_roughness()], -1)
        raster = sr.rasterize(
            params.xyz, params.get_scaling(), params.rotation,
            params.get_opacity()[:, 0], params.get_features(), feats,
            jnp.zeros((params.n_capacity, 2)), cam, jnp.zeros(3),
            img_w=w, img_h=h, active_sh_degree=cfg.model.sh_degree,
            alive=aux.alive)
        return raster.feature[..., :3], raster.feature[..., 3:4], raster.alpha

    if args.compute_scale:
        gts, ours = [], []
        for cam in cams:
            path = find_gt_map(cfg.model.source_path, args.albedo_subdir,
                               cam.image_name)
            if path is None:
                continue
            gt_albedo = load_gt_map(path)[..., :3]
            base, _, alpha = material_maps(params, cam.params())
            m = np.asarray(alpha) > 0.5
            if cam.mask is not None:
                m = m & cam.mask
            gts.append(srgb_to_rgb(jnp.asarray(gt_albedo))[m])
            ours.append(np.asarray(base)[m])
        gts = np.concatenate([np.asarray(g) for g in gts])
        ours = np.concatenate(ours)
        ratio = gts / np.maximum(ours, 1e-6)
        scale_json = {
            "0": [1.0, 1.0, 1.0],
            "1": [float(np.median(ratio[:, 0]))] * 3,
            "2": [float(np.median(ratio[:, c])) for c in range(3)],
            "3": [float(np.mean(ratio[:, c])) for c in range(3)],
        }
        with open(os.path.join(args.model_path, "albedo_scale.json"), "w") as f:
            json.dump(scale_json, f)
        print(json.dumps(scale_json))
        return

    with open(os.path.join(args.model_path, "albedo_scale.json")) as f:
        scale = jnp.asarray(json.load(f)[str(args.albedo_rescale)])

    psnr_a, ssim_a, psnr_r = [], [], []
    for cam in cams:
        apath = find_gt_map(cfg.model.source_path, args.albedo_subdir, cam.image_name)
        if apath is None:
            continue
        gt_albedo = srgb_to_rgb(load_gt_map(apath)[..., :3])
        base, rough, alpha = material_maps(params, cam.params())
        pred = rgb_to_srgb(base * scale[None, None]) * alpha[..., None]
        gt_img = rgb_to_srgb(gt_albedo) * alpha[..., None]
        psnr_a.append(float(M.psnr(pred, gt_img)))
        ssim_a.append(float(M.ssim(pred, gt_img)))
        rpath = find_gt_map(cfg.model.source_path, args.roughness_subdir, cam.image_name)
        if rpath is not None:
            gt_rough = load_gt_map(rpath)[..., :1]
            psnr_r.append(float(M.psnr(rough * alpha[..., None],
                                       gt_rough * alpha[..., None])))
    results = {"psnr_albedo": float(np.mean(psnr_a)) if psnr_a else None,
               "ssim_albedo": float(np.mean(ssim_a)) if ssim_a else None,
               "psnr_roughness": float(np.mean(psnr_r)) if psnr_r else None}
    with open(os.path.join(args.model_path, "material_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
