"""Relighting evaluation CLI.

≙ reference eval_relighting_syn4.py / eval_relighting_tensoir.py: per GT HDR
envmap, build a RelightEnv (mips + pdf + world transform), render the test
frames with relight=True and the albedo scale, and write
relighting_results.json (PSNR/SSIM/LPIPS per envmap + average).
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

    from irgs_tpu.config import load_config
    from irgs_tpu.eval import metrics as M
    from irgs_tpu.ops import grid_tracer as gt
    from irgs_tpu.ops import surfel_raster as sr
    from irgs_tpu.render import ir, relight
    from irgs_tpu.scene import cubemap as cm
    from irgs_tpu.scene import gaussians as G
    from irgs_tpu.scene.datasets import (LIGHT_ROTATE_TRANSFORM,
                                         _load_image_any, load_scene)
    from irgs_tpu.utils.math3d import rgb_to_srgb

    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model_path", required=True)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--envmaps", nargs="+", required=True,
                        help="paths to GT HDR/EXR lat-long envmaps")
    parser.add_argument("--albedo_rescale", type=int, default=2)
    parser.add_argument("--diffuse_sample_num", type=int, default=512)
    parser.add_argument("--light_sample_num", type=int, default=256)
    parser.add_argument("--max_images", type=int, default=-1)
    parser.add_argument("--split", choices=("test", "train"), default="test",
                        help="'train' relights the training frames "
                             "(≙ eval_relighting_enerf.py, which iterates "
                             "scene.getTrainCameras())")
    parser.add_argument("--save_env_composite", action="store_true",
                        help="also save render composited over the envmap "
                             "background (≙ the enerf 'render_env' capture)")
    parser.add_argument("--no_metrics", action="store_true",
                        help="skip PSNR/SSIM (relit train frames have no GT)")
    args = parser.parse_args()
    cfg = load_config(args.model_path)

    pc_dir = os.path.join(args.model_path, "point_cloud")
    iters = sorted(int(d.split("_")[1]) for d in os.listdir(pc_dir))
    it = args.iteration if args.iteration > 0 else iters[-1]
    params, aux = G.load_ply(
        os.path.join(pc_dir, f"iteration_{it}", "point_cloud.ply"),
        cfg.model.max_gaussians, cfg.model.sh_degree,
        env_activation=cfg.model.envmap_activation)

    scale_path = os.path.join(args.model_path, "albedo_scale.json")
    base_scale = jnp.ones(3)
    if os.path.exists(scale_path):
        with open(scale_path) as f:
            base_scale = jnp.asarray(json.load(f)[str(args.albedo_rescale)])

    info = load_scene(cfg.model.source_path, cfg.model.white_background, True,
                      resolution=cfg.model.resolution)
    cams = (info.train_cameras if args.split == "train"
            else info.test_cameras or info.train_cameras)
    if args.max_images > 0:
        cams = cams[:args.max_images]
    transform = jnp.asarray(LIGHT_ROTATE_TRANSFORM) if info.light_rotate else None
    h, w = cams[0].height, cams[0].width

    tracer_cfg = gt.TracerConfig.from_pipe(cfg.pipe, eval=True)
    grid = gt.build_grid_from_gaussians(params, aux, tracer_cfg)
    fg_lut = cm.compute_fg_lut()
    shade_cfg = ir.ShadeConfig(
        diffuse_sample_num=args.diffuse_sample_num,
        light_sample_num=args.light_sample_num,
        light_t_min=cfg.pipe.light_t_min, training=False)
    pix_chunk = max(2 ** 20 // (args.diffuse_sample_num + args.light_sample_num), 128)

    @jax.jit
    def gbuffer_j(params, cam):
        feats = jnp.concatenate([params.get_base_color() * base_scale[None],
                                 params.get_roughness()], -1)
        raster = sr.rasterize(
            params.xyz, params.get_scaling(), params.rotation,
            params.get_opacity()[:, 0], params.get_features(), feats,
            jnp.zeros((params.n_capacity, 2)), cam, jnp.zeros(3),
            img_w=w, img_h=h, active_sh_degree=cfg.model.sh_degree,
            alive=aux.alive)
        maps = ir.derive_geometry_maps(raster, cam, w, h)
        return raster, maps

    @jax.jit
    def diffuse_cache_j(px_c, params, grid, cam_pos):
        # envmap-independent half: traced ONCE per view chunk, shared by
        # every relighting envmap (relight.DiffuseTraceCache)
        trace_fn = ir.make_trace_fn(params, aux, grid, tracer_cfg,
                                    cam_pos, cfg.model.sh_degree,
                                    with_materials=True)
        return relight.trace_diffuse_cache(
            px_c["normal"], px_c["points"], trace_fn, shade_cfg)

    @jax.jit
    def shade_chunk_j(px_c, cache_c, params, grid, cam_pos,
                      env: relight.RelightEnv):
        trace_fn = ir.make_trace_fn(params, aux, grid, tracer_cfg,
                                    cam_pos, cfg.model.sh_degree,
                                    with_materials=True)
        return relight.rendering_equation_relight(
            px_c["base"], px_c["rough"], px_c["normal"], px_c["points"],
            px_c["wo"], env, trace_fn, shade_cfg, fg_lut,
            wo_indirect_relight=cfg.pipe.wo_indirect_relight,
            pixel_ids=px_c["pid"][:, 0], diffuse_cache=cache_c)

    def render_all_envs_j(params, grid, cam, envs):
        """One view under EVERY envmap: foreground-compacted chunk loop
        (≙ reference eval pixel set mask = render_alpha[0] > 0,
        gaussian_renderer/__init__.py:215-216), with the diffuse-half trace
        computed once per chunk and shared across envmaps — only the
        per-env light-importance samples re-trace. Returns
        ([img per env], alpha)."""
        raster, maps = gbuffer_j(params, cam)
        alpha = maps["alpha"]
        flat = lambda x: x.reshape(-1, x.shape[-1])
        n_px = w * h
        px = dict(base=flat(raster.feature[..., :3]),
                  rough=flat(raster.feature[..., 3:4]),
                  normal=flat(maps["normal_map"]), points=flat(maps["points"]),
                  wo=-flat(maps["rays_d"]),
                  pid=jnp.arange(n_px, dtype=jnp.int32)[:, None])
        fg = np.flatnonzero(np.asarray(alpha[..., 0]) > 0)
        if fg.size == 0:
            fg = np.zeros((1,), np.int64)
        n_fg = int(fg.size)
        n_chunks = -(-n_fg // pix_chunk)
        idx = np.zeros(n_chunks * pix_chunk, np.int32)
        idx[:n_fg] = fg
        px = {k: v[jnp.asarray(idx)] for k, v in px.items()}
        outs = [[] for _ in envs]
        for c in range(n_chunks):
            px_c = {k: v[c * pix_chunk:(c + 1) * pix_chunk]
                    for k, v in px.items()}
            cache_c = diffuse_cache_j(px_c, params, grid, cam.cam_pos)
            for e, env in enumerate(envs):
                re_c = shade_chunk_j(px_c, cache_c, params, grid,
                                     cam.cam_pos, env)
                # sync per chunk: bounds queue depth, frames resumable
                outs[e].append({k: np.asarray(re_c[k])
                                for k in ("diffuse", "specular")})
        imgs = []
        for e in range(len(envs)):
            re = {}
            for k in ("diffuse", "specular"):
                acc = np.concatenate([o[k] for o in outs[e]])[:n_fg]
                buf = np.zeros((n_px, acc.shape[-1]), np.float32)
                buf[fg] = acc
                re[k] = jnp.asarray(buf.reshape(h, w, -1))
            imgs.append(rgb_to_srgb(re["diffuse"] + re["specular"]) * alpha)
        return imgs, alpha

    def per_env_gt(name, cam):
        """Relit GT for this envmap: the reference loads
        `source_path/<MAP_NAME>/<frame>.png` (eval_relighting_syn4.py:149-151,
        MAP_NAME from the environment). We probe MAP_NAME first, then the
        envmap stem as the directory name (the Syn4Relight layout), and fall
        back to the camera's training-illumination image (→ None here so the
        caller knows it is NOT relit GT). Returns (rgb*mask, mask) resized to
        the render resolution, mirroring the reference's bilinear resize +
        gt*mask composite (eval_relighting_syn4.py:163-173)."""
        for sub in (os.environ.get("MAP_NAME", ""), name):
            if not sub:
                continue
            p = os.path.join(cfg.model.source_path, sub,
                             f"{cam.image_name}.png")
            if not os.path.exists(p):
                continue
            rgba = _load_image_any(p)
            rgb = jnp.asarray(rgba[..., :3])
            mask = (jnp.asarray(rgba[..., 3:4]) if rgba.shape[-1] == 4
                    else jnp.ones_like(rgb[..., :1]))
            if rgb.shape[:2] != (h, w):
                rgb = jax.image.resize(rgb, (h, w, 3), "bilinear")
                mask = jax.image.resize(mask, (h, w, 1), "bilinear")
            return rgb * mask, mask
        return None, None

    bg_val = 1.0 if cfg.model.white_background else 0.0
    results = {}
    out_root = os.path.join(args.model_path, "relight")
    env_list = []
    for env_path in args.envmaps:
        name = os.path.splitext(os.path.basename(env_path))[0]
        hdr = jnp.asarray(_load_image_any(env_path)[..., :3])
        env = relight.build_relight_env(hdr, transform=transform)
        out_dir = os.path.join(out_root, name)
        os.makedirs(out_dir, exist_ok=True)
        env_list.append((name, env, out_dir))
    acc = {name: {"psnr": [], "ssim": [], "lpips": [], "fallback": False}
           for name, _, _ in env_list}
    for cam in cams:
        imgs, alpha = render_all_envs_j(params, grid, cam.params(),
                                        [e for _, e, _ in env_list])
        for (name, env, out_dir), img in zip(env_list, imgs):
            if not args.no_metrics:
                gt_img, gt_mask = per_env_gt(name, cam)
                cmp_img = None
                if gt_img is not None:
                    # ≙ reference render*mask + (1-mask)*bg vs gt*mask
                    cmp_img = img * gt_mask + (1 - gt_mask) * bg_val
                elif cam.image is not None:
                    # no relit GT found for this envmap: compare against the
                    # TRAINING-illumination image instead. These are NOT
                    # relighting metrics (the reference always evaluates
                    # against relit GT, eval_relighting_syn4.py) — record
                    # them under *_trainlight keys, never *_pbr.
                    if not acc[name]["fallback"]:
                        print(f"WARNING: no relit GT found for envmap "
                              f"'{name}' — falling back to the training-"
                              f"illumination image; metrics recorded as "
                              f"psnr_trainlight (not psnr_pbr)", flush=True)
                        acc[name]["fallback"] = True
                    gt_img, cmp_img = jnp.asarray(cam.image), img
                if gt_img is not None:
                    acc[name]["psnr"].append(float(M.psnr(cmp_img, gt_img)))
                    acc[name]["ssim"].append(float(M.ssim(cmp_img, gt_img)))
                    lp = M.lpips_fn(cmp_img, gt_img)
                    if lp is not None:
                        acc[name]["lpips"].append(lp)
                    os.makedirs(os.path.join(out_dir, "gt"), exist_ok=True)
                    iio.imwrite(
                        os.path.join(out_dir, "gt", f"{cam.image_name}.png"),
                        (np.clip(np.asarray(gt_img), 0, 1) * 255
                         ).astype(np.uint8))
            iio.imwrite(os.path.join(out_dir, f"{cam.image_name}.png"),
                        (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8))
            if args.save_env_composite:
                # render over the envmap background along the camera rays
                # (≙ enerf 'render_env': bg = srgb(env(ray_dir)))
                from irgs_tpu.render.relight import env_query
                rays = cam.params().ray_dirs(w, h, normalize=True)
                env_bg = rgb_to_srgb(env_query(env, rays.reshape(-1, 3))
                                     ).reshape(h, w, 3)
                comp = img + jnp.clip(env_bg, 0, 1) * (1 - alpha)
                iio.imwrite(
                    os.path.join(out_dir, f"{cam.image_name}_env.png"),
                    (np.clip(np.asarray(comp), 0, 1) * 255).astype(np.uint8))
        print(f"[{cam.image_name}] done ({len(env_list)} envs)", flush=True)
    for name, _, _ in env_list:
        if acc[name]["psnr"]:
            # reference key names: eval_relighting_syn4.py:214-222.
            # Training-light fallback metrics get distinct keys so a
            # misconfigured dataset layout can't produce plausible-looking
            # "relighting" numbers (ADVICE r4).
            sfx = "trainlight" if acc[name]["fallback"] else "pbr"
            results[name] = {
                f"psnr_{sfx}": float(np.mean(acc[name]["psnr"])),
                f"ssim_{sfx}": float(np.mean(acc[name]["ssim"])),
                f"lpips_{sfx}": (float(np.mean(acc[name]["lpips"]))
                                 if acc[name]["lpips"] else None),
            }
            print(name, results[name], flush=True)

    envs = [r for r in results.values() if isinstance(r, dict)]
    for k in ("psnr_pbr", "ssim_pbr", "lpips_pbr"):
        vals = [r[k] for r in envs if r.get(k) is not None]
        results[f"{k}_avg"] = float(np.mean(vals)) if vals else None
    with open(os.path.join(args.model_path, "relighting_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: results[f"{k}_avg"]
                      for k in ("psnr_pbr", "ssim_pbr", "lpips_pbr")}))


if __name__ == "__main__":
    main()
