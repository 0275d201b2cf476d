"""Generate a reference-style synthetic dataset with ANALYTIC ground truth.

VERDICT r3 next-round item #2 asks for one recorded end-to-end two-stage run
at reference scale; no Syn4Relight/TensoIR data exists in this environment,
so this tool produces the dataset: a NeRF-blender-layout scene
(transforms_{train,test}.json + RGBA pngs, ≙ the conventions parsed by
reference scene/dataset_readers.py:242-356) whose images come from an
ANALYTIC path tracer — exact sphere + ground-disk geometry, exact
ray-tested visibility, texture-cached one-bounce indirect — NOT from the
gaussian/tracer pipeline under test. Material model (lambertian + the GGX
lobe of render/ir.py) and the MC estimator (deterministic fibonacci +
envmap-importance MIS, ir.rendering_equation) are shared with eval, so
recorded NVS/relight PSNR measures reconstruction quality, not estimator
disagreement.

Scene: the shadow-parity layout (scene/toy.py make_shadow_scene): a
checker ground disk (r=2, y=-0.65) under a two-tone sphere (r=0.6,
c=(0,0.05,0)) with a roughness gradient, lit by an HDR envmap — hard MC
shadows + ground<->sphere interreflection.

Outputs under --out:
  transforms_train.json + train/r_*.png   (default 100 views, 800^2)
  transforms_test.json  + test/r_*.png
  gt_env.exr                              (the training-illumination GT env)
  <env>.exr + <env>/r_*.png               per relight env: HDR + relit test
                                          GT (the source_path/<MAP_NAME>/
                                          layout eval_relighting_syn4.py:150
                                          reads)

Run on the TPU:  python tools/make_dataset.py --out /tmp/irgs_dataset
"""

import argparse
import json
import math
import os
import sys
import time
import types

sys.path.insert(0, "/root/repo")

import jax

# the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it here so
# CPU smoke runs do not grab (and fault) the single TPU chip
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from irgs_tpu.render import ir
from irgs_tpu.render.sampling import fibonacci_sphere_sampling  # noqa: F401
from irgs_tpu.scene import envlight
from irgs_tpu.scene.cameras import Camera
from irgs_tpu.utils.exr import write_exr
from irgs_tpu.utils.math3d import rgb_to_srgb, safe_normalize

# ---------------------------------------------------------------------------
# Analytic scene (mirrors toy.make_shadow_scene's material fields)
# ---------------------------------------------------------------------------

SPH_C = jnp.array([0.0, 0.05, 0.0])
SPH_R = 0.6
GND_Y = -0.65
GND_R = 2.0
EPS = 1e-3


def intersect(ro, rd):
    """Exact nearest hit. ro/rd [N,3] (rd unit) -> (t, obj, pos, nrm);
    obj: 0 miss, 1 sphere, 2 ground disk."""
    oc = ro - SPH_C
    b = jnp.sum(oc * rd, -1)
    c = jnp.sum(oc * oc, -1) - SPH_R * SPH_R
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0, t1 = -b - sq, -b + sq
    t_s = jnp.where(t0 > EPS, t0, t1)
    hit_s = (disc > 0) & (t_s > EPS)
    t_s = jnp.where(hit_s, t_s, jnp.inf)

    dy = rd[..., 1]
    t_p = (GND_Y - ro[..., 1]) / jnp.where(jnp.abs(dy) < 1e-9, 1e-9, dy)
    pp = ro + t_p[..., None] * rd
    hit_p = (t_p > EPS) & (pp[..., 0] ** 2 + pp[..., 2] ** 2 <= GND_R ** 2)
    t_p = jnp.where(hit_p, t_p, jnp.inf)

    t = jnp.minimum(t_s, t_p)
    obj = jnp.where(jnp.isfinite(t),
                    jnp.where(t_s <= t_p, 1, 2), 0).astype(jnp.int32)
    pos = ro + jnp.where(jnp.isfinite(t), t, 0.0)[..., None] * rd
    nrm = jnp.where((obj == 1)[..., None],
                    safe_normalize(pos - SPH_C),
                    jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), pos.shape))
    return t, obj, pos, nrm


def occluded(ro, rd):
    t, obj, _, _ = intersect(ro, rd)
    return obj > 0


def materials(pos, obj):
    """base_color [.,3], roughness [.,1] as functions of the hit point
    (same fields as make_shadow_scene: checker ground 0.6-rough, two-tone
    sphere with a bottom-shiny roughness gradient)."""
    checker = jnp.mod(jnp.floor(pos[..., 0] / 0.35)
                      + jnp.floor(pos[..., 2] / 0.35), 2.0) >= 1.0
    g_col = jnp.where(checker[..., None],
                      jnp.array([0.75, 0.72, 0.65]),
                      jnp.array([0.18, 0.16, 0.22]))
    ang = jnp.arctan2(pos[..., 0], pos[..., 2])
    s_col = jnp.where((jnp.sin(8.0 * ang) > 0)[..., None],
                      jnp.array([0.7, 0.3, 0.15]),
                      jnp.array([0.15, 0.4, 0.65]))
    ymin, ymax = 0.05 - SPH_R, 0.05 + SPH_R   # sphere center y = 0.05
    s_rough = jnp.clip(0.15 + 0.6 * (pos[..., 1:2] - ymin) / (ymax - ymin),
                       0.15, 0.75)
    sph = (obj == 1)[..., None]
    base = jnp.where(sph, s_col, g_col)
    rough = jnp.where(sph, s_rough, jnp.full_like(s_rough, 0.6))
    return base, rough


# ---------------------------------------------------------------------------
# Envmaps (linear HDR lat-long, envlight direction convention)
# ---------------------------------------------------------------------------

def blob_env(h, w, blobs, sky=0.15):
    v, u = np.meshgrid((np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w,
                       indexing="ij")
    env = np.full((h, w, 3), sky, np.float32)
    for color, (cu, cv), s, amp in blobs:
        d2 = (u - cu) ** 2 + (v - cv) ** 2
        env += amp * np.exp(-d2 / (2 * s * s))[..., None] * np.asarray(color)
    return env.astype(np.float32)


def make_envs(res):
    h, w = res, 2 * res
    train = blob_env(h, w, [
        ([1.0, 0.9, 0.7], (0.3, 0.3), 0.05, 6.0),
        ([0.5, 0.7, 1.0], (0.75, 0.45), 0.08, 3.0)])
    sunset = blob_env(h, w, [
        ([1.0, 0.55, 0.25], (0.6, 0.42), 0.06, 8.0),
        ([0.3, 0.45, 0.9], (0.1, 0.25), 0.1, 2.0)], sky=0.08)
    sun = blob_env(h, w, [
        ([1.0, 0.95, 0.8], (0.22, 0.25), 0.03, 40.0)], sky=0.06)
    return {"gt_env": train, "sunset": sunset, "sun": sun}


# ---------------------------------------------------------------------------
# GT renderer: ir.rendering_equation with analytic visibility + cached
# one-bounce indirect
# ---------------------------------------------------------------------------

GRID_G = 512          # ground radiosity texture (GRID_G^2 over [-2,2]^2)
GRID_S = (256, 512)   # sphere radiosity texture (lat-long)
RAD_SPP = (192, 128)  # irradiance budget: [pts*spp, 3] temps pad 42x
                      # under the (8,128) tile layout, and the remat'd
                      # program keeps ~20 alive — budget sized to 16 GB


def _shade_points(pos, nrm, wo, obj, env_lin, env_pdf, trace_fn, spp, pid):
    base, rough = materials(pos, obj)
    cfg = ir.ShadeConfig(diffuse_sample_num=spp[0], light_sample_num=spp[1],
                         light_t_min=0.05, training=False,
                         env_activation="none")
    res = ir.rendering_equation(base, rough, nrm, pos, wo, env_lin, env_pdf,
                                trace_fn, cfg, pixel_ids=pid)
    return res["diffuse"] + res["specular"]


def build_radiosity(env_lin, env_pdf, spp=None):
    spp = spp or RAD_SPP
    """Direct-lit diffuse outgoing radiance textures for both objects:
    L(y) = albedo(y)/pi * E(y), E via the shared MIS estimator with
    analytic visibility. Cached -> secondary rays cost one texture read.
    (One-bounce indirect: secondary specular and deeper bounces are
    omitted from GT, documented in the dataset meta.)"""
    def occl_trace(ro, rd):
        b, s, _ = ro.shape
        occ = occluded(ro.reshape(-1, 3), rd.reshape(-1, 3))
        return types.SimpleNamespace(
            alpha=occ.reshape(b, s).astype(jnp.float32),
            color=jnp.zeros((b, s, 3), jnp.float32))

    cfg = ir.ShadeConfig(diffuse_sample_num=spp[0], light_sample_num=spp[1],
                         light_t_min=0.05, training=False,
                         env_activation="none")

    @jax.jit
    def _irradiance_impl(pts, nrm, env_lin_a, env_pdf_a):
        # f_d = 1 -> "diffuse" output is E/pi; multiply albedo later
        # (env tables are jit args, not closures — see make_frame_renderer)
        ones = jnp.full((pts.shape[0], 3), jnp.pi)
        res = ir.rendering_equation(ones, jnp.full((pts.shape[0], 1), 1.0),
                                    nrm, pts, nrm, env_lin_a, env_pdf_a,
                                    occl_trace, cfg,
                                    pixel_ids=jnp.arange(pts.shape[0]))
        return res["diffuse"]   # = E

    def irradiance(pts, nrm):
        return _irradiance_impl(pts, nrm, env_lin, env_pdf)

    # ground grid
    xs = (jnp.arange(GRID_G) + 0.5) / GRID_G * (2 * GND_R) - GND_R
    gx, gz = jnp.meshgrid(xs, xs, indexing="ij")
    gp = jnp.stack([gx, jnp.full_like(gx, GND_Y), gz], -1).reshape(-1, 3)
    gn = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), gp.shape)
    e_g = []
    # 8192-point chunks: one 65536x1024-sample dispatch OOMs 16 GB HBM
    RC = 2048
    for i in range(0, gp.shape[0], RC):
        e_g.append(irradiance(gp[i:i + RC], gn[i:i + RC]))
    e_g = jnp.concatenate(e_g).reshape(GRID_G, GRID_G, 3)
    alb_g, _ = materials(gp.reshape(GRID_G, GRID_G, 3), jnp.full(
        (GRID_G, GRID_G), 2, jnp.int32))
    rad_g = alb_g / jnp.pi * e_g

    # sphere lat-long grid
    sh, sw = GRID_S
    dirs = envlight.env_image_dirs(sh, sw).reshape(-1, 3)
    sp = SPH_C + SPH_R * dirs
    e_s = []
    for i in range(0, sp.shape[0], RC):
        e_s.append(irradiance(sp[i:i + RC], dirs[i:i + RC]))
    e_s = jnp.concatenate(e_s).reshape(sh, sw, 3)
    alb_s, _ = materials(sp.reshape(sh, sw, 3),
                         jnp.full((sh, sw), 1, jnp.int32))
    rad_s = alb_s / jnp.pi * e_s
    return rad_g, rad_s


def radiosity_lookup(pos, obj, rad_g, rad_s):
    # ground: nearest texel over [-2,2]^2
    gi = jnp.clip(((pos[..., 0] + GND_R) / (2 * GND_R) * GRID_G)
                  .astype(jnp.int32), 0, GRID_G - 1)
    gk = jnp.clip(((pos[..., 2] + GND_R) / (2 * GND_R) * GRID_G)
                  .astype(jnp.int32), 0, GRID_G - 1)
    lg = rad_g[gi, gk]
    # sphere: equirect nearest texel of the surface normal
    d = safe_normalize(pos - SPH_C)
    u, v = envlight.dirs_to_uv(d)
    sh, sw = GRID_S
    si = jnp.clip((v * sh).astype(jnp.int32), 0, sh - 1)
    sj = jnp.clip((u * sw).astype(jnp.int32), 0, sw - 1)
    ls = rad_s[si, sj]
    out = jnp.where((obj == 1)[..., None], ls, lg)
    return jnp.where((obj > 0)[..., None], out, 0.0)


def make_frame_renderer(env_lin, env_pdf, rad_g, rad_s, W, H, spp, chunk):
    # NOTE: env/radiosity tables are passed as jit ARGUMENTS, never closed
    # over — embedded device-array constants trigger pathological constant
    # folding on the remote-compile backend (hours-long compiles; this hung
    # every previous e2e attempt at the dataset step)
    env_lin = jnp.asarray(env_lin)

    @jax.jit
    def primary(camp):
        rd = camp.ray_dirs(W, H).reshape(-1, 3)
        ro = jnp.broadcast_to(camp.cam_pos, rd.shape)
        t, obj, pos, nrm = intersect(ro, rd)
        return rd, obj, pos, nrm

    @jax.jit
    def _shade_impl(pos, nrm, wo, obj, pid, env_lin_a, env_pdf_a,
                    rad_g_a, rad_s_a):
        def analytic_trace(ro, rd):
            b, s, _ = ro.shape
            _, obj_t, pos_t, _ = intersect(ro.reshape(-1, 3),
                                           rd.reshape(-1, 3))
            col = radiosity_lookup(pos_t, obj_t, rad_g_a, rad_s_a)
            return types.SimpleNamespace(
                alpha=(obj_t > 0).reshape(b, s).astype(jnp.float32),
                color=col.reshape(b, s, 3))

        return _shade_points(pos, nrm, wo, obj, env_lin_a, env_pdf_a,
                             analytic_trace, spp, pid)

    def shade(pos, nrm, wo, obj, pid):
        return _shade_impl(pos, nrm, wo, obj, pid, env_lin, env_pdf,
                           rad_g, rad_s)

    def render(camp, ss=2):
        """ss x ss supersampled frame -> (linear premultiplied rgb, alpha,
        premultiplied linear albedo, premultiplied roughness) [H,W,*]."""
        acc_rgb = np.zeros((H * W, 3), np.float32)
        acc_a = np.zeros((H * W,), np.float32)
        acc_alb = np.zeros((H * W, 3), np.float32)
        acc_rgh = np.zeros((H * W,), np.float32)
        offs = [(i + 0.5) / ss - 0.5 for i in range(ss)]
        for dx in offs:
            for dy in offs:
                cp = camp._replace(cx=camp.cx - dx, cy=camp.cy - dy)
                rd, obj, pos, nrm = primary(cp)
                fg = np.flatnonzero(np.asarray(obj) > 0)
                if fg.size == 0:
                    continue
                base, rough = materials(pos[fg], obj[fg])
                acc_alb[fg] += np.asarray(base)
                acc_rgh[fg] += np.asarray(rough)[:, 0]
                n_fg = fg.size
                n_pad = -(-n_fg // chunk) * chunk
                idx = np.zeros(n_pad, np.int64)
                idx[:n_fg] = fg
                rgb = np.zeros((n_pad, 3), np.float32)
                for i in range(0, n_pad, chunk):
                    sl = idx[i:i + chunk]
                    rgb[i:i + chunk] = np.asarray(shade(
                        pos[sl], nrm[sl], -rd[sl], obj[sl],
                        jnp.asarray(sl, jnp.int32)))
                acc_rgb[fg] += rgb[:n_fg]
                acc_a[fg] += 1.0
        n_ss = ss * ss
        return ((acc_rgb / n_ss).reshape(H, W, 3),
                (acc_a / n_ss).reshape(H, W),
                (acc_alb / n_ss).reshape(H, W, 3),
                (acc_rgh / n_ss).reshape(H, W))

    return render


# ---------------------------------------------------------------------------
# Cameras + transforms json
# ---------------------------------------------------------------------------

def spiral_cameras(n, W, H, fov=0.8, seed=0, radius=(2.6, 3.4),
                   elev=(8.0, 55.0), name_offset=0):
    """n cameras on a golden-angle spiral of the upper hemisphere looking at
    the origin; returns (Camera list, opengl c2w list)."""
    rng = np.random.RandomState(seed)
    cams, c2ws = [], []
    for i in range(n):
        az = 2 * math.pi * ((i * 0.61803398875) % 1.0)
        el = math.radians(elev[0] + (elev[1] - elev[0])
                          * ((i + 0.5) / n))
        r = rng.uniform(*radius)
        pos = np.array([r * math.cos(el) * math.cos(az),
                        r * math.sin(el),
                        r * math.cos(el) * math.sin(az)])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd], axis=-1)   # c2w rotation, COLMAP
        T = -R.T @ pos
        cams.append(Camera(i, R, T, fovx=fov, fovy=fov, image=None,
                           width=W, height=H,
                           image_name=f"r_{name_offset + i}"))
        c2w = np.eye(4)
        c2w[:3, :3] = R
        c2w[:3, 3] = pos
        c2w[:3, 1:3] *= -1          # COLMAP -> OpenGL (reader flips back)
        c2ws.append(c2w)
    return cams, c2ws


def write_transforms(path, fov, c2ws, split, name_offset=0):
    frames = [{"file_path": f"./{split}/r_{name_offset + i}",
               "transform_matrix": c2w.tolist()}
              for i, c2w in enumerate(c2ws)]
    with open(path, "w") as f:
        json.dump({"camera_angle_x": fov, "frames": frames}, f)


def save_png(path, rgb_lin_premul, alpha):
    import imageio.v3 as iio
    a = np.clip(alpha, 0, 1)
    straight = rgb_lin_premul / np.maximum(a[..., None], 1e-6)
    srgb = np.clip(np.asarray(rgb_to_srgb(jnp.asarray(straight))), 0, 1)
    rgba = np.concatenate([srgb, a[..., None]], -1)
    iio.imwrite(path, (rgba * 255).astype(np.uint8))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--img", type=int, default=800)
    ap.add_argument("--n_train", type=int, default=100)
    ap.add_argument("--n_test", type=int, default=8)
    ap.add_argument("--spp", type=int, nargs=2, default=(512, 256))
    ap.add_argument("--ss", type=int, default=2, help="supersampling grid")
    ap.add_argument("--env_res", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=1024)  # [chunk*spp, 3] temps pad 42x; ~20 live
    ap.add_argument("--relight_envs", nargs="*", default=["sunset", "sun"])
    ap.add_argument("--grid", type=int, nargs=2, default=(512, 256),
                    metavar=("GROUND", "SPHERE_H"),
                    help="radiosity texture resolutions")
    ap.add_argument("--rad_spp", type=int, nargs=2, default=(512, 512))
    args = ap.parse_args()

    global GRID_G, GRID_S, RAD_SPP
    GRID_G = args.grid[0]
    GRID_S = (args.grid[1], 2 * args.grid[1])
    RAD_SPP = tuple(args.rad_spp)

    os.makedirs(args.out, exist_ok=True)
    W = H = args.img
    fov = 0.8
    envs = make_envs(args.env_res)
    for name in ["gt_env"] + args.relight_envs:
        write_exr(os.path.join(args.out, f"{name}.exr"), envs[name])

    train_cams, train_c2w = spiral_cameras(args.n_train, W, H, fov, seed=0)
    # test frames numbered from 1000: image names stay globally unique, so
    # the albedo/roughness GT subdirs can hold both splits without ambiguity
    test_cams, test_c2w = spiral_cameras(args.n_test, W, H, fov, seed=1,
                                         elev=(12.0, 50.0), name_offset=1000)
    write_transforms(os.path.join(args.out, "transforms_train.json"),
                     fov, train_c2w, "train")
    write_transforms(os.path.join(args.out, "transforms_test.json"),
                     fov, test_c2w, "test", name_offset=1000)
    alb_dir = os.path.join(args.out, "albedo")
    rgh_dir = os.path.join(args.out, "roughness")
    os.makedirs(alb_dir, exist_ok=True)
    os.makedirs(rgh_dir, exist_ok=True)

    def render_set(cams, out_dir, env_name, save_materials=False):
        os.makedirs(out_dir, exist_ok=True)
        env_lin = jnp.asarray(envs[env_name])
        env_pdf = envlight.build_pdf(env_lin, activation="none")
        t0 = time.time()
        rad_g, rad_s = build_radiosity(env_lin, env_pdf)
        jax.block_until_ready(rad_s)
        print(f"[{env_name}] radiosity textures {time.time() - t0:.1f}s",
              flush=True)
        render = make_frame_renderer(env_lin, env_pdf, rad_g, rad_s, W, H,
                                     tuple(args.spp), args.chunk)
        for ci, cam in enumerate(cams):
            t0 = time.time()
            rgb, a, alb, rgh = render(cam.params(), ss=args.ss)
            save_png(os.path.join(out_dir, f"{cam.image_name}.png"), rgb, a)
            if save_materials:
                # GT albedo as sRGB png (≙ the syn4 albedo maps
                # eval_material_syn4.py reads via srgb_to_rgb)
                save_png(os.path.join(alb_dir, f"{cam.image_name}.png"),
                         alb, a)
                import imageio.v3 as iio
                r8 = (np.clip(rgh / np.maximum(a, 1e-6), 0, 1)
                      * 255).astype(np.uint8)
                iio.imwrite(os.path.join(rgh_dir, f"{cam.image_name}.png"),
                            np.stack([r8] * 3, -1))
            print(f"[{env_name}] {out_dir}/{cam.image_name}.png "
                  f"{time.time() - t0:.1f}s", flush=True)

    render_set(test_cams, os.path.join(args.out, "test"), "gt_env",
               save_materials=True)
    for name in args.relight_envs:
        render_set(test_cams, os.path.join(args.out, name), name)
    render_set(train_cams, os.path.join(args.out, "train"), "gt_env",
               save_materials=True)

    meta = {"img": args.img, "spp": args.spp, "ss": args.ss,
            "n_train": args.n_train, "n_test": args.n_test,
            "gt": "analytic sphere+disk, exact visibility, one-bounce "
                  "diffuse indirect (radiosity texture); estimator = "
                  "ir.rendering_equation (deterministic fib + env MIS)",
            "relight_envs": args.relight_envs}
    with open(os.path.join(args.out, "dataset_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print("dataset written to", args.out, flush=True)


if __name__ == "__main__":
    main()
