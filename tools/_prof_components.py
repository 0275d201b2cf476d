import sys, time; sys.path.insert(0, "/root/repo")
import dataclasses
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tool_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import irgs_tpu
from irgs_tpu.config import Config
from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.ops import surfel_raster as sr
from irgs_tpu.render import ir
from irgs_tpu.scene import toy, envlight
from irgs_tpu.train import stage2 as s2

img = 400
params, aux = toy.make_sphere_scene(n_surface=100_000, n_capacity=2**17, env_resolution=128)
cams = toy.make_ring_cameras(2, width=img, height_px=img)
cfg = Config()
cfg.pipe.diffuse_sample_num = 256
cfg.opt.trace_num_rays = 2**18
st = s2.from_configs(cfg, img_w=img, img_h=img)
st = dataclasses.replace(st, dup_capacity=2**19)
grid = gt.build_grid_from_gaussians(params, aux, st.tracer)
cam = cams[0].params()
key = jax.random.PRNGKey(0)

def t(fn, *a, n=5, tag=""):
    out = fn(*a); jax.block_until_ready(jax.tree.leaves(out)[0])
    t0=time.time()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    print(f"{tag}: {(time.time()-t0)/n*1e3:.0f} ms", flush=True)
    return out

# 1. raster fwd
feats = jnp.concatenate([params.get_base_color(), params.get_roughness()], -1)
def raster_f(p):
    return sr.rasterize(p.xyz, p.get_scaling(), p.rotation, p.get_opacity()[:,0],
                        p.get_features(), jnp.concatenate([p.get_base_color(), p.get_roughness()], -1),
                        jnp.zeros((p.n_capacity,2)), cam, jnp.zeros(3),
                        img_w=img, img_h=img, active_sh_degree=3,
                        dup_capacity=2**19, alive=aux.alive, backend=st.raster_backend).color
t(jax.jit(raster_f), params, tag="raster fwd (pallas)")
g = jax.jit(jax.grad(lambda p: raster_f(p).sum()))
t(g, params, tag="raster fwd+bwd")

# 2. tracer: training ray batch
k1,k2,k3 = jax.random.split(key,3)
idx = jax.random.randint(k1,(2**18,),0,100_000)
ro = params.xyz[idx] + 0.05*jax.random.normal(k2,(2**18,3))
rd = jax.random.normal(k3,(2**18,3)); rd/=jnp.linalg.norm(rd,axis=-1,keepdims=True)
tf = ir.make_trace_fn(params, aux, grid, st.tracer, cam.cam_pos, 3)
t(jax.jit(lambda a,b: tf(a,b)), ro, rd, tag="trace fwd (seg2/.125)")

def trace_loss(p):
    tf2 = ir.make_trace_fn(p, aux, grid, st.tracer, cam.cam_pos, 3)
    o = tf2(ro, rd)
    return o.color.sum() + o.alpha.sum() + o.normal.sum()
t(jax.jit(jax.grad(trace_loss)), params, tag="trace fwd+bwd(params)")

cfg1 = dataclasses.replace(st.tracer, n_segments=1)
tf1 = ir.make_trace_fn(params, aux, grid, cfg1, cam.cam_pos, 3)
def trace_loss1(p):
    tf2 = ir.make_trace_fn(p, aux, grid, cfg1, cam.cam_pos, 3)
    o = tf2(ro, rd)
    return o.color.sum() + o.alpha.sum() + o.normal.sum()
t(jax.jit(jax.grad(trace_loss1)), params, tag="trace fwd+bwd(params) seg1")

# 3. full step
state, optimizer = s2.init_state(params, aux, cfg.opt)
gt_img = jnp.full((img, img, 3), 0.5)
def step(state, key):
    return s2.stage2_step(state, grid, cam, gt_img, None, key, st=st, optimizer=optimizer)
sjit = step
out = sjit(state, key); jax.block_until_ready(out[0].params.xyz)
t0=time.time()
s_=state
for i in range(5):
    s_, _ = sjit(s_, jax.random.fold_in(key,i))
jax.block_until_ready(s_.params.xyz)
print(f"full step: {(time.time()-t0)/5*1e3:.0f} ms", flush=True)
