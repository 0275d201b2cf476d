import sys, time; sys.path.insert(0, "/root/repo")
import dataclasses
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tool_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import irgs_tpu
import time as _t
print("imports done", flush=True)
from irgs_tpu.config import Config
from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.render import ir
from irgs_tpu.scene import toy
from irgs_tpu.utils import math3d

print("scene...", flush=True)
params, aux = toy.make_sphere_scene(n_surface=100_000, n_capacity=2**17, env_resolution=128)
cfg = Config()
tc = gt.TracerConfig(grid_res=48, pair_capacity=2**21, max_cells=12,
                     max_hits=40, hit_budget=16, max_crossings=24, n_segments=1)
print("grid...", flush=True)
grid = gt.build_grid_from_gaussians(params, aux, tc)
import jax as _j; _j.block_until_ready(grid.cell_meta)
print("grid done", flush=True)
k1,k2,k3 = jax.random.split(jax.random.PRNGKey(3),3)
Rr = 2**16
idx = jax.random.randint(k1,(Rr,),0,100_000)
ro = params.xyz[idx] + 0.05*jax.random.normal(k2,(Rr,3))
rd = jax.random.normal(k3,(Rr,3)); rd/=jnp.linalg.norm(rd,axis=-1,keepdims=True)
s = params.get_scaling()
Rm = math3d.quat_to_rotmat(params.rotation)
inputs = gt.TraceInputs(
    means3d=params.xyz,
    opacity=jnp.where(aux.alive, params.get_opacity()[:, 0], 0.0),
    ru=Rm[:, :, 0]/s[:, 0:1], rv=Rm[:, :, 1]/s[:, 1:2],
    normals=params.world_normals(cam_pos=jnp.zeros(3)),
    shs=params.get_features(), features=jnp.zeros((2**17, 0)))
geom = gt._pack_geom(inputs)

def t(fn, *a, n=5, tag=""):
    out = fn(*a); jax.block_until_ready(jax.tree.leaves(out)[0])
    t0=time.time()
    for _ in range(n): out = fn(*a)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    print(f"{tag}: {(time.time()-t0)/n*1e3:.0f} ms", flush=True)
    return out

cells = t(jax.jit(lambda a,b: gt.collect_cells(a,b,grid,tc)), ro, rd, tag="collect_cells")
hits = t(jax.jit(lambda a,b,c: gt.select_hits(a,b,grid.sorted_gauss,c,geom,tc,False)), ro, rd, cells, tag="select_hits")
out = t(jax.jit(lambda a,b,h: gt.blend_hits(a,b,inputs,h.gs,h.valid,tc,3)), ro, rd, hits, tag="blend fwd (sh3)")

def loss(inp, a, b):
    o = gt.blend_hits(a, b, inp, hits.gs, hits.valid, tc, 3)
    return o.color.sum() + o.alpha.sum() + o.normal.sum()
t(jax.jit(jax.grad(loss)), inputs, ro, rd, tag="blend fwd+bwd(inputs)")
