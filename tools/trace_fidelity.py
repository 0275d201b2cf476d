import dataclasses, time
import jax, jax.numpy as jnp
import irgs_tpu
from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.render import ir
from irgs_tpu.scene import toy

params, aux = toy.make_sphere_scene(n_surface=100_000, n_capacity=2**17,
                                    env_resolution=64)
key = jax.random.PRNGKey(3)
k1, k2, k3 = jax.random.split(key, 3)
# rays like stage-2 MC rays: origins near the surface, random dirs
idx = jax.random.randint(k1, (65536,), 0, 100_000)
ro = params.xyz[idx] + 0.05 * jax.random.normal(k2, (65536, 3))
rd = jax.random.normal(k3, (65536, 3))
rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

def run(name, **kw):
    cfg = gt.TracerConfig(grid_res=48, pair_capacity=2**21, **kw)
    grid = gt.build_grid_from_gaussians(params, aux, cfg)
    tf = ir.make_trace_fn(params, aux, grid, cfg, jnp.zeros(3), 3)
    out = jax.jit(lambda ro, rd: tf(ro, rd))(ro, rd)
    jax.block_until_ready(out.alpha)
    return out

ref = run("oracle", max_cells=16, max_hits=96, hit_budget=32, max_crossings=0)
for name, kw in [
    ("cur(48h,32cr,12c)", dict(max_cells=12, max_hits=48, hit_budget=16, max_crossings=32)),
    ("mid(40h,24cr,12c)", dict(max_cells=12, max_hits=40, hit_budget=16, max_crossings=24)),
    ("low(32h,20cr,10c)", dict(max_cells=10, max_hits=32, hit_budget=16, max_crossings=20)),
]:
    o = run(name, **kw)
    da = float(jnp.abs(o.alpha - ref.alpha).mean())
    dc = float(jnp.abs(o.color - ref.color).mean())
    dd = float(jnp.abs(jnp.where(ref.alpha[:,None] > 0.5, o.normal - ref.normal, 0)).mean())
    print(f"{name}: mean|dalpha|={da:.5f} mean|dcolor|={dc:.5f} mean|dnormal|={dd:.5f}")
