"""Diagnose the binary-error rays from the default-budget audit: for rays
whose production output is ~zero while the oracle sees full matter, dump the
per-stage tracer state (collected cells, candidate counts, accepted hits,
more/truncated flags, re-trace resume points) to find WHY re-trace rounds do
not fix them.

Run solo on the TPU:  python tools/_diag_audit_rays.py
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import irgs_tpu  # noqa: F401
from irgs_tpu.config import Config
from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.scene import toy
from irgs_tpu.utils import math3d

N_RAYS = 512

params, aux = toy.make_sphere_scene(n_surface=100_000, n_capacity=2 ** 17,
                                    env_resolution=64)
k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
idx = jax.random.randint(k1, (N_RAYS,), 0, 100_000)
ro = params.xyz[idx] + 0.05 * jax.random.normal(k2, (N_RAYS, 3))
rd = jax.random.normal(k3, (N_RAYS, 3))
rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

s = params.get_scaling()
Rm = math3d.quat_to_rotmat(params.rotation)
inputs = gt.TraceInputs(
    means3d=params.xyz,
    opacity=jnp.where(aux.alive, params.get_opacity()[:, 0], 0.0),
    ru=Rm[:, :, 0] / s[:, 0:1], rv=Rm[:, :, 1] / s[:, 1:2],
    normals=params.world_normals(cam_pos=jnp.zeros(3)),
    shs=params.get_features(), features=jnp.zeros((2 ** 17, 0)))

z = np.load("/tmp/audit_oracle.npz")
ref_alpha = np.asarray(z["alpha"])

cfg = Config()
tc = gt.TracerConfig.from_pipe(cfg.pipe)
print("train cfg:", tc, flush=True)
grid = gt.build_grid_from_gaussians(params, aux, tc)
geom = gt._pack_geom(inputs)


@jax.jit
def probe(a, b):
    cells = gt.collect_cells(a, b, grid, tc)
    hits = gt.select_hits(a, b, grid.sorted_gauss, cells, geom, tc, False)
    out = gt.blend_hits(a, b, inputs, hits.gs, hits.valid, tc, 3)
    return cells, hits, out


cells, hits, out = probe(ro, rd)
jax.block_until_ready(out.alpha)
outn = gt.normalize_trace(out, tc.transmittance_min)

alpha = np.asarray(outn.alpha)
bad = (np.abs(alpha - ref_alpha) > 0.3) & (ref_alpha > 0.5)
print(f"bad rays (|dalpha|>0.3, oracle>0.5): {bad.sum()}/{N_RAYS}",
      flush=True)

counts = np.asarray(cells.counts)        # [R, C]
trunc = np.asarray(cells.truncated)
more = np.asarray(hits.more)
nvalid = np.asarray(hits.valid.sum(-1))
t_cell = np.asarray(hits.t_cell)
t_last = np.asarray(hits.t_last)
trans = np.asarray(out.trans)

for name, mask in (("bad", bad), ("good", ~bad)):
    m = mask
    print(f"[{name}] n={m.sum()} total_cand p50/p90="
          f"{np.percentile(counts.sum(-1)[m], [50, 90])} "
          f"n_cells_nonempty p50={np.percentile((counts > 0).sum(-1)[m], 50)} "
          f"accepted_hits p50/p90={np.percentile(nvalid[m], [50, 90])} "
          f"more={more[m].mean():.2f} trunc={trunc[m].mean():.2f} "
          f"trans p50={np.percentile(trans[m], 50):.3f}", flush=True)

# where do bad rays' collected cells sit relative to the matter?
# compare first-pass alpha vs oracle for a few bad rays
bi = np.nonzero(bad)[0][:8]
for i in bi:
    print(f"ray {i}: alpha={alpha[i]:.3f} ref={ref_alpha[i]:.3f} "
          f"cand={counts[i].sum()} cells={counts[i]} nvalid={nvalid[i]} "
          f"more={more[i]} trunc={trunc[i]} t_last={t_last[i]:.3f} "
          f"t_cell={t_cell[i]:.3f} trans={trans[i]:.3f}", flush=True)

# simulate the shipping retrace schedule manually, tracking the bad rays
print("=== retrace rounds (shipping train schedule) ===", flush=True)
rcfg = tc.retrace_cfg()
print("retrace cfg:", rcfg.max_cells, rcfg.max_hits, rcfg.hit_budget,
      rcfg.max_crossings, flush=True)
o2, h2 = out, hits
for rnd in range(4):
    cap = tc.round_capacity(N_RAYS, rnd)
    need = np.asarray(h2.more) & (np.asarray(o2.trans) > tc.transmittance_min)
    print(f"round {rnd}: cap={cap} need={need.sum()} "
          f"need&bad={np.asarray(need & bad).sum()}", flush=True)
    o2, h2 = jax.jit(lambda o, h: gt.retrace_pass(
        o, h, ro, rd, grid, inputs, rcfg, 3, cap))(o2, h2)
    jax.block_until_ready(o2.alpha)
    a2 = np.asarray(gt.normalize_trace(o2, tc.transmittance_min).alpha)
    nbad = ((np.abs(a2 - ref_alpha) > 0.3) & (ref_alpha > 0.5)).sum()
    print(f"  after: bad={nbad}", flush=True)
