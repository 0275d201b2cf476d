"""For a bad stress-scene ray (production=0, oracle=1): find the oracle's
accepted hits and check, for each, (a) its depth's cell along the ray,
(b) whether the gaussian is in that cell's candidate list, (c) whether that
cell is in the collected list, (d) the coarse-scan skip point.

CPU-runnable:  python tools/_diag_missing_hits.py
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import irgs_tpu  # noqa: F401
from irgs_tpu.config import Config
from irgs_tpu.ops import grid_tracer as gt
from irgs_tpu.scene import toy
from irgs_tpu.utils import math3d

N_RAYS = 16

params, aux = toy.make_sphere_scene(n_surface=100_000, n_capacity=2 ** 17,
                                    env_resolution=64)
k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
idx = jax.random.randint(k1, (512,), 0, 100_000)
ro_all = params.xyz[idx] + 0.05 * jax.random.normal(k2, (512, 3))
rd_all = jax.random.normal(k3, (512, 3))
rd_all = rd_all / jnp.linalg.norm(rd_all, axis=-1, keepdims=True)
# bad rays from the TPU diagnostic
BAD = [2, 3, 4, 5, 6, 7]
ro = ro_all[jnp.array(BAD)]
rd = rd_all[jnp.array(BAD)]

s = params.get_scaling()
Rm = math3d.quat_to_rotmat(params.rotation)
inputs = gt.TraceInputs(
    means3d=params.xyz,
    opacity=jnp.where(aux.alive, params.get_opacity()[:, 0], 0.0),
    ru=Rm[:, :, 0] / s[:, 0:1], rv=Rm[:, :, 1] / s[:, 1:2],
    normals=params.world_normals(cam_pos=jnp.zeros(3)),
    shs=params.get_features(), features=jnp.zeros((2 ** 17, 0)))

cfg = Config()
tc = gt.TracerConfig.from_pipe(cfg.pipe)
grid = gt.build_grid_from_gaussians(params, aux, tc)
print("grid overflow:", int(grid.overflow), flush=True)
g = tc.grid_res

# oracle per-hit info for ray 0 of the bad set
alpha_all, _, d_all = gt._hit_geom(
    inputs.means3d[None], inputs.opacity[None], inputs.ru[None],
    inputs.rv[None], inputs.normals[None], ro[:, None], rd[:, None])
acc = (alpha_all >= tc.alpha_min) & (d_all > 1e-6) & np.asarray(aux.alive)[None]
print("oracle accepted hits per ray:", np.asarray(acc.sum(-1)), flush=True)

cells = gt.collect_cells(ro, rd, grid, tc)
tcoarse, tin_c, tout_c, occ_c = gt._coarse_scan(ro, rd, grid, g)

starts = np.asarray(cells.starts)
counts = np.asarray(cells.counts)
tin = np.asarray(cells.tin)
tout = np.asarray(cells.tout)
sg = np.asarray(grid.sorted_gauss)
meta_start, meta_cnt = (np.asarray(x) for x in
                        gt.unpack_cell_meta(grid.cell_meta))
bb_min = np.asarray(grid.bb_min)
inv_cell = np.asarray(grid.inv_cell)

for i in range(len(BAD)):
    a = np.asarray(acc[i])
    hits = np.nonzero(a)[0]
    dep = np.asarray(d_all[i])[hits]
    order = np.argsort(dep)
    hits, dep = hits[order], dep[order]
    # transmittance cut
    al = np.asarray(alpha_all[i])[hits]
    T = np.cumprod(np.concatenate([[1.0], 1 - al]))[:-1]
    keep = T > 0.03
    hits, dep = hits[keep][:8], dep[keep][:8]
    print(f"\nray {BAD[i]}: t_coarse_skip={float(tcoarse[i]):.4f} "
          f"collected windows t=[{tin[i][counts[i] > 0].min() if (counts[i] > 0).any() else -1:.4f},"
          f" {tout[i][counts[i] > 0].max() if (counts[i] > 0).any() else -1:.4f}] "
          f"ncells={int((counts[i] > 0).sum())} trunc={bool(np.asarray(cells.truncated)[i])}",
          flush=True)
    o, dvec = np.asarray(ro[i]), np.asarray(rd[i])
    for gi, dh in zip(hits, dep):
        p = o + dh * dvec
        cc = np.clip(np.floor((p - bb_min) * inv_cell).astype(int), 0, g - 1)
        cid = (cc[2] * g + cc[1]) * g + cc[0]
        in_list = gi in sg[meta_start[cid]:meta_start[cid] + meta_cnt[cid]]
        # which collected window covers dh?
        win = np.nonzero((counts[i] > 0) & (tin[i] <= dh) & (dh < tout[i]))[0]
        # is this cell one of the collected (start,count) entries?
        cell_collected = any(
            meta_start[cid] == starts[i][j] and counts[i][j] > 0
            for j in range(starts.shape[1]))
        print(f"  hit g={gi} d={dh:.4f} cell={cc} in_cell_list={in_list} "
              f"window_covering={win} cell_collected={cell_collected}",
              flush=True)

# direct select test with prefilter on these rays
import dataclasses
for pf, h2 in ((0, 40), (256, 40), (512, 64), (1024, 64)):
    tc2 = dataclasses.replace(tc, prefilter_width=pf, max_hits=h2,
                              hit_budget=min(h2, 32))
    geom = gt._pack_geom(inputs)
    hits2 = gt.select_hits(ro, rd, grid.sorted_gauss, cells, geom, tc2, False)
    out2 = gt.blend_hits(ro, rd, inputs, hits2.gs, hits2.valid, tc2, 3)
    print(f"pf={pf} h2={h2}: nvalid={np.asarray(hits2.valid.sum(-1))} "
          f"alpha={np.round(np.asarray(out2.alpha), 3)} "
          f"more={np.asarray(hits2.more)} t_cell={np.round(np.asarray(hits2.t_cell),3)} "
          f"skip={np.asarray(hits2.cand_skip)}", flush=True)
