"""Mesh-export CLI: TSDF-fuse rendered depth maps and export a triangle mesh.

≙ the reference's mesh artifact path: GaussianExtractor.reconstruction +
extract_mesh_bounded / extract_mesh_unbounded + post_process_mesh
(utils/mesh_utils.py:73-281, utils/mcube_utils.py:17-94), which the fork
runs inside stage-1 training and 2DGS ships as `fuse.ply`/`fuse_post.ply`.

Usage:
    python extract_mesh.py -m <stage1_model_dir> [-s <scene>] [--unbounded]
    python extract_mesh.py --toy -m /tmp/mesh_out            # self-test
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from irgs_tpu.config import load_config, stage1_config
    from irgs_tpu.ops import tsdf as T
    from irgs_tpu.render import ref_gaussian as rg
    from irgs_tpu.train import stage1_full as s1
    from irgs_tpu.utils.ply import structured_from_dict, write_ply

    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model_path", required=True)
    ap.add_argument("-s", "--source_path", default="")
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--unbounded", action="store_true")
    ap.add_argument("--mesh_res", type=int, default=256)
    ap.add_argument("--depth_trunc", type=float, default=-1.0)
    ap.add_argument("--voxel_size", type=float, default=-1.0)
    ap.add_argument("--sdf_trunc", type=float, default=-1.0)
    ap.add_argument("--num_cluster", type=int, default=50)
    ap.add_argument("--toy", action="store_true")
    args = ap.parse_args()

    if args.toy:
        from irgs_tpu.scene import toy
        params, aux = toy.make_sphere_scene(n_surface=4096, n_capacity=8192)
        cams = toy.make_ring_cameras(16, width=128, height_px=128)
        cameras_extent = 3.3
        sh_deg = 3
        dup_capacity = 2 ** 18
    else:
        cfg = load_config(args.model_path) or stage1_config()
        if args.source_path:
            cfg.model.source_path = args.source_path
        state, it, extra = s1.load_stage1_checkpoint(args.model_path)
        params, aux = state.params, state.aux
        sh_deg = extra.get("sh_degree", 3)
        dup_capacity = cfg.pipe.dup_capacity or 2 ** 20
        from irgs_tpu.scene.datasets import load_scene
        info = load_scene(cfg.model.source_path, cfg.model.white_background,
                          eval_split=False, resolution=cfg.model.resolution)
        cams = info.train_cameras
        cameras_extent = info.radius

    h, w = cams[0].height, cams[0].width
    out_dir = os.path.join(args.model_path, "mesh")
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()

    if args.unbounded:
        # render depths + collect projection matrices
        render = jax.jit(functools.partial(
            rg.render_initial, img_w=w, img_h=h, active_sh_degree=sh_deg,
            dup_capacity=dup_capacity))
        depths, projs, centers = [], [], []
        for cam in cams:
            pkg = render(params, aux, cam.params(), jnp.zeros(3))
            depths.append(pkg["surf_depth"] * (pkg["alpha"][..., 0] > 0.5))
            projs.append(jnp.asarray(cam.full_proj))
            centers.append(cam.cam_pos)
        depths = jnp.stack(depths)
        projs = jnp.stack(projs)
        centers = np.stack(centers)
        # bounding sphere from camera poses (≙ estimate_bounding_sphere,
        # mesh_utils.py:125-137, with the focus point approximated by the
        # camera centroid)
        center = centers.mean(0)
        radius = float(np.linalg.norm(centers - center, axis=-1).min())
        xyz = np.asarray(params.xyz)[np.asarray(aux.alive)]
        verts, faces = T.extract_mesh_unbounded(
            depths, projs, xyz, center, radius, resolution=args.mesh_res)
    else:
        depth_trunc = (cameras_extent * 2.0 if args.depth_trunc < 0
                       else args.depth_trunc)
        vol = s1.reconstruct_tsdf(
            params, aux, cams, img_w=w, img_h=h, active_sh_degree=sh_deg,
            mesh_res=args.mesh_res, depth_trunc=depth_trunc,
            cameras_extent=cameras_extent, dup_capacity=dup_capacity)
        verts, faces = T.extract_mesh(vol)

    print(f"fused+meshed in {time.time() - t0:.1f}s: "
          f"{len(verts)} verts / {len(faces)} tris")

    def save(path, v, f):
        vd = structured_from_dict({"x": v[:, 0], "y": v[:, 1], "z": v[:, 2]})
        write_ply(path, vd, faces=f)
        print("wrote", path)

    save(os.path.join(out_dir, "fuse.ply"), *T.merge_vertices(verts, faces))
    pv, pf = T.post_process_mesh(verts, faces, cluster_to_keep=args.num_cluster)
    print(f"post-process: {len(pv)} verts / {len(pf)} tris")
    save(os.path.join(out_dir, "fuse_post.ply"), pv, pf)


if __name__ == "__main__":
    main()
