"""End-to-end two-stage toy drive on the TPU (VERDICT r2 item #5):
stage-1 geometry training -> checkpoint -> restore_from_refgs bridge ->
stage-2 material training -> stage-2 PLY.

Mirrors the reference pipeline README.md:58-68 (train_refgaussian.py then
train.py --start_checkpoint) end to end via the CLIs, on the bundled toy
scene, and asserts the artifacts + improving PSNRs.

Run solo on the TPU:  python tools/drive_two_stage.py [--s1_iters 200]
"""
import argparse
import glob
import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

ap = argparse.ArgumentParser()
ap.add_argument("--s1_iters", type=int, default=200)
ap.add_argument("--s2_iters", type=int, default=100)
ap.add_argument("--root", default="/tmp/two_stage_drive")
args = ap.parse_args()

s1_dir = os.path.join(args.root, "stage1")
s2_dir = os.path.join(args.root, "stage2")
os.makedirs(args.root, exist_ok=True)


def run(cmd):
    print("+ " + " ".join(cmd), flush=True)
    proc = subprocess.run(cmd, cwd="/root/repo", text=True,
                          capture_output=True, timeout=3000)
    sys.stdout.write(proc.stdout[-3000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"command failed: {cmd}")
    return proc.stdout


run([sys.executable, "train_refgaussian.py", "--toy", "-m", s1_dir,
     "--iterations", str(args.s1_iters), "--mesh_interval", "100"])
ckpts = glob.glob(os.path.join(s1_dir, "chkpnt*.ckpt"))
assert ckpts, f"stage-1 produced no checkpoint in {s1_dir}"
print(f"stage-1 checkpoint: {ckpts}", flush=True)

out = run([sys.executable, "train.py", "--toy", "-m", s2_dir,
           "--iterations", str(args.s2_iters), "--vis_interval", "0",
           "--start_checkpoint", s1_dir])
plys = glob.glob(os.path.join(s2_dir, "point_cloud", "iteration_*",
                              "point_cloud.ply"))
assert plys, f"stage-2 produced no PLY in {s2_dir}"

log = os.path.join(s2_dir, "train_log.jsonl")
rows = [json.loads(l) for l in open(log)]
first, last = rows[0], rows[-1]
print(json.dumps({"stage1_ckpt": ckpts[0], "stage2_ply": plys[-1],
                  "s2_first_psnr": first.get("ray_psnr"),
                  "s2_last_psnr": last.get("ray_psnr")}), flush=True)
assert last.get("ray_psnr", 0) > 0
print("two-stage drive OK", flush=True)
