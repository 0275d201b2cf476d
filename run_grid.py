"""Experiment-grid orchestration: scene x envmap sweeps through the full
two-stage pipeline, resumable per step, aggregated by collect_results.py.

≙ the reference's bash grid launchers (train_stage2_spec_v5.sh /
do_nvs_v5.sh / run_tensoir.sh / run_syn4relight.sh): nested scene x
DATA_SUBDIR loops over train_refgaussian.py -> train.py -> render.py ->
eval_material / eval_relighting. One process drives the single TPU chip
sequentially (the reference pins CUDA_VISIBLE_DEVICES=0 the same way).

Each step logs to <out>/<scene>[/<envmap>]/logs/<step>.log and writes a
`.done` marker on success, so a faulted grid resumes where it stopped
(same posture as tools/run_tpu_queue.sh across device outages).

Examples:
  # Syn4Relight full grid (stage1 -> stage2 -> nvs -> material -> relight)
  python run_grid.py --data_root data/Synthetic4Relight \
      --scenes jugs air_baloons chair hotdog --out outputs/syn4 \
      --relight_envmaps data/Synthetic4Relight/envmaps/envmap3.exr

  # reference v5 grid shape: scene x envmap subdir (DATA_SUBDIR)
  python run_grid.py --data_root data_v5 --scenes hook150 mouse150 \
      --envmaps chapel_day_4k_32x16_rot0 dam_wall_4k_32x16_rot90 \
      --out outputs/v5 --resolution 2

  # re-run only evals
  python run_grid.py ... --steps nvs material relight
"""

import argparse
import json
import os
import shlex
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
ALL_STEPS = ("stage1", "stage2", "nvs", "material", "relight")


def run_step(name: str, cmd: list[str], log_dir: str, redo: bool,
             env: dict | None = None) -> bool:
    os.makedirs(log_dir, exist_ok=True)
    done = os.path.join(log_dir, f"{name}.done")
    log = os.path.join(log_dir, f"{name}.log")
    if os.path.exists(done) and not redo:
        print(f"  [skip] {name} (marker exists)", flush=True)
        return True
    print(f"  [run ] {name}: {' '.join(shlex.quote(c) for c in cmd)}",
          flush=True)
    t0 = time.time()
    with open(log, "a") as lf:
        lf.write(f"\n=== {time.strftime('%F %T')} {' '.join(cmd)}\n")
        lf.flush()
        proc = subprocess.run(cmd, cwd=REPO, stdout=lf, stderr=lf, env=env)
    dt = time.time() - t0
    if proc.returncode != 0:
        print(f"  [FAIL] {name} rc={proc.returncode} after {dt:.0f}s "
              f"(see {log})", flush=True)
        return False
    with open(done, "w") as f:
        f.write(f"{time.strftime('%F %T')} {dt:.0f}s\n")
    print(f"  [done] {name} in {dt:.0f}s", flush=True)
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True,
                    help="dataset root; scenes are subdirectories")
    ap.add_argument("--scenes", nargs="+", required=True)
    ap.add_argument("--envmaps", nargs="*", default=[None],
                    help="optional DATA_SUBDIR grid axis (reference v5 "
                         "datasets store one image set per envmap subdir)")
    ap.add_argument("--out", required=True, help="output root")
    ap.add_argument("--steps", nargs="+", default=list(ALL_STEPS),
                    choices=ALL_STEPS)
    ap.add_argument("--redo", action="store_true",
                    help="ignore .done markers and re-run")
    ap.add_argument("--keep_going", action="store_true",
                    help="continue the grid past a failed cell")
    # workload knobs (defaults = reference launch scripts)
    ap.add_argument("--s1_iterations", type=int, default=50_000)
    ap.add_argument("--s2_iterations", type=int, default=20_000)
    ap.add_argument("--resolution", type=int, default=-1)
    ap.add_argument("--diffuse_sample_num", type=int, default=256)
    ap.add_argument("--nvs_diffuse_sample_num", type=int, default=512)
    ap.add_argument("--relight_envmaps", nargs="*", default=[],
                    help="HDR .exr paths for the relighting eval")
    ap.add_argument("--s1_args", default="", help="extra train_refgaussian args")
    ap.add_argument("--s2_args", default="", help="extra train.py args "
                    "(lambdas etc.; reference spec_v5 defaults applied "
                    "unless overridden)")
    args = ap.parse_args()

    py = sys.executable
    failures = []
    for scene in args.scenes:
        for env in args.envmaps:
            tag = scene if env is None else f"{scene}/{env}"
            src = os.path.join(args.data_root, scene)
            out = os.path.join(args.out, scene if env is None
                               else os.path.join(scene, env))
            s1_dir = os.path.join(out, "refgs")
            s2_dir = os.path.join(out, "irgs")
            logs = os.path.join(out, "logs")
            print(f"[grid] {tag}", flush=True)
            # child-only env (never mutate our own os.environ: a stale
            # DATA_SUBDIR would leak into later grid cells — ADVICE r4)
            child_env = {k: v for k, v in os.environ.items()
                         if k != "DATA_SUBDIR"}
            if env is not None:
                child_env["DATA_SUBDIR"] = env  # ≙ the v5 datasets' env axis

            def step(name, cmd):
                if name not in args.steps:
                    return True
                return run_step(name, cmd, logs, args.redo, env=child_env)

            ok = True
            ok = ok and step("stage1", [
                py, "train_refgaussian.py", "-s", src, "-m", s1_dir,
                "--iterations", str(args.s1_iterations),
                "-r", str(args.resolution),
                *shlex.split(args.s1_args)])
            ok = ok and step("stage2", [
                py, "train.py", "-s", src, "-m", s2_dir,
                "--start_checkpoint_refgs", s1_dir,
                "--iterations", str(args.s2_iterations),
                "-r", str(args.resolution),
                "--diffuse_sample_num", str(args.diffuse_sample_num),
                # reference train_stage2_spec_v5.sh:21-28 defaults
                "--lambda_base_color_smooth", "2",
                "--lambda_roughness_smooth", "2",
                "--lambda_light_smooth", "0.0005",
                "--lambda_light", "0.1",
                "--init_roughness_value", "0.6",
                "--train_ray",
                *shlex.split(args.s2_args)])
            ok = ok and step("nvs", [
                py, "render.py", "-m", s2_dir,
                "--diffuse_sample_num", str(args.nvs_diffuse_sample_num)])
            ok = ok and step("material", [
                py, "eval_material.py", "-m", s2_dir, "--compute_scale"])
            if args.relight_envmaps:
                ok = ok and step("relight", [
                    py, "eval_relighting.py", "-m", s2_dir,
                    "--envmaps", *args.relight_envmaps])
            if not ok:
                failures.append(tag)
                if not args.keep_going:
                    break
        else:
            continue
        break

    # aggregate whatever exists (≙ collect_nvs*.py)
    model_dirs = [os.path.join(args.out, s) if e is None
                  else os.path.join(args.out, s, e)
                  for s in args.scenes for e in args.envmaps]
    model_dirs = [os.path.join(m, "irgs") for m in model_dirs]
    for kind in ("nvs", "material", "relight"):
        subprocess.run([py, "collect_results.py", "--kind", kind,
                        *model_dirs], cwd=REPO)
    if failures:
        print(f"FAILED cells: {failures}", file=sys.stderr)
        raise SystemExit(1)
    print(json.dumps({"grid": "ok", "cells": len(args.scenes) *
                      len(args.envmaps)}))


if __name__ == "__main__":
    main()
