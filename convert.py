"""COLMAP SfM preprocessing wrapper.

≙ reference convert.py: runs feature_extractor → exhaustive_matcher → mapper
→ image_undistorter on a raw image folder, producing the `sparse/0` layout
that the Colmap scene reader consumes (irgs_tpu/scene/colmap.py), plus
optional 1/2, 1/4, 1/8 downscaled image pyramids.

Requires the `colmap` binary on PATH (not bundled); downscaling uses PIL
instead of ImageMagick so it has no extra binary dependency.
"""

import argparse
import os
import shutil
import subprocess
import sys


def run(cmd: list[str]) -> None:
    print("+", " ".join(cmd), flush=True)
    code = subprocess.call(cmd)
    if code != 0:
        print(f"command failed with code {code}", file=sys.stderr)
        sys.exit(code)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--no_gpu", action="store_true")
    parser.add_argument("--skip_matching", action="store_true")
    parser.add_argument("--source_path", "-s", required=True)
    parser.add_argument("--camera", default="OPENCV")
    parser.add_argument("--colmap_executable", default="colmap")
    parser.add_argument("--resize", action="store_true")
    args = parser.parse_args()

    colmap = args.colmap_executable
    if shutil.which(colmap) is None:
        print(f"error: COLMAP binary {colmap!r} not found on PATH; install "
              "colmap or pass --colmap_executable", file=sys.stderr)
        sys.exit(1)
    use_gpu = "0" if args.no_gpu else "1"
    src = args.source_path

    if not args.skip_matching:
        os.makedirs(os.path.join(src, "distorted", "sparse"), exist_ok=True)
        run([colmap, "feature_extractor",
             "--database_path", os.path.join(src, "distorted", "database.db"),
             "--image_path", os.path.join(src, "input"),
             "--ImageReader.single_camera", "1",
             "--ImageReader.camera_model", args.camera,
             "--SiftExtraction.use_gpu", use_gpu])
        run([colmap, "exhaustive_matcher",
             "--database_path", os.path.join(src, "distorted", "database.db"),
             "--SiftMatching.use_gpu", use_gpu])
        run([colmap, "mapper",
             "--database_path", os.path.join(src, "distorted", "database.db"),
             "--image_path", os.path.join(src, "input"),
             "--output_path", os.path.join(src, "distorted", "sparse"),
             "--Mapper.ba_global_function_tolerance=0.000001"])

    run([colmap, "image_undistorter",
         "--image_path", os.path.join(src, "input"),
         "--input_path", os.path.join(src, "distorted", "sparse", "0"),
         "--output_path", src,
         "--output_type", "COLMAP"])

    # move undistorted model into sparse/0 (reader expects that layout)
    sparse = os.path.join(src, "sparse")
    os.makedirs(os.path.join(sparse, "0"), exist_ok=True)
    for f in os.listdir(sparse):
        if f == "0":
            continue
        shutil.move(os.path.join(sparse, f), os.path.join(sparse, "0", f))

    if args.resize:
        from PIL import Image
        img_dir = os.path.join(src, "images")
        for frac, name in ((2, "images_2"), (4, "images_4"), (8, "images_8")):
            out_dir = os.path.join(src, name)
            os.makedirs(out_dir, exist_ok=True)
            for f in os.listdir(img_dir):
                im = Image.open(os.path.join(img_dir, f))
                im.resize((im.width // frac, im.height // frac),
                          Image.LANCZOS).save(os.path.join(out_dir, f))

    print("Done.")


if __name__ == "__main__":
    main()
