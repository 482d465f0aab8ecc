#!/usr/bin/env python
"""COLMAP SfM pipeline driver for custom image data.

Reference-parity (`convert.py:31-124`): feature extraction → matching →
mapping → image undistortion (+ optional 1/2/4/8 downscales) using the
`colmap` (and optionally `magick`) binaries. Host-side tooling only.
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys


def run(cmd: list[str]) -> None:
    print("+", " ".join(cmd))
    r = subprocess.run(cmd)
    if r.returncode != 0:
        print(f"command failed with code {r.returncode}", file=sys.stderr)
        sys.exit(r.returncode)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--camera", default="OPENCV")
    p.add_argument("--colmap_executable", default="colmap")
    p.add_argument("--no_gpu", action="store_true")
    p.add_argument("--skip_matching", action="store_true")
    p.add_argument("--resize", action="store_true")
    p.add_argument("--magick_executable", default="magick")
    a = p.parse_args(argv)

    colmap = a.colmap_executable
    if shutil.which(colmap) is None:
        print(f"colmap binary not found ({colmap}); install COLMAP or pass "
              "--colmap_executable", file=sys.stderr)
        sys.exit(1)
    use_gpu = "0" if a.no_gpu else "1"
    src = a.source_path

    if not a.skip_matching:
        os.makedirs(os.path.join(src, "distorted", "sparse"), exist_ok=True)
        run([colmap, "feature_extractor",
             "--database_path", f"{src}/distorted/database.db",
             "--image_path", f"{src}/input",
             "--ImageReader.single_camera", "1",
             "--ImageReader.camera_model", a.camera,
             "--SiftExtraction.use_gpu", use_gpu])
        run([colmap, "exhaustive_matcher",
             "--database_path", f"{src}/distorted/database.db",
             "--SiftMatching.use_gpu", use_gpu])
        run([colmap, "mapper",
             "--database_path", f"{src}/distorted/database.db",
             "--image_path", f"{src}/input",
             "--output_path", f"{src}/distorted/sparse",
             "--Mapper.ba_global_function_tolerance=0.000001"])

    run([colmap, "image_undistorter",
         "--image_path", f"{src}/input",
         "--input_path", f"{src}/distorted/sparse/0",
         "--output_path", src,
         "--output_type", "COLMAP"])

    # Move sparse/* → sparse/0/* (reference `convert.py:79-90`).
    sparse = os.path.join(src, "sparse")
    os.makedirs(os.path.join(sparse, "0"), exist_ok=True)
    for name in os.listdir(sparse):
        if name == "0":
            continue
        shutil.move(os.path.join(sparse, name), os.path.join(sparse, "0", name))

    if a.resize:
        for scale, suffix in ((50, "_2"), (25, "_4"), (12.5, "_8")):
            out = os.path.join(src, f"images{suffix}")
            os.makedirs(out, exist_ok=True)
            for f in os.listdir(os.path.join(src, "images")):
                dst = os.path.join(out, f)
                shutil.copy2(os.path.join(src, "images", f), dst)
                run([a.magick_executable, dst, "-resize", f"{scale}%", dst])
    print("done.")


if __name__ == "__main__":
    main()
