#!/usr/bin/env python
"""Neural3D COLMAP preprocessing CLI (reference helper3dg.py parity).

    python prep.py --videopath <scene_dir> [--startframe 0] [--duration 300]
                   [--no-colmap]

Expects cam<k>.mp4 videos + poses_bounds.npy in <scene_dir>; produces
per-frame colmap_<i>/ directories with sparse models (requires ffmpeg and
colmap binaries unless --no-colmap).
"""
import argparse
import os
import sys

if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from saro_gs_tpu.data.preprocess import prepare_neural3d

    p = argparse.ArgumentParser()
    p.add_argument("--videopath", required=True)
    p.add_argument("--startframe", type=int, default=0)
    p.add_argument("--duration", type=int, default=300)
    p.add_argument("--no-colmap", action="store_true",
                   help="write frame dirs, input.db and manual models only")
    args = p.parse_args()
    prepare_neural3d(args.videopath, duration=args.duration,
                     start=args.startframe, run_colmap=not args.no_colmap)
