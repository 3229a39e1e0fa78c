"""Summarize a training run directory into one JSON artifact.

Collects the loss/PSNR trajectory (history.json), the point-count journal
(exp_log.txt), every `<iter>_runtimeresults.json`, and checkpoint paths.

Usage: python scripts/summarize_run.py log/synth_arena/r2c TRAIN_r2.json
"""
import glob
import json
import os
import re
import sys


def main(run_dir: str, out_path: str):
    summary = {"run_dir": run_dir}
    hist_path = os.path.join(run_dir, "history.json")
    if os.path.exists(hist_path):
        hist = json.load(open(hist_path))
        summary["iterations"] = hist[-1]["it"] if hist else 0
        summary["final"] = hist[-1] if hist else None
        summary["wall_clock_s"] = hist[-1]["elapsed_s"] if hist else None
        summary["bad_steps"] = sum(1 for h in hist if h.get("bad_step"))
        # downsampled trajectory (every ~20th record)
        stride = max(len(hist) // 60, 1)
        summary["trajectory"] = [
            {k: h[k] for k in ("it", "loss", "psnr", "points") if k in h}
            for h in hist[::stride]] + ([hist[-1]] if hist else [])

    evals = {}
    for p in sorted(glob.glob(os.path.join(run_dir,
                                           "*_runtimeresults.json"))):
        tag = re.match(r"(\w+)_runtimeresults", os.path.basename(p)).group(1)
        evals[tag] = json.load(open(p))
    summary["evals"] = evals

    ckpts = sorted(glob.glob(os.path.join(
        run_dir, "point_cloud", "iteration_*", "point_cloud.ply")))
    summary["checkpoints"] = ckpts

    cfg_path = os.path.join(run_dir, "cfg_args.json")
    if os.path.exists(cfg_path):
        cfg = json.load(open(cfg_path))
        summary["config"] = {k: cfg[k] for k in (
            "dataset", "duration", "iterations", "batch", "densify",
            "static_iteration", "densify_until_iter", "max_screen_size",
            "raster_backend", "raster_prefix", "raster_packed",
            "raster_expander", "kplanes_config") if k in cfg}

    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {out_path}")
    if summary.get("final"):
        print(json.dumps(summary["final"]))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "TRAIN_r2.json")
