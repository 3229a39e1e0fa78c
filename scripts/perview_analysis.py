"""Decompose an eval run's PSNR by view/timestamp (VERDICT r3 item 7).

The synth_arena test split is camera 0 x `duration` frames in time order,
so the per-view index of ``<it>_runtimeperview.json`` IS the timestamp
axis.  This tool answers whether a quality plateau is uniform or driven
by a few bad frames/timestamps, and whether the temporal opacity model
(t-centers) explains it.

Usage: python scripts/perview_analysis.py <model_dir> [iteration]
Writes <model_dir>/<iteration>_perview_analysis.json and prints a
summary.
"""
import json
import os
import sys

import numpy as np


def main():
    model_dir = sys.argv[1]
    iteration = sys.argv[2] if len(sys.argv) > 2 else "best"
    with open(os.path.join(model_dir,
                           f"{iteration}_runtimeperview.json")) as f:
        pv = json.load(f)
    psnr = np.array([pv["PSNR"][k] for k in
                     sorted(pv["PSNR"], key=lambda s: int(s))])
    n = len(psnr)
    mean, std = float(psnr.mean()), float(psnr.std())
    order = np.argsort(psnr)
    worst = [{"frame": int(i), "t": round(i / max(n - 1, 1), 3),
              "psnr": round(float(psnr[i]), 2)} for i in order[:5]]
    best = [{"frame": int(i), "t": round(i / max(n - 1, 1), 3),
             "psnr": round(float(psnr[i]), 2)} for i in order[-5:]]

    # uniform-vs-tail decomposition: how much would the MEAN rise if the
    # worst q frames were lifted to the median? (a pure tail problem
    # shows a large lift; a uniform gap shows ~none)
    med = float(np.median(psnr))
    lifts = {}
    for q in (2, 5, 10):
        lifted = psnr.copy()
        idx = order[:q]
        lifted[idx] = np.maximum(lifted[idx], med)
        lifts[f"lift_worst{q}_to_median"] = round(
            float(lifted.mean() - mean), 3)

    # temporal structure: correlation of PSNR with |t - 0.5| (edge-of-
    # sequence effects) and with frame-to-frame GT motion if available
    t = np.arange(n) / max(n - 1, 1)
    edge_corr = float(np.corrcoef(np.abs(t - 0.5), psnr)[0, 1])

    out = {
        "iteration": iteration, "num_views": n,
        "PSNR_mean": round(mean, 3), "PSNR_std": round(std, 3),
        "PSNR_median": round(med, 3),
        "worst_frames": worst, "best_frames": best,
        "tail_lifts": lifts,
        "corr_psnr_vs_edge_distance": round(edge_corr, 3),
        "verdict": ("tail-driven" if lifts["lift_worst5_to_median"] > 0.25
                    else "uniform"),
    }
    path = os.path.join(model_dir, f"{iteration}_perview_analysis.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
