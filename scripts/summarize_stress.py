"""Build STRESS_r<N>.json from a finished stress run's artifacts.

Usage: python scripts/summarize_stress.py <model_dir> <out.json> [round]
"""
import glob
import json
import os
import sys


def main():
    model_dir, out_path = sys.argv[1], sys.argv[2]
    with open(os.path.join(model_dir, "history.json")) as f:
        hist = json.load(f)
    evals = {}
    for p in glob.glob(os.path.join(model_dir, "*_runtimeresults.json")):
        tag = os.path.basename(p).split("_")[0]
        if tag.isdigit():
            with open(p) as f:
                rec = json.load(f)
            evals[int(tag)] = {k: rec.get(k) for k in
                               ("PSNR", "SSIM", "MS-SSIM", "L1",
                                "PSNR_spread")}
    # steps/s over a stable window (second half, excluding eval stalls:
    # use per-50-iter deltas and take the median rate)
    rates = []
    for a, b in zip(hist, hist[1:]):
        di, dt = b["it"] - a["it"], b["elapsed_s"] - a["elapsed_s"]
        if di > 0 and dt > 0:
            rates.append(di / dt)
    rates.sort()
    med_rate = rates[len(rates) // 2] if rates else None
    bad = [h for h in hist if h.get("bad_step")]
    inv_max = max((h.get("inv_lr_max", 0) for h in hist), default=None)
    traj = [{k: h[k] for k in ("it", "loss", "psnr", "points")}
            for h in hist if h["it"] % 500 == 0 or h["it"] == 1]
    out = {
        "purpose": "reference-scale stress re-run (VERDICT r3 task 2): "
                   "flame_steak regime — duration 300, 1352x1014, 21 cams,"
                   " batch 4, dynamic from start, 512^3x256 hexplane, "
                   "densify active, 5000 iterations",
        "config": "configs/synth/stress_r4.json",
        "steps_per_s_median": round(med_rate, 3) if med_rate else None,
        "final_points": hist[-1]["points"],
        "bad_steps_total": sum(h.get("bad_step", 0) for h in bad),
        "bad_step_events": [{k: h.get(k) for k in ("it", "bad_src")}
                            for h in bad],
        "inv_lr_max_observed": inv_max,
        "evals": {str(k): evals[k] for k in sorted(evals)},
        "trajectory": traj,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("steps_per_s_median", "bad_steps_total",
                       "inv_lr_max_observed")}, indent=1))
    print("evals:", json.dumps(out["evals"], indent=1))


if __name__ == "__main__":
    main()
