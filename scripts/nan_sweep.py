"""Sweep every (camera, timestamp) train pair from a checkpoint and record
which batches produce non-finite gradients (bad_src attribution).

Locates the residual NaN factory that trips the skip-guard on degenerate
checkpoints (TRAIN_r4 known_issue_bad_steps; r5 hygiene demo still ~6%).

Usage:
  python scripts/nan_sweep.py <config.json> <scene_dir> <ckpt.ply> [limit]
Prints one line per bad batch: cam ids + timestamps + bad_src groups.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")


def main():
    import jax
    import jax.numpy as jnp
    from saro_gs_tpu.config import load_config
    from saro_gs_tpu.scene import Scene
    from saro_gs_tpu.train.trainer import Trainer
    from saro_gs_tpu.train.step import bad_src_names

    cfg_path, scene_dir, ckpt = sys.argv[1:4]
    limit = int(sys.argv[4]) if len(sys.argv) > 4 else 10 ** 9
    cfg = load_config(cfg_path, source_path=scene_dir,
                      model_path="/tmp/nan_sweep_out")
    os.makedirs(cfg.model_path, exist_ok=True)
    np.random.seed(cfg.seed)
    scene = Scene(cfg)
    scene.load_checkpoint(ckpt)
    trainer = Trainer(cfg, scene)
    trainer.state = trainer.state._replace(
        step=jnp.asarray(10300, jnp.int32))  # post-densify dynamic stage

    cams = scene.info.train_cameras
    print(f"{len(cams)} train cameras, duration {cfg.duration}", flush=True)
    stage = "dynamatic"
    use_int, scale_int = trainer.integral_flags(10301)
    trainer.state = trainer.state._replace()
    bad = []
    n = 0
    b = cfg.batch
    # batch identical views so attribution is per-(cam, ts)
    for cam in cams:
        raster = cam.raster_params()
        gt = cam.load_image(cfg.white_background)
        cams_b = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *([raster] * b))
        gt_b = jnp.stack([jnp.asarray(gt)] * b)
        for ts in np.linspace(0.0, 1.0, int(cfg.duration)):
            if n >= limit:
                break
            ts_b = jnp.full((b,), ts, jnp.float32)
            st0 = trainer.state
            new_state, metrics = trainer._train_step(
                st0, cams_b, gt_b, ts_b,
                trainer._sh_mask(cfg.sh_degree),
                trainer._flag(scale_int),
                st=trainer._statics(), stage=stage)
            src = int(metrics["bad_src"])
            if src:
                rec = {"cam": getattr(cam, "image_name", "?"),
                       "ts": round(float(ts), 4),
                       "src": bad_src_names(src),
                       "loss": float(metrics["loss"])}
                bad.append(rec)
                print("BAD " + json.dumps(rec), flush=True)
            trainer.state = st0  # never advance state
            n += 1
    print(f"swept {n} batches, {len(bad)} bad", flush=True)
    with open("/tmp/nan_sweep.json", "w") as f:
        json.dump(bad, f, indent=1)


if __name__ == "__main__":
    main()
