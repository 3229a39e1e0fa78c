"""Command-line drivers: train / test (reference train.py & test.py parity).

Usage mirrors the reference (README.md:50-74):
  python train.py -s <data_dir> --config configs/neural_3D/flame_steak.json \
      --exp_name my_run
  python test.py -m log/<dataset>/<exp_name> [--require_segment]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _common_setup():
    import jax
    # keep the CLI responsive when the axon tunnel plugin is registered but
    # a CPU run is requested
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    return jax


def train_main(argv=None):
    jax = _common_setup()
    import jax.numpy as jnp
    from .config import load_config, save_cfg_args
    from .eval import quick_test_report
    from .scene import Scene
    from .train.trainer import Trainer

    p = argparse.ArgumentParser()
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--model_path", "-m", default="")
    p.add_argument("--exp_name", default="default")
    p.add_argument("--iterations", type=int, default=None)
    p.add_argument("--backend", default=None, choices=["pallas", "jax"])
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--start_checkpoint", default=None,
                   help="warm-start from a point_cloud.ply (+ sibling .npz) "
                        "checkpoint (reference --checkpoint, train.py:70-71)")
    p.add_argument("--start_iteration", type=int, default=None,
                   help="resume LR/densify/stage schedules at this "
                        "iteration (with --start_checkpoint; without it the "
                        "reference-style warm start re-runs schedules "
                        "from 0)")
    args = p.parse_args(argv)

    overrides = {"source_path": args.source_path,
                 "exp_name": args.exp_name}
    if args.model_path:
        overrides["model_path"] = args.model_path
    if args.iterations is not None:
        overrides["iterations"] = args.iterations
    if args.backend:
        overrides["raster_backend"] = args.backend
    from .parallel import runtime
    proc = runtime.init_distributed()   # no-op single-process
    if jax.process_count() > 1:
        print(f"[multi-host] process {proc}/{jax.process_count()}")

    cfg = load_config(args.config, **overrides)
    if not cfg.model_path:
        cfg.model_path = os.path.join("log", cfg.dataset or "scene",
                                      cfg.exp_name)
    os.makedirs(cfg.model_path, exist_ok=True)
    save_cfg_args(cfg, os.path.join(cfg.model_path, "cfg_args.json"))
    if not cfg.testing_iterations:
        cfg.testing_iterations = [cfg.test_iteration] + [
            i for i in range(cfg.densify_until_iter, cfg.iterations)
            if i % 500 == 0]
    np.random.seed(cfg.seed)

    scene = Scene(cfg)
    if args.start_checkpoint:
        scene.load_checkpoint(args.start_checkpoint)
        print(f"warm-start from {args.start_checkpoint}: "
              f"{int(np.asarray(scene.alive).sum())} points")
    trainer = Trainer(cfg, scene)
    if args.start_iteration:
        trainer.state = trainer.state._replace(
            step=jnp.asarray(args.start_iteration, jnp.int32))
        # don't let a worse post-resume eval overwrite iteration_best:
        # seed best_psnr from any prior eval records in the model dir
        import glob as _glob
        for pth in _glob.glob(os.path.join(cfg.model_path,
                                           "*_runtimeresults.json")):
            try:
                with open(pth) as f:
                    prev = json.load(f).get("PSNR") or 0.0
                trainer.best_psnr = max(trainer.best_psnr, prev)
            except (OSError, ValueError):
                pass
        print(f"resuming schedules at iteration {args.start_iteration} "
              f"(best PSNR so far {trainer.best_psnr:.2f})")
    # initial z-floater prune for COLMAP scenes (train.py:128-134)
    if cfg.densify in (1, 2, 4):
        zmask = trainer.state.points.xyz[:, 2] < 4.5
        trainer.state = trainer.state._replace(
            alive=jnp.where(zmask, 0.0, trainer.state.alive))
        print(f"After z<4.5 prune: {trainer.n_alive()} points")
    scene.record_points(0, "start training", trainer.n_alive())

    def eval_fn(tr, it):
        rec = quick_test_report(tr, scene.test_cameras())
        psnr = rec["PSNR"]
        rec = {"iteration": it, **rec}
        print(f"[eval {it}] test PSNR {psnr:.2f} SSIM {rec['SSIM']:.4f} "
              f"MS-SSIM {rec['MS-SSIM']:.4f} "
              f"(per-view std {rec['PSNR_spread']['std']:.2f})")
        with open(os.path.join(cfg.model_path,
                               f"{it}_runtimeresults.json"), "w") as f:
            json.dump(rec, f, indent=True)
        if psnr >= tr.best_psnr:
            tr.best_psnr = psnr
            print(f"[eval {it}] saving best checkpoint")
            scene.save(it, tr.state.points, tr.state.nets, tr.state.alive,
                       best_ckpt=True)

    trainer.run(eval_fn=eval_fn)
    scene.save(int(trainer.state.step), trainer.state.points,
               trainer.state.nets, trainer.state.alive)
    with open(os.path.join(cfg.model_path, "history.json"), "w") as f:
        json.dump(trainer.history, f)
    return trainer


def test_main(argv=None):
    jax = _common_setup()
    from .config import load_cfg_args
    from .eval import Evaluator
    from .scene import Scene

    p = argparse.ArgumentParser()
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--iteration", default="best")
    p.add_argument("--require_segment", action="store_true")
    p.add_argument("--skip_val", action="store_true")
    p.add_argument("--backend", default=None, choices=["pallas", "jax"])
    args = p.parse_args(argv)

    cfg = load_cfg_args(os.path.join(args.model_path, "cfg_args.json"))
    cfg.model_path = args.model_path
    if args.backend:
        cfg.raster_backend = args.backend
    scene = Scene(cfg, load_iteration=args.iteration, is_rendering=True)
    ev = Evaluator(cfg, scene)
    results = ev.render_set(
        "test", scene.test_cameras(), scene.params, scene.nets, scene.alive,
        iteration=args.iteration, require_segment=args.require_segment)
    print(json.dumps(results, indent=2))
    if not args.skip_val and scene.val_cameras():
        ev.render_set("val", scene.val_cameras(), scene.params, scene.nets,
                      scene.alive, iteration=args.iteration,
                      measure_fps=False, has_gt=False)
    return results
