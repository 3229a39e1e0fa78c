"""Benchmark: rendering FPS + training throughput on the real chip.

Prints TWO JSON lines (train first, headline render FPS LAST so a
last-line parser sees the round-1-comparable metric; each line also
embeds the other benchmark's value):
  {"metric": "train_steps_per_s_b4_1352x1014", "value": N, ...}
  {"metric": "render_fps_1352x1014", "value": N, "unit": "frames/s",
   "train_steps_per_s": N, ...}

FPS protocol mirrors the reference (test.py:150-163): jitted eval-style
renders, device-synchronized per-pass wall clock, warm-up frames
discarded.  When a trained checkpoint exists (SARO_BENCH_CKPT or the
default synth_arena run) the render benches THAT scene at 1352x1014 per
the reference protocol of timing a trained model; otherwise a synthetic
flame_steak-scale model (200k Gaussians).  The training metric times the
full jitted train step (batch 4 views at 1352x1014, 200k Gaussians,
dynamic stage: deformation + field + raster fwd/bwd + per-Gaussian-LR
Adam) — the round-1 baseline was 1.58 steps/s.
"""
import json
import math
import os
import subprocess
import sys
import time

# warm compile cache shared with the training/bench sessions (first remote
# TPU compiles run 10-30 min; cached ones seconds)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def _pin_requested_platform():
    """The axon PJRT plugin captures JAX_PLATFORMS at sitecustomize import;
    honor an explicit cpu request (same guard as tests/conftest.py)."""
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        import jax
        jax.config.update("jax_platforms", "cpu")
        try:
            import jax._src.xla_bridge as _xb
            _xb._backend_factories.pop("axon", None)
        except Exception:
            pass


_pin_requested_platform()


def find_checkpoint():
    path = os.environ.get("SARO_BENCH_CKPT", "")
    if path:
        return path if os.path.exists(path) else None
    import glob as _glob
    here = os.path.dirname(os.path.abspath(__file__))
    # git-tracked checkpoint first: round boundaries wipe log/, and the
    # driver-visible bench must measure the reference protocol (a TRAINED
    # model) rather than the synthetic fallback
    tracked = os.path.join(here, "checkpoints", "arena", "point_cloud",
                           "iteration_best", "point_cloud.ply")
    if os.path.exists(tracked) and os.path.exists(
            tracked.replace(".ply", ".npz")):
        return tracked
    root = os.path.join(here, "log", "synth_arena")
    for exp in ("r4", "r2d", "r2main"):
        tags = ["iteration_best"]
        # fall back to the highest saved iteration if best/final missing
        pat = os.path.join(root, exp, "point_cloud", "iteration_*")
        nums = sorted((int(os.path.basename(d).split("_")[1])
                       for d in _glob.glob(pat)
                       if os.path.basename(d).split("_")[1].isdigit()),
                      reverse=True)
        tags += [f"iteration_{i}" for i in nums]
        for tag in tags:
            p = os.path.join(root, exp, "point_cloud", tag,
                             "point_cloud.ply")
            if os.path.exists(p) and os.path.exists(
                    p.replace(".ply", ".npz")):
                return p
    return None


def load_ckpt_state(path, mcfg):
    """point_cloud.ply + sibling npz -> (params, nets, alive, fstatic, n)
    via the product checkpoint loader (capacity=None keeps the exact
    point count — no padding in the benched sort)."""
    import jax
    from saro_gs_tpu.models import gaussians as gm
    from saro_gs_tpu.scene import load_gaussian_checkpoint

    tpl = gm.init_nets(jax.random.PRNGKey(0), mcfg)
    return load_gaussian_checkpoint(path, tpl, capacity=None)


def bench_fps(use_ckpt=False):
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _camera, _synthetic_state
    from saro_gs_tpu.ops.rasterize import RasterConfig
    from saro_gs_tpu.render import test_render
    from saro_gs_tpu.models import gaussians as gm

    width, height = 1352, 1014
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        width, height = 338, 254

    ckpt = find_checkpoint() if (on_tpu and use_ckpt) else None
    if use_ckpt and ckpt is None:
        return None
    if ckpt:
        from saro_gs_tpu.config import load_cfg_args
        cfg_path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(ckpt))), "cfg_args.json")
        tcfg = load_cfg_args(cfg_path)
        mcfg = tcfg.model_config()
        params, nets, alive, fstatic, n = load_ckpt_state(ckpt, mcfg)
        # trained scene's own camera rig, rendered at the benchmark
        # resolution (fov preserved)
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "scripts"))
        from make_synth_scene import camera_from_c2w, ring_cameras
        cam = camera_from_c2w(ring_cameras(21)[0], 0.85, width, height,
                              0.0).raster_params()
        scene_desc = f"ckpt:{os.path.relpath(ckpt)} ({n} pts)"
        cfg = mcfg
    else:
        n = 200_000
        if not on_tpu:
            n = 5_000
        cfg, params, nets, alive, fstatic = _synthetic_state(
            n=n, capacity=n, seed=3)
        rng = np.random.RandomState(0)
        params = params._replace(
            scaling=jnp.asarray(np.log(rng.uniform(0.003, 0.02, (n, 3))),
                                jnp.float32))
        cam = _camera(width, height)
        scene_desc = f"synthetic ({n} pts)"
        mcfg = cfg

    bg = jnp.ones(3) if ckpt else jnp.zeros(3)
    feat = jax.jit(gm.field_feat, static_argnames=("cfg",))(
        params, nets, mcfg, fstatic)

    def make_render(rcfg):
        @jax.jit
        def render(ts, feat):
            out, _ = test_render(cam, ts, params, nets, alive, mcfg,
                                 fstatic, bg, width=width, height=height,
                                 sh_degree=3, rcfg=rcfg, feat=feat)
            return out.color, out.num_instances, out.num_dropped
        return render

    tile = int(os.environ.get("SARO_BENCH_TILE", "32"))
    rcfg = RasterConfig(
        tile_x=tile, tile_y=tile,
        chunk=int(os.environ.get("SARO_BENCH_CHUNK", "128")),
        max_instances=576 * 1024,
        backend="pallas" if on_tpu else "jax", max_slots=512,
        prefix=os.environ.get("SARO_BENCH_PREFIX", "matmul"),
        packed=os.environ.get("SARO_BENCH_PACKED", "1") == "1",
        expander=os.environ.get("SARO_BENCH_EXPAND", "pallas"))
    render = make_render(rcfg)
    # probe + snug instance capacity (multiple of 64k; sort cost scales
    # with it).  Probe the timestamp extremes too — the timed sweep spans
    # ts in [0.01, 0.99] and a dynamic scene's instance count varies with
    # time, so sizing from one mid-time frame could truncate others.
    need = 0
    for pts in (0.01, 0.5, 0.99):
        _, inst, dropped = render(jnp.float32(pts), feat)
        need = max(need, int(inst) + int(dropped))
    cap = max(-(-int(need * 1.15) // 65536) * 65536, 65536)
    if cap != rcfg.max_instances:
        rcfg = rcfg._replace(max_instances=cap)
        render = make_render(rcfg)

    n_frames = 50 if on_tpu else 8
    warmup = 10 if on_tpu else 2
    ts_list = [jnp.float32(0.5 + 0.49 * math.sin(i / 7)) for i in
               range(n_frames)]
    jax.block_until_ready(render(ts_list[0], feat))

    # per-frame sync through the remote PJRT tunnel pays a network RTT;
    # equivalent protocol: enqueue a pass, sync every timed frame at the
    # pass end, divide by frames
    durations = []
    passes = 4 if on_tpu else 1
    for _ in range(passes):
        outs = []
        for i, ts in enumerate(ts_list):
            if i == warmup:
                jax.block_until_ready(outs)
                outs = []
                t0 = time.time()
            outs.append(render(ts, feat)[0])
            # bound live HBM only for very long passes: a block through
            # the remote PJRT tunnel drains the STREAM (measured +2.7
            # ms/frame at window 16), so the window must exceed the pass
            # length for normal runs; 64 frames x 16.4 MB ~ 1 GB worst
            # case still fits
            if len(outs) > 64:
                jax.block_until_ready(outs.pop(0))
        jax.block_until_ready(outs)
        durations.append((time.time() - t0) / (len(ts_list) - warmup))
    fps = 1.0 / float(np.mean(durations))
    # post-sweep truncation check: the timed loop keeps only the color
    # output, so re-render the extreme frames and verify nothing dropped
    for pts in (0.01, 0.99):
        n_drop = int(render(jnp.float32(pts), feat)[2])
        if n_drop > 0:
            print(f"[bench][warn] ts={pts}: {n_drop} instances dropped "
                  f"at cap {rcfg.max_instances} — FPS measured on "
                  f"truncated frames", file=sys.stderr)
    return {
        "metric": (f"render_fps_ckpt_{width}x{height}" if ckpt
                   else f"render_fps_{width}x{height}"),
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": None,
        "scene": scene_desc,
    }


def bench_train():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _camera, _synthetic_state
    from saro_gs_tpu.models import densify as dens
    from saro_gs_tpu.ops.rasterize import RasterConfig
    from saro_gs_tpu.train import optim
    from saro_gs_tpu.train import step as step_mod
    from saro_gs_tpu.train.losses import LossWeights
    from saro_gs_tpu.train.trainer import TrainState

    on_tpu = jax.default_backend() == "tpu"
    width, height = (1352, 1014) if on_tpu else (96, 64)
    n = 200_000 if on_tpu else 500
    batch = 4 if on_tpu else 2
    cfg, params, nets, alive, fstatic = _synthetic_state(n=n, capacity=n,
                                                         seed=3)
    rng = np.random.RandomState(0)
    params = params._replace(
        scaling=jnp.asarray(np.log(rng.uniform(0.003, 0.02, (n, 3))),
                            jnp.float32))
    rcfg = RasterConfig(tile_x=32, tile_y=32, chunk=128,
                        max_instances=576 * 1024 if on_tpu else 1 << 14,
                        backend="pallas" if on_tpu else "jax",
                        max_slots=128, prefix="matmul", packed=True,
                        expander="pallas")
    st = step_mod.StepStatics(
        mcfg=cfg, rcfg=rcfg, weights=LossWeights(lambda_dssim=0.2),
        width=width, height=height,
        cfg_lrs=(1.6e-4, 1.6e-6, 0.01, 30000, 0.0025, 0.05, 0.005, 0.001,
                 1e-4, 1.6e-4, 1.6e-7, 3.2e-3, 3.2e-6),
        extent=1.0)
    state = TrainState(
        points=params, nets=nets,
        opt=optim.init_adam({"points": params, "nets": nets}),
        alive=alive, aux=dens.init_aux(n),
        inv_integral=jnp.ones((n, 1)),
        inv_integral_densify=jnp.ones((n, 1)),
        step=jnp.zeros((), jnp.int32))
    # 4 DISTINCT cameras around the scene + non-black GT: a broadcast
    # single view and an all-zeros target flatter the backward (degenerate
    # loss sparsity); noise GT keeps every pixel's gradient path live.
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from make_synth_scene import camera_from_c2w, ring_cameras
    cam_list = [camera_from_c2w(c2w, 0.85, width, height, 0.0)
                .raster_params() for c2w in ring_cameras(batch)]
    cams = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *cam_list)
    gt = jnp.asarray(rng.uniform(0.0, 1.0, (batch, 3, height, width)),
                     jnp.float32)
    ts = jnp.linspace(0.1, 0.9, batch).reshape(-1, 1, 1)

    # cams traced (not closed over) so camera VALUES don't bake into the
    # HLO as constants — the persistent compile cache then survives camera
    # tweaks between rounds
    @jax.jit
    def train_step(state, cams, gt, ts):
        return step_mod.train_step_core(
            state, cams, gt, ts, jnp.zeros(3), fstatic, st,
            stage="dynamatic", sh_degree=3, scale_integral=True)

    state, metrics = train_step(state, cams, gt, ts)
    jax.block_until_ready(state.points.xyz)
    reps = 20 if on_tpu else 3
    t0 = time.time()
    for _ in range(reps):
        state, metrics = train_step(state, cams, gt, ts)
    jax.block_until_ready(state.points.xyz)
    dt = (time.time() - t0) / reps
    return {
        "metric": f"train_steps_per_s_b{batch}_{width}x{height}",
        "value": round(1.0 / dt, 3),
        "unit": "steps/s",
        "vs_baseline": round(1.0 / dt / 1.58, 2),   # round-1 measurement
    }


def _run_train_bench_subprocess(budget_s):
    """Run bench_train in a child process with a hard timeout.

    The dynamic train-step compile has previously wedged/crashed the
    remote TPU compile service (CLAUDE.md); isolating it means a hang
    can never cost the already-printed render-FPS headline."""
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--train-only"],
            timeout=budget_s, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        print(f"[bench][warn] train bench exceeded {budget_s:.0f}s budget; "
              "skipped", file=sys.stderr)
        return None
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            rec = json.loads(line)
            if "train_steps_per_s" in rec.get("metric", ""):
                return rec
        except (json.JSONDecodeError, AttributeError):
            continue
    print(f"[bench][warn] train bench rc={out.returncode}; stderr tail: "
          f"{out.stderr[-500:]}", file=sys.stderr)
    return None


if __name__ == "__main__":
    if "--train-only" in sys.argv:
        print(json.dumps(bench_train()), flush=True)
        os._exit(0)
    # Headline FIRST, printed+flushed the instant it exists: round 2
    # computed both benches before printing anything and a driver timeout
    # (rc=124) shipped ZERO numbers.  The LAST printed line is always the
    # SYNTHETIC-scene render-FPS record — the round-1 baseline (63.02)
    # was measured on the synthetic 200k scene, so only that line is
    # comparable across rounds.  The trained-checkpoint FPS (the
    # reference's test.py protocol: time a TRAINED model) is measured
    # and printed as its own `render_fps_ckpt_*` metric and embedded in
    # the headline; its instance count tracks whatever was trained
    # (124k pts here vs 78.6k in r3), so it is not a cross-round series.
    deadline = float(os.environ.get("SARO_BENCH_DEADLINE", "2700"))
    t_start = time.time()
    fps_rec = bench_fps()
    fps_rec["vs_baseline"] = round(fps_rec["value"] / 63.02, 2)  # round-1
    print(json.dumps(fps_rec), flush=True)
    ckpt_rec = None
    if time.time() - t_start < deadline - 600:
        ckpt_rec = bench_fps(use_ckpt=True)
    if ckpt_rec:
        ckpt_rec["note"] = "reference protocol: trained model"
        print(json.dumps(ckpt_rec), flush=True)
        fps_rec["ckpt_fps"] = ckpt_rec["value"]
        fps_rec["ckpt_scene"] = ckpt_rec["scene"]
    train_rec = None
    budget = deadline - (time.time() - t_start)
    if os.environ.get("SARO_BENCH_SKIP_TRAIN", "0") != "1" and budget > 120:
        train_rec = _run_train_bench_subprocess(budget)
    if train_rec:
        fps_rec["train_steps_per_s"] = train_rec["value"]
        train_rec["render_fps"] = fps_rec["value"]
        print(json.dumps(train_rec), flush=True)
    # final line = headline, cross-embedding the other metrics
    print(json.dumps(fps_rec), flush=True)
    os._exit(0)  # skip the axon plugin's slow exit teardown
