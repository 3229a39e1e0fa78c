"""Capture a jax.profiler trace of the bench render and print top device ops.

Usage: python scripts/trace_tpu.py [outdir]
Parses the resulting .xplane.pb with tensorboard_plugin_profile and prints
the top-k ops by self time — the ground-truth attribution the stage-level
timing couldn't give (constant folding, tunnel RTT).
"""
import glob
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _camera, _synthetic_state
    from saro_gs_tpu.models import gaussians as gm
    from saro_gs_tpu.ops.rasterize import RasterConfig
    from saro_gs_tpu.render import test_render

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    width, height, n = 1352, 1014, 200_000
    ckpt = None
    if os.environ.get("SARO_TRACE_CKPT", "1") == "1":
        import bench
        ckpt = bench.find_checkpoint()
    if ckpt:
        # trace the trained-checkpoint scene — the bench headline workload
        from saro_gs_tpu.config import load_cfg_args
        cfg_path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(ckpt))), "cfg_args.json")
        cfg = load_cfg_args(cfg_path).model_config()
        params, nets, alive, fstatic, n = bench.load_ckpt_state(ckpt, cfg)
        from make_synth_scene import camera_from_c2w, ring_cameras
        cam = camera_from_c2w(ring_cameras(21)[0], 0.85, width, height,
                              0.0).raster_params()
        print(f"tracing ckpt scene: {ckpt} ({n} pts)", flush=True)
    else:
        cfg, params, nets, alive, fstatic = _synthetic_state(
            n=n, capacity=n, seed=3)
        rng = np.random.RandomState(0)
        params = params._replace(
            scaling=jnp.asarray(np.log(rng.uniform(0.003, 0.02, (n, 3))),
                                jnp.float32))
        cam = _camera(width, height)
    rcfg = RasterConfig(tile_x=32, tile_y=32,
                        chunk=int(os.environ.get("SARO_BENCH_CHUNK", "128")),
                        max_instances=576 * 1024, backend="pallas",
                        max_slots=512,
                        prefix=os.environ.get("SARO_BENCH_PREFIX", "matmul"),
                        packed=os.environ.get("SARO_BENCH_PACKED", "1") == "1",
                        expander=os.environ.get("SARO_BENCH_EXPAND", "pallas"))
    bg = jnp.ones(3) if ckpt else jnp.zeros(3)
    feat = jax.jit(gm.field_feat, static_argnames=("cfg",))(
        params, nets, cfg, fstatic)

    def make_render(rcfg):
        @jax.jit
        def render(ts, feat):
            out, _ = test_render(cam, ts, params, nets, alive, cfg,
                                 fstatic, bg, width=width, height=height,
                                 sh_degree=3, rcfg=rcfg, feat=feat)
            return out.color, out.num_instances, out.num_dropped
        return render

    # same snug-capacity sizing as bench.py so the trace attributes the
    # benched graph, not an oversized sort
    probe = make_render(rcfg)
    _, inst, dropped = probe(jnp.float32(0.5), feat)
    need = int(inst) + int(dropped)
    cap = max(-(-int(need * 1.15) // 65536) * 65536, 65536)
    if cap != rcfg.max_instances:
        rcfg = rcfg._replace(max_instances=cap)
    print(f"instances {need} -> cap {cap}", flush=True)
    render_full = make_render(rcfg)
    render = lambda ts, feat: render_full(ts, feat)[0]

    ts = jnp.float32(0.4)
    render(ts, feat).block_until_ready()
    print("compiled; tracing...", flush=True)
    with jax.profiler.trace(outdir):
        for i in range(4):
            out = render(jnp.float32(0.3 + 0.1 * i), feat)
        out.block_until_ready()
    print("trace done", flush=True)

    # ---- parse the xplane ------------------------------------------------
    planes = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                              recursive=True), key=os.path.getmtime)
    if not planes:
        print("no xplane found", flush=True)
        return
    path = planes[-1]
    print("parsing", path, flush=True)
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data([path], "framework_op_stats", {})
    # data is CSV or JSON depending on version
    text = data.decode() if isinstance(data, bytes) else data
    print(text[:8000], flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
