"""Per-tile instance-count distribution + chunk-packability stats.

Runs the real preprocess+binning (CPU, eager) for the bench scenes and
reports, for the forward compositor's grid layout (tps consecutive tiles
per grid step), how many grid steps could be served by a SINGLE
[chunk]-row aligned window — the opportunity for the small-tile
chunk-packing lever (docs/PERF.md "what would buy the next big step" #1).

Usage: JAX_PLATFORMS=cpu python scripts/tile_count_stats.py [--ckpt] [ts...]
"""
import math
import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _Capture(Exception):
    def __init__(self, bins):
        self.bins = bins


def capture_bins(render_args, rcfg):
    """Jitted replica of the eval render path UP TO binning (deform ->
    survival filter -> preprocess -> bin_gaussians_staged); returns the
    per-tile (start, count) arrays (render.py:62-96 without the kernel)."""
    import functools
    import jax
    import jax.numpy as jnp
    from saro_gs_tpu.models import gaussians as gm
    from saro_gs_tpu.ops import binning, projection
    from saro_gs_tpu.render import EVAL_STATE_CUTOFF

    width, height = render_args["width"], render_args["height"]
    grid_x = (width + rcfg.tile_x - 1) // rcfg.tile_x
    grid_y = (height + rcfg.tile_y - 1) // rcfg.tile_y

    @functools.partial(jax.jit, static_argnames=("mcfg", "sh_degree"))
    def go(cam, timestamp, params, nets, alive, mcfg, fstatic, bg,
           sh_degree, feat):
        d = gm.deform(params, nets, mcfg, fstatic, timestamp, feat=feat)
        active = alive * (d.state[:, 0] > EVAL_STATE_CUTOFF)
        pre = projection.preprocess(
            d.xyz, d.scaling, d.rotation, d.opacity.reshape(-1), cam,
            width, height, rcfg.tile_x, rcfg.tile_y, sh_degree=sh_degree,
            shs=d.shs, active=active, tight_rect=rcfg.tight_rect)
        bins = binning.bin_gaussians_staged(
            pre, d.opacity.reshape(-1), grid_x, grid_y,
            rcfg.max_instances, rcfg.chunk, tile_x=rcfg.tile_x,
            tile_y=rcfg.tile_y, corner_cull=rcfg.tight_rect,
            packed=rcfg.packed, expander=rcfg.expander)
        return bins.tile_start, bins.tile_count

    ra = {k: v for k, v in render_args.items()
          if k not in ("width", "height")}
    return go(**ra)


def report(name, counts, starts, chunk=128, tps=4):
    nt = counts.shape[0]
    ntp = -(-nt // tps) * tps
    cpad = np.zeros(ntp, np.int64)
    cpad[:nt] = counts
    spad = np.full(ntp, int((starts + counts).max()), np.int64)
    spad[:nt] = starts
    g_start = spad.reshape(-1, tps)[:, 0]
    g_end = (spad + cpad).reshape(-1, tps).max(1)
    astart = (g_start // chunk) * chunk
    packable = (g_end - astart) <= chunk
    nsteps = ntp // tps
    total = int(counts.sum())
    print(f"== {name}: {total} instances, {nt} tiles, {nsteps} steps "
          f"(tps={tps}, chunk={chunk})")
    pct = {q: np.percentile(counts, q) for q in (50, 90, 99)}
    print(f"  per-tile count p50/p90/p99: "
          f"{pct[50]:.0f}/{pct[90]:.0f}/{pct[99]:.0f}  "
          f"empty {100.0 * (counts == 0).mean():.1f}%  "
          f"<=chunk {100.0 * (counts <= chunk).mean():.1f}%")
    lead = spad - (spad // chunk) * chunk
    chunks_now = np.maximum(-(-(lead + cpad) // chunk), 1).reshape(-1, tps)
    now = int(chunks_now.sum())
    after = int(np.where(packable, 1, chunks_now.sum(1)).sum())
    print(f"  steps fully packable: {packable.sum()}/{nsteps} "
          f"({100.0 * packable.mean():.1f}%)   chunk pipelines: "
          f"{now} -> {after} ({100.0 * (1 - after / now):.1f}% fewer)")


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _camera, _synthetic_state
    from saro_gs_tpu.models import gaussians as gm
    from saro_gs_tpu.ops.rasterize import RasterConfig

    width, height = 1352, 1014
    rcfg = RasterConfig(tile_x=32, tile_y=32, chunk=128,
                        max_instances=576 * 1024, backend="pallas",
                        max_slots=512, prefix="matmul", packed=True,
                        expander="sort", tight_rect=True)

    scenes = []
    n = 200_000
    cfg, params, nets, alive, fstatic = _synthetic_state(
        n=n, capacity=n, seed=3)
    rng = np.random.RandomState(0)
    params = params._replace(
        scaling=jnp.asarray(np.log(rng.uniform(0.003, 0.02, (n, 3))),
                            jnp.float32))
    cam = _camera(width, height)
    scenes.append(("synthetic-200k", cfg, params, nets, alive, fstatic,
                   cam, jnp.zeros(3)))

    if "--ckpt" in sys.argv:
        import bench
        ckpt = bench.find_checkpoint()
        if ckpt:
            from saro_gs_tpu.config import load_cfg_args
            cfg_path = os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(ckpt))), "cfg_args.json")
            mcfg = load_cfg_args(cfg_path).model_config()
            params, nets, alive, fstatic, npts = bench.load_ckpt_state(
                ckpt, mcfg)
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from make_synth_scene import camera_from_c2w, ring_cameras
            cam = camera_from_c2w(ring_cameras(21)[0], 0.85, width, height,
                                  0.0).raster_params()
            scenes.append((f"ckpt-{npts}", mcfg, params, nets, alive,
                           fstatic, cam, jnp.ones(3)))

    ts_vals = [float(a) for a in sys.argv[1:] if not a.startswith("-")]
    if not ts_vals:
        ts_vals = [0.5]
    for name, mcfg, params, nets, alive, fstatic, cam, bg in scenes:
        feat = jax.jit(gm.field_feat, static_argnames=("cfg",))(
            params, nets, mcfg, fstatic)
        for ts in ts_vals:
            starts, counts = capture_bins(dict(
                cam=cam, timestamp=jnp.float32(ts), params=params,
                nets=nets, alive=alive, mcfg=mcfg, fstatic=fstatic, bg=bg,
                width=width, height=height, sh_degree=3, feat=feat), rcfg)
            report(f"{name} ts={ts}", np.asarray(counts),
                   np.asarray(starts))


if __name__ == "__main__":
    main()
