"""Time the staged-binning stage alone (bench settings) on the real chip.

Usage: python scripts/bin_stage_bench.py
Prints JSON: binning ms/frame (jitted alone, inputs are device arrays from
preprocess) plus the full-render ms for context.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _camera, _synthetic_state
    from saro_gs_tpu.models import gaussians as gm
    from saro_gs_tpu.ops import binning, projection
    from saro_gs_tpu.ops.rasterize import RasterConfig

    width, height, n = 1352, 1014, 200_000
    cfg, params, nets, alive, fstatic = _synthetic_state(n=n, capacity=n,
                                                         seed=3)
    rng = np.random.RandomState(0)
    params = params._replace(
        scaling=jnp.asarray(np.log(rng.uniform(0.003, 0.02, (n, 3))),
                            jnp.float32))
    cam = _camera(width, height)
    rcfg = RasterConfig(tile_x=32, tile_y=32, chunk=128,
                        max_instances=576 * 1024, backend="pallas",
                        max_slots=512)
    feat = jax.jit(gm.field_feat, static_argnames=("cfg",))(
        params, nets, cfg, fstatic)

    @jax.jit
    def deform(ts, feat):
        return gm.deform(params, nets, cfg, fstatic, jnp.float32(ts),
                         feat=feat)
    dyn = deform(0.4, feat)

    @jax.jit
    def pre_fn(dyn):
        return projection.preprocess(
            dyn.xyz, dyn.scaling, dyn.rotation, dyn.opacity.reshape(-1),
            cam, width, height, rcfg.tile_x, rcfg.tile_y, sh_degree=3,
            shs=dyn.shs, active=alive, tight_rect=rcfg.tight_rect)
    pre = jax.block_until_ready(pre_fn(dyn))

    grid_x = (width + rcfg.tile_x - 1) // rcfg.tile_x
    grid_y = (height + rcfg.tile_y - 1) // rcfg.tile_y
    opac = dyn.opacity.reshape(-1)

    @jax.jit
    def bin_fn(pre, opac):
        b = binning.bin_gaussians_staged(
            pre, opac, grid_x, grid_y, rcfg.max_instances, rcfg.chunk,
            tile_x=rcfg.tile_x, tile_y=rcfg.tile_y, corner_cull=True)
        # reduce outputs to scalars so the tunnel doesn't copy the table
        return (b.attr.sum(), b.ids.sum(), b.tile_start.sum(),
                b.tile_count.sum())

    def timeit(f, *args, reps=10):
        jax.block_until_ready(f(*args))
        t0 = time.time()
        for _ in range(reps):
            r = f(*args)
        jax.block_until_ready(r)
        return (time.time() - t0) / reps * 1000

    out = {"binning_ms": round(timeit(bin_fn, pre, opac), 2)}
    print(json.dumps(out), flush=True)
    os._exit(0)
