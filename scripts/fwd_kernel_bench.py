"""Micro-bench: the forward compositor kernel alone at bench-like shapes.

Builds a synthetic staged instance table directly (no preprocess/binning/
sort) shaped like the trained-ckpt bench frame — ~460k instances over a
43x32 tile grid with realistic per-tile counts — and times
forward_tiles_pallas variants without recompiling the full render graph.

Usage: python scripts/fwd_kernel_bench.py [reps]
Env:   SARO_FWD_VARIANTS=aux,noaux  (comma list)
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")


def main():
    import jax
    import jax.numpy as jnp
    from saro_gs_tpu.ops import tile_kernels
    from saro_gs_tpu.ops.binning import StagedBins

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    width, height, tile = 1352, 1014, 32
    gx, gy = (width + tile - 1) // tile, (height + tile - 1) // tile
    nt = gx * gy
    chunk = 128
    cap = 524288

    rng = np.random.RandomState(0)
    # per-tile counts: lognormal-ish mix like a real scene (mean ~335)
    total_target = int(os.environ.get("SARO_FWD_TOTAL", 460_000))
    counts = np.minimum((rng.lognormal(5.3, 0.9, nt)).astype(np.int64), 4000)
    counts = (counts * (total_target / counts.sum())).astype(np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    total = int(counts.sum())
    assert total < cap

    # attr rows: x, y, conic_a, conic_b, conic_c, opacity, r, g, b, depth
    attr = np.zeros((16, cap), np.float32)
    tile_of = np.repeat(np.arange(nt), counts)
    tx, ty = tile_of % gx, tile_of // gx
    # means inside (or near) the owning tile
    attr[0, :total] = tx * tile + rng.uniform(-8, 40, total)
    attr[1, :total] = ty * tile + rng.uniform(-8, 40, total)
    sig = rng.uniform(2.0, 12.0, total)
    attr[2, :total] = 1.0 / sig ** 2
    attr[3, :total] = 0.0
    attr[4, :total] = 1.0 / sig ** 2
    attr[5, :total] = rng.uniform(0.02, 0.9, total)
    attr[6:9, :total] = rng.uniform(0, 1, (3, total))
    attr[9, :total] = np.sort(rng.uniform(2, 8, total))  # any order per tile

    bins = StagedBins(
        attr=jnp.asarray(attr),
        tile_start=jnp.asarray(starts),
        tile_count=jnp.asarray(counts),
        ids=jnp.zeros((cap,), jnp.int32),
        num_dropped=jnp.zeros((), jnp.int32),
        num_instances=jnp.asarray(total, jnp.int32))
    bg = jnp.ones(3)

    variants = os.environ.get("SARO_FWD_VARIANTS", "aux,noaux").split(",")
    for name in variants:
        need_aux = "noaux" not in name
        amm = name.startswith("mm")

        @jax.jit
        def fwd(attr_in):
            out = tile_kernels.forward_tiles_pallas(
                bins._replace(attr=attr_in), bg, width, height, tile, tile,
                chunk, prefix="matmul", need_aux=need_aux, alpha_matmul=amm)
            return out.color, out.depth, out.final_t

        a = bins.attr
        jax.block_until_ready(fwd(a))
        t0 = time.time()
        for _ in range(reps):
            r = fwd(a)
        jax.block_until_ready(r)
        dt = (time.time() - t0) / reps * 1000
        print(json.dumps({"variant": name, "ms_per_frame": round(dt, 3),
                          "instances": total}), flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
