"""Micro-bench: instance-table seeding scatter variants on the real chip.

The staged binning (ops/binning.py) seeds the [MI] instance table by
scattering each depth-sorted gaussian's 13 attribute channels to its first
instance slot -- currently 13 separate 1-D scatters (~10 ms/frame in the
frame trace).  Candidates:

  a) per-channel 1-D scatters (current)
  b) one [N,16] -> [MI,16] row-window scatter + transpose to channel-major
  c) one [16,N] -> [16,MI] scatter on the minor axis (channel-major direct)

Prints ms per variant.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    N = 200_000
    MI = 576 * 1024
    C = 13

    rng = np.random.RandomState(0)
    # sorted unique-ish targets like cumsum offsets; some hit MI (drop)
    tiles = rng.randint(0, 9, size=N).astype(np.int32)
    offs = np.cumsum(tiles) - tiles
    idx = jnp.asarray(np.where(tiles > 0, np.minimum(offs, MI - 1), MI),
                      jnp.int32)
    chans = jnp.asarray(rng.rand(C, N), jnp.float32)

    @jax.jit
    def per_channel(idx, chans):
        outs = [jnp.zeros((MI,), jnp.float32).at[idx].set(chans[i],
                                                          mode="drop")
                for i in range(C)]
        return jnp.stack(outs)

    @jax.jit
    def row_window(idx, chans):
        upd = jnp.concatenate(
            [chans.T, jnp.zeros((N, 16 - C), jnp.float32)], axis=1)
        out = jnp.zeros((MI, 16), jnp.float32).at[idx].set(upd, mode="drop")
        return out.T[:C]

    @jax.jit
    def chan_major(idx, chans):
        out = jnp.zeros((C, MI), jnp.float32).at[:, idx].set(chans,
                                                             mode="drop")
        return out

    def timeit(f, *args):
        r = f(*args)
        jax.block_until_ready(r)
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n * 1e3

    a = per_channel(idx, chans)
    b = row_window(idx, chans)
    c = chan_major(idx, chans)
    print("parity b:", bool(jnp.allclose(a, b)), "c:",
          bool(jnp.allclose(a, c)))
    print(f"per_channel  {timeit(per_channel, idx, chans):8.3f} ms")
    print(f"row_window   {timeit(row_window, idx, chans):8.3f} ms")
    print(f"chan_major   {timeit(chan_major, idx, chans):8.3f} ms")


def extra():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import time

    N = 200_000
    MI = 576 * 1024
    C = 13
    rng = np.random.RandomState(0)
    tiles = rng.randint(0, 9, size=N).astype(np.int32)
    offs = np.cumsum(tiles) - tiles
    idx = jnp.asarray(np.where(tiles > 0, np.minimum(offs, MI - 1), MI),
                      jnp.int32)
    chans = jnp.asarray(rng.rand(C, N), jnp.float32)
    rows16 = jnp.asarray(rng.rand(N, 16), jnp.float32)
    # segment-sum shapes: MI instances -> N gaussians, 9 channels
    seg = jnp.asarray(rng.randint(0, N, size=MI), jnp.int32)
    g16 = jnp.asarray(rng.rand(MI, 16), jnp.float32)
    gchan = jnp.asarray(rng.rand(9, MI), jnp.float32)

    def timeit(f, *args):
        r = jax.block_until_ready(f(*args))
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n * 1e3

    @jax.jit
    def row_window_notr(idx, rows16):
        return jnp.zeros((MI, 16), jnp.float32).at[idx].set(rows16,
                                                            mode="drop")

    @jax.jit
    def transpose_only(x):
        return x.T + 1.0

    @jax.jit
    def segsum_per_channel(seg, gchan):
        return jnp.stack([
            jax.ops.segment_sum(gchan[i], seg, num_segments=N)
            for i in range(9)])

    @jax.jit
    def segsum_rows(seg, g16):
        return jax.ops.segment_sum(g16, seg, num_segments=N)

    @jax.jit
    def row_gather(idx2, rows16):
        return rows16[idx2]

    srank = jnp.asarray(rng.randint(0, N, size=MI), jnp.int32)

    print(f"row_window_noT {timeit(row_window_notr, idx, rows16):8.3f} ms")
    big = jnp.zeros((MI, 16))
    print(f"transposeMIx16 {timeit(transpose_only, big):8.3f} ms")
    print(f"segsum_chan(9) {timeit(segsum_per_channel, seg, gchan):8.3f} ms")
    print(f"segsum_rows16  {timeit(segsum_rows, seg, g16):8.3f} ms")
    print(f"row_gather16   {timeit(row_gather, srank, rows16):8.3f} ms")
