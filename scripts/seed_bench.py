"""Micro-bench: the staged-binning SEED (scatter of 13 channels + flag to
first-instance slots) — the frame trace attributes ~22.7 ms/frame to one
fused variadic scatter-add.  Variants:

  a) fused13      13 x at[idx].add in one jit (current production pattern)
  b) barrier13    same but with optimization_barrier between scatters so XLA
                  cannot horizontally fuse them into one variadic scatter
  c) chan2d       one [14, MI] scatter-add along the minor axis
  d) row2d        one [MI, 16] row scatter-add (+ barrier + transpose)
  e) onehot_mm    seeding as a dense [MI/blk] one-hot matmul (MXU) — n/a
                  here; placeholder for a pallas approach.

Run: python scripts/seed_bench.py
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
    tiles = rng.randint(0, 9, size=N).astype(np.int32)
    offs = np.cumsum(tiles) - tiles
    idx_np = np.where((tiles > 0) & (offs < MI), offs, MI)
    idx = jnp.asarray(idx_np, jnp.int32)
    chans = jnp.asarray(rng.rand(C, N), jnp.float32)

    @jax.jit
    def fused13(idx, chans):
        outs = [jnp.zeros((MI,), jnp.float32).at[idx].add(chans[i],
                                                          mode="drop")
                for i in range(C)]
        flag = jnp.zeros((MI,), jnp.int32).at[idx].add(1, mode="drop")
        return jnp.stack(outs).sum(), flag.sum()

    @jax.jit
    def barrier13(idx, chans):
        outs = []
        carry = idx
        for i in range(C):
            o = jnp.zeros((MI,), jnp.float32).at[carry].add(chans[i],
                                                            mode="drop")
            (o, carry) = jax.lax.optimization_barrier((o, carry))
            outs.append(o)
        flag = jnp.zeros((MI,), jnp.int32).at[carry].add(1, mode="drop")
        return jnp.stack(outs).sum(), flag.sum()

    @jax.jit
    def chan2d(idx, chans):
        base = jnp.zeros((C + 1, MI), jnp.float32)
        upd = jnp.concatenate([chans, jnp.ones((1, N), jnp.float32)])
        out = base.at[:, idx].add(upd, mode="drop")
        return out.sum(), out[C].sum()

    @jax.jit
    def row2d(idx, chans):
        upd = jnp.concatenate(
            [chans.T, jnp.ones((N, 1), jnp.float32),
             jnp.zeros((N, 16 - C - 1), jnp.float32)], axis=1)
        out = jnp.zeros((MI, 16), jnp.float32).at[idx].add(upd, mode="drop")
        out = jax.lax.optimization_barrier(out)
        return out.T.sum(), out[:, C].sum()

    def timeit(f, *args):
        r = jax.block_until_ready(f(*args))
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n * 1e3

    for name, f in [("fused13", fused13), ("barrier13", barrier13),
                    ("chan2d", chan2d), ("row2d", row2d)]:
        try:
            print(f"{name:10s} {timeit(f, idx, chans):8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s} FAILED {type(e).__name__}: {e}", flush=True)
    os._exit(0)
