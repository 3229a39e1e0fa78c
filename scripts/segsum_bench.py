"""Microbench: per-instance -> per-Gaussian gradient reduction strategies.

The train-step trace showed jax.ops.segment_sum (unsorted scatter-add,
M=700k instances x 9 channels -> N=200k gaussians) at ~86 ms/view on v5e.
Candidates:
  a) segment_sum (baseline scatter-add)
  b) sort-by-id (9 payloads) + per-channel cumsum + boundary row-gather
  c) like b but unique-index scatter of segment totals
  d) isolated row gather [N,9] from [M,9] (cost floor probe)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

M = 704 * 1024
N = 200_000
C = 9

rng = np.random.RandomState(0)
# tile-sorted ids: random with ~15% padding (-1)
ids_np = rng.randint(0, N, M).astype(np.int32)
ids_np[rng.rand(M) < 0.15] = -1
ids = jnp.asarray(ids_np)
g = jnp.asarray(rng.randn(M, C).astype(np.float32))


def a_segment_sum(ids, g):
    seg = jnp.where(ids >= 0, ids, N).astype(jnp.int32)
    return jax.ops.segment_sum(g, seg, num_segments=N + 1)[:N]


def b_sort_cumsum_gather(ids, g):
    key = jnp.where(ids >= 0, ids, N).astype(jnp.int32)
    ops = jax.lax.sort((key,) + tuple(g[:, i] for i in range(C)), num_keys=1)
    key_s, chans = ops[0], ops[1:]
    P = [jnp.cumsum(c) for c in chans]
    # counts per id via 1-channel scatter-add, then boundaries
    cnt = jnp.zeros((N + 1,), jnp.int32).at[key].add(1, mode="drop")
    ends = jnp.cumsum(cnt[:N]) - 1          # last index of segment i
    Pg = jnp.stack([p[jnp.maximum(ends, 0)] for p in P], axis=1)
    starts_prev = ends - cnt[:N]            # index before segment start
    Ps = jnp.stack([jnp.where(starts_prev >= 0, p[jnp.maximum(starts_prev, 0)],
                              0.0) for p in P], axis=1)
    has = (cnt[:N] > 0)[:, None]
    return jnp.where(has, Pg - Ps, 0.0)


def c_sort_cumsum_scatter(ids, g):
    key = jnp.where(ids >= 0, ids, N).astype(jnp.int32)
    ops = jax.lax.sort((key,) + tuple(g[:, i] for i in range(C)), num_keys=1)
    key_s, chans = ops[0], ops[1:]
    P = jnp.stack([jnp.cumsum(c) for c in chans], axis=1)
    nxt = jnp.concatenate([key_s[1:], jnp.full((1,), N + 1, jnp.int32)])
    is_end = (key_s != nxt)
    tgt = jnp.where(is_end & (key_s < N), key_s, N)
    out = jnp.zeros((N + 1, C), jnp.float32).at[tgt].add(
        jnp.where(is_end[:, None], P, 0.0), mode="drop")
    # subtract previous segment's total: out now holds inclusive prefix at
    # segment end; recover per-segment sums by prefix-diff over present ids
    tot = out[:N]
    csum = jnp.cumsum(jnp.sum(jnp.abs(tot), 1) * 0)  # placeholder no-op
    del csum
    # prefix at previous end: scatter P at end slots shifted — do a second
    # scatter of P to (next present id): instead reconstruct via cummax of
    # ends is complex; cheat: also scatter P at positions BEFORE segment
    # starts: is_start = key_s != prev
    prv = jnp.concatenate([jnp.full((1,), -1, jnp.int32), key_s[:-1]])
    is_start = (key_s != prv)
    Pprev = jnp.concatenate([jnp.zeros((1, C)), P[:-1]], axis=0)
    tgt2 = jnp.where(is_start & (key_s < N), key_s, N)
    out2 = jnp.zeros((N + 1, C), jnp.float32).at[tgt2].add(
        jnp.where(is_start[:, None], Pprev, 0.0), mode="drop")
    return tot - out2[:N]


def d_row_gather(ids, g):
    idx = jnp.asarray(rng.randint(0, M, N).astype(np.int32))
    return g[idx]


def time_fn(name, fn):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(ids, g))
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        out = f(ids, g)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:28s} {dt:8.2f} ms")
    return out


if __name__ == "__main__":
    ra = time_fn("a_segment_sum", a_segment_sum)
    rb = time_fn("b_sort_cumsum_gather", b_sort_cumsum_gather)
    rc = time_fn("c_sort_cumsum_scatter", c_sort_cumsum_scatter)
    time_fn("d_row_gather_probe", d_row_gather)
    print("b vs a max abs diff:", float(jnp.abs(ra - rb).max()))
    print("c vs a max abs diff:", float(jnp.abs(ra - rc).max()))
