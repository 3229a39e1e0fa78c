"""Deterministic scatter-add of bilinear-tap gradients into feature grids.

TPU-native replacement for the XLA scatter that autodiff emits for the
HexPlane sampling backward (the transpose of the tap gathers in
ops/mip.py; the reference's equivalent is nvdiffrast's atomicAdd texture
gradient).  XLA's TPU scatter emitter is SERIAL per update row — profiled
at 75 ms/step at 262k Gaussians x 6 planes (the top op of the training
step) — while sorts and MXU matmuls are fast.  So:

  1. tap rows are SORTED by their base cell id (one stable sort; the
     attribute/weight/cotangent channels ride as payloads),
  2. a Pallas kernel owns one 512-cell block of the (flattened) grid per
     grid step; contributing rows form a contiguous range of the sorted
     table (base cells are sorted and a point's 4 taps span at most
     ``span`` cells) whose chunk-aligned envelope is DMA'd and filtered
     exactly by the in-kernel cell==column compare,
  3. the accumulation is one [C, P] @ [P, 512] MXU matmul per chunk
     (weights folded into the one-hot compare matrix) — exact filtering,
     deterministic within-block summation order.

Used by ops/mip.sample_mip's custom VJP; the pure-XLA `.at[].add`
reference path remains for CPU/debug and as the parity oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KC = 512          # grid cells per kernel step (output block columns)
KP = 512          # sorted tap rows per DMA chunk


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def scatter_taps_xla(cells, weights, dfeat, total: int) -> jnp.ndarray:
    """Reference path: accumulation via XLA scatter-add -> [C, total].
    cells/weights: [n_taps, N]; dfeat: [N, C]."""
    out = jnp.zeros((total, dfeat.shape[1]), dfeat.dtype)
    for t in range(cells.shape[0]):
        out = out.at[cells[t]].add(weights[t][:, None] * dfeat)
    return out.T


def _scatter_kernel(starts_ref, nchunks_ref, table_hbm, out_ref,
                    table_vmem, sem, *, c_feat, n_taps):
    j = pl.program_id(0)
    astart = starts_ref[j]
    nchunks = nchunks_ref[j]
    col0 = j * KC
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (KC, 1), 0)  # [KC,1]

    def copy_chunk(c, slot):
        off = pl.multiple_of(astart + c * KP, KP)
        return pltpu.make_async_copy(
            table_hbm.at[:, pl.ds(off, KP)], table_vmem.at[slot],
            sem.at[slot])

    @pl.when(nchunks > 0)
    def _():
        copy_chunk(0, 0).start()

    def body(c, acc):
        slot = jax.lax.rem(c, 2)
        copy_chunk(c, slot).wait()

        @pl.when(c + 1 < nchunks)
        def _():
            copy_chunk(c + 1, 1 - slot).start()

        table = table_vmem[slot]                       # [R, KP]
        # weighted one-hot, columns on sublanes, points on lanes:
        # W[c, p] = sum_t w_t[p] * (cell_t[p] == col0 + c).  Rows outside
        # this block's range (envelope slack, neighbours, padding) match
        # no column and contribute exactly zero.
        wmat = jnp.zeros((KC, KP), jnp.float32)
        for t in range(n_taps):
            cell_t = jax.lax.bitcast_convert_type(
                table[t:t + 1, :], jnp.int32)                     # [1,KP]
            w_t = table[n_taps + t:n_taps + t + 1, :]             # [1,KP]
            wmat = wmat + jnp.where(cell_t == cols, w_t, 0.0)
        dfeat = table[2 * n_taps:2 * n_taps + c_feat, :]          # [C,KP]
        # exact f32 accumulation on the MXU (HIGHEST splits the f32
        # operands into bf16 passes; products against {0, w} reconstruct)
        return acc + jax.lax.dot_general(
            dfeat, wmat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)       # [C, KC]

    acc = jax.lax.fori_loop(
        0, nchunks, body, jnp.zeros((c_feat, KC), jnp.float32))
    out_ref[...] = acc


def scatter_taps_pallas(cells, weights, dfeat, total: int) -> jnp.ndarray:
    """Sorted-window MXU scatter-add.  cells/weights: [n_taps, N] (tap 0 is
    the smallest cell of each row's footprint), dfeat: [N, C].
    Returns [C, total], deterministic."""
    n_taps, n = cells.shape
    c_feat = dfeat.shape[1]
    f32 = jnp.float32
    sentinel = jnp.int32(1 << 30)

    key = cells[0]
    span = jnp.max(jnp.where(key < sentinel,
                             cells[n_taps - 1] - key, 0))
    ops = jax.lax.sort(
        (key,) + tuple(cells[t] for t in range(1, n_taps))
        + tuple(weights[t].astype(f32) for t in range(n_taps))
        + tuple(dfeat[:, i].astype(f32) for i in range(c_feat)),
        num_keys=1)
    skey = ops[0]

    ntiles = -(-total // KC)
    total_pad = ntiles * KC
    lo = jnp.arange(ntiles, dtype=jnp.int32) * KC - span - 1
    hi = jnp.arange(1, ntiles + 1, dtype=jnp.int32) * KC
    s = jnp.searchsorted(skey, lo, side="right").astype(jnp.int32)
    e = jnp.searchsorted(skey, hi, side="left").astype(jnp.int32)
    astart = (s // KP) * KP
    nchunks = -(-(jnp.maximum(e - astart, 0)) // KP)

    # single f32 table [R, L]: n_taps bitcast cell rows, n_taps weight
    # rows, C cotangent rows; R padded to a sublane-tile multiple
    pad = (-n) % KP
    rows = []
    for t in range(n_taps):
        cell_p = jnp.pad(ops[t] if t else skey, (0, pad),
                         constant_values=1 << 30)
        rows.append(jax.lax.bitcast_convert_type(cell_p, f32))
    for t in range(n_taps):
        rows.append(jnp.pad(ops[n_taps + t], (0, pad)))
    for i in range(c_feat):
        rows.append(jnp.pad(ops[2 * n_taps + i], (0, pad)))
    r = len(rows)
    r_pad = (-r) % 8
    table = jnp.stack(rows + [jnp.zeros((n + pad,), f32)] * r_pad, axis=0)

    kern = functools.partial(_scatter_kernel, c_feat=c_feat, n_taps=n_taps)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((c_feat, KC), lambda j, *_: (0, j)),
        scratch_shapes=[pltpu.VMEM((2, r + r_pad, KP), f32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c_feat, total_pad), f32),
        interpret=_interpret(),
    )(astart, nchunks, table)
    return out[:, :total]                              # [C, total]


def scatter_taps(cells, weights, dfeat, total: int,
                 use_pallas: bool = True) -> jnp.ndarray:
    if use_pallas:
        return scatter_taps_pallas(cells, weights, dfeat, total)
    return scatter_taps_xla(cells, weights, dfeat, total)
