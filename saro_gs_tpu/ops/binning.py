"""Tile binning: instance expansion + depth sort + chunk-aligned layout.

TPU-native replacement for the reference's cub-based pipeline
(rasterizer_impl.cu:70-138, 275-319).  Differences by design:

  * Instance expansion is a GATHER (searchsorted over the cumulative
    tiles-touched offsets), not a scatter — static shapes, no atomics.
  * The (tile, depth) sort uses ``jax.lax.sort`` with two lexicographic keys
    (stable, so equal keys keep emission order like cub's radix sort).
  * Each tile's instance range is PADDED to a multiple of ``chunk`` so that
    downstream Pallas kernels can DMA whole aligned chunks that belong to
    exactly one tile (padding slots carry gaussian id -1).
  * Capacity is static (``max_instances``); overflow is detected and
    reported via ``num_dropped`` instead of a device->host sync
    (the reference does a D2H copy of the instance total every call,
    rasterizer_impl.cu:282).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import PreprocessOut


class BinningOut(NamedTuple):
    point_list: jnp.ndarray    # [MI_PAD] int32 gaussian ids, -1 = padding
    tile_start: jnp.ndarray    # [NT] int32 offset into point_list (chunk-aligned)
    tile_count: jnp.ndarray    # [NT] int32 number of real instances
    num_instances: jnp.ndarray  # [] int32 total real instances emitted
    num_dropped: jnp.ndarray   # [] int32 instances that exceeded capacity


def padded_size(max_instances: int, num_tiles: int, chunk: int) -> int:
    return max_instances + num_tiles * chunk


def bin_gaussians(pre: PreprocessOut, grid_x: int, grid_y: int,
                  max_instances: int, chunk: int) -> BinningOut:
    num_tiles = grid_x * grid_y
    n = pre.tiles_touched.shape[0]
    mi = max_instances
    mi_pad = padded_size(mi, num_tiles, chunk)

    # --- depth-sort the GAUSSIANS once (small N-sort), so the instance sort
    # below needs only a single stable tile key.  Ties keep original index
    # order, matching cub's stable radix sort of (tile | depth) keys. -------
    depth_key = jnp.where(pre.mask, pre.depth.astype(jnp.float32), jnp.inf)
    _, order = jax.lax.sort(
        (depth_key, jnp.arange(n, dtype=jnp.int32)), num_keys=1)

    tiles = pre.tiles_touched[order]
    offsets = jnp.cumsum(tiles) - tiles            # exclusive prefix sum
    total = offsets[-1] + tiles[-1] if n > 0 else jnp.int32(0)

    # --- instance expansion (duplicateWithKeys, rasterizer_impl.cu:90-112),
    # as a gather: slot k belongs to the depth-sorted gaussian whose offset
    # range contains k.  The owner rank is recovered with a scatter-max +
    # cumulative-max instead of a binary search (a searchsorted here costs
    # log2(N) serial gather rounds over MI slots — measured 6x slower). -----
    inst = jnp.arange(mi, dtype=jnp.int32)
    seed = jnp.zeros((mi,), jnp.int32).at[jnp.minimum(offsets, mi - 1)].max(
        jnp.arange(n, dtype=jnp.int32), mode='drop')
    srank = jax.lax.associative_scan(jnp.maximum, seed)
    # pack the per-owner fields once so expansion needs two gathers, not five
    # 11/11/10-bit packing: tile coords < 2048, rect width < 512 tiles
    rw = jnp.maximum(pre.rect_max[order, 0] - pre.rect_min[order, 0], 1)
    meta = (pre.rect_min[order, 0]
            + (pre.rect_min[order, 1] << 11)
            + (rw << 22))
    meta_i = meta[srank]
    off_i = offsets[srank]
    gauss = order[srank]
    local = inst - off_i
    rminx = meta_i & 0x7FF
    rminy = (meta_i >> 11) & 0x7FF
    rw_i = meta_i >> 22
    tx = rminx + local % rw_i
    ty = rminy + local // rw_i
    tile_id = ty * grid_x + tx
    valid = inst < jnp.minimum(total, mi)
    tile_id = jnp.where(valid, tile_id, num_tiles).astype(jnp.int32)

    # --- single-key stable sort by tile (depth order preserved) ------------
    tile_sorted, gauss_sorted = jax.lax.sort((tile_id, gauss), num_keys=1)

    # --- per-tile ranges (identifyTileRanges, :116-138) --------------------
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    start = jnp.searchsorted(tile_sorted, tids, side='left').astype(jnp.int32)
    end = jnp.searchsorted(tile_sorted, tids + 1, side='left').astype(jnp.int32)
    count = end - start

    # --- chunk-aligned re-layout ------------------------------------------
    padded_count = ((count + chunk - 1) // chunk) * chunk
    padded_start = jnp.cumsum(padded_count) - padded_count
    rank = jnp.arange(mi, dtype=jnp.int32) - start[jnp.clip(tile_sorted, 0, num_tiles - 1)]
    in_range = tile_sorted < num_tiles
    pos = jnp.where(in_range,
                    padded_start[jnp.clip(tile_sorted, 0, num_tiles - 1)] + rank,
                    mi_pad)
    point_list = jnp.full((mi_pad,), -1, dtype=jnp.int32)
    point_list = point_list.at[pos].set(gauss_sorted, mode='drop')

    num_dropped = jnp.maximum(total - mi, 0).astype(jnp.int32)
    return BinningOut(point_list=point_list, tile_start=padded_start,
                      tile_count=count,
                      num_instances=jnp.minimum(total, mi).astype(jnp.int32),
                      num_dropped=num_dropped)


# ---------------------------------------------------------------------------
# staged binning (gather-free): attributes ride the sorts as payloads
# ---------------------------------------------------------------------------

class StagedBins(NamedTuple):
    """Tile-sorted instance table (tile-major, depth-ascending per tile).

    ``attr`` rows: x, y, conic_a, conic_b, conic_c, opacity, r, g, b,
    depth, pad*6 — attribute-major [16, L] f32 where L = N + MI rounded
    up to a ``chunk`` multiple (the N merge-spread gaussian rows sort
    into the dropped tail; trailing pad carries gid -1 / opacity 0).
    Per-tile ranges are NOT chunk-aligned: kernels DMA the aligned
    envelope [align_down(start), align_up(start+count)) — provable
    ``chunk`` multiples — and mask boundary rows by instance index.
    """
    attr: jnp.ndarray          # [16, L] f32
    ids: jnp.ndarray           # [L] int32 gauss ids, -1 pad
    tile_start: jnp.ndarray    # [NT] int32 (unaligned)
    tile_count: jnp.ndarray    # [NT] int32 real instance counts
    num_instances: jnp.ndarray
    num_dropped: jnp.ndarray


def _ffill(flag, vals):
    """Segmented forward-fill: every unfilled slot takes the most recent
    filled value to its left; slots with no filled value anywhere to the
    left keep their input value.

    Two-level scheme instead of a flat ``associative_scan`` over MI: XLA
    lowers a 1-D length-MI scan to ~log2(MI)=20 shift rounds, each a full
    HBM pass over every channel (~12 ms/frame at 590k x 13 channels).
    Reshaping to [R, 128] rows gives (a) 7 Hillis-Steele rounds along the
    row (minor) axis, (b) a scan over the R row-carries (R ~ MI/128, so
    ~1/128th the traffic), (c) one combine pass — ~3x fewer full passes
    and far smaller intermediate rounds."""
    n = flag.shape[0]
    lanes = 128
    pad = -n % lanes
    if pad:
        flag = jnp.pad(flag, (0, pad))
        vals = [jnp.pad(v, (0, pad)) for v in vals]
    rows = flag.shape[0] // lanes
    f = flag.reshape(rows, lanes)
    vs = [v.reshape(rows, lanes) for v in vals]

    # (a) within-row inclusive fill along the minor axis
    k = 1
    while k < lanes:
        fs = jnp.pad(f, ((0, 0), (k, 0)))[:, :lanes]
        take = (f == 0) & (fs > 0)
        vs = [jnp.where(take, jnp.pad(v, ((0, 0), (k, 0)))[:, :lanes], v)
              for v in vs]
        f = jnp.maximum(f, fs)
        k *= 2

    # (b) exclusive carry across rows (tiny: R elements per channel)
    def combine(a, b):
        keep_b = b[0] > 0
        return (jnp.maximum(a[0], b[0]),) + tuple(
            jnp.where(keep_b, bv, av) for av, bv in zip(a[1:], b[1:]))
    inc = jax.lax.associative_scan(
        combine, (f[:, -1],) + tuple(v[:, -1] for v in vs), axis=0)
    cf = jnp.concatenate([jnp.zeros((1,), f.dtype), inc[0][:-1]])[:, None]
    cvs = [jnp.concatenate([jnp.zeros((1,), v.dtype), o[:-1]])[:, None]
           for o, v in zip(inc[1:], vs)]

    # (c) rows' unfilled prefixes take the carry
    take = (f == 0) & (cf > 0)
    out = [jnp.where(take, c, v).reshape(-1)[:n]
           for c, v in zip(cvs, vs)]
    return out


def _pack2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Two f32 channels -> one int32 sort payload (a in high bf16, b low)."""
    ah = jax.lax.bitcast_convert_type(a.astype(jnp.bfloat16), jnp.uint16)
    bh = jax.lax.bitcast_convert_type(b.astype(jnp.bfloat16), jnp.uint16)
    return jax.lax.bitcast_convert_type(
        (ah.astype(jnp.uint32) << 16) | bh.astype(jnp.uint32), jnp.int32)


def _unpack2(p: jnp.ndarray) -> tuple:
    u = jax.lax.bitcast_convert_type(p, jnp.uint32)
    a = jax.lax.bitcast_convert_type((u >> 16).astype(jnp.uint16),
                                     jnp.bfloat16).astype(jnp.float32)
    b = jax.lax.bitcast_convert_type(u.astype(jnp.uint16),
                                     jnp.bfloat16).astype(jnp.float32)
    return a, b


def bin_gaussians_staged(pre: PreprocessOut, opacity: jnp.ndarray,
                         grid_x: int, grid_y: int, max_instances: int,
                         chunk: int, tile_x: int = 0, tile_y: int = 0,
                         corner_cull: bool = True,
                         packed: bool = False,
                         expander: str = "sort",
                         y0_tiles=0) -> StagedBins:
    """Gather-free binning for the Pallas fast path.

    The profile showed XLA gathers (table[ids] staging at instance
    count) dominating the frame at ~16ns/element while sorts/scans are
    fast; so all ten per-instance attributes travel as sort payloads:

      1. expand to instances (``expander``):
         * "sort": a merge-spread IN EMISSION ORDER — stable-sort
           gaussian rows (key = first owned slot, from the exclusive
           cumsum of tiles_touched) together with the mi slot rows, then
           segmented-forward-fill (TPU scatters serialize per update;
           sorts and the two-level fill vectorize),
         * "pallas": tile_kernels.expand_rows_pallas — per output chunk,
           the owner rank is a vectorized count (#offsets <= slot) over a
           windowed gaussian table and the spread is an exact one-hot MXU
           matmul.  Bit-identical to "sort", ~4x cheaper, and the final
           sort shrinks from N+MI to MI rows (no gaussian-row tail).
      2. one stable 2-key (tile, depth) sort of the instance table —
         reproducing the reference's radix sort of tile<<32|depth-bits
         keys (rasterizer_impl.cu:275-319) without a gaussian depth
         pre-sort,
      3. per-tile [start, count) via searchsorted, UNALIGNED — kernels
         DMA chunk-aligned envelopes and mask boundary rows, so no
         alignment dummies ride the sort.
    """
    num_tiles = grid_x * grid_y
    n = pre.tiles_touched.shape[0]
    mi = max_instances
    f32 = jnp.float32

    opacity = opacity.reshape(-1).astype(f32)
    rw = jnp.maximum(pre.rmax_x - pre.rmin_x, 1)

    tiles = pre.tiles_touched
    offsets = jnp.cumsum(tiles) - tiles
    total = offsets[-1] + tiles[-1] if n > 0 else jnp.int32(0)

    if expander == "pallas":
        from . import tile_kernels
        k_exp, w_exp = 512, 1280
        mi_pad = -(-mi // k_exp) * k_exp
        assert mi_pad < (1 << 23)    # offsets sentinel headroom
        nchunks = mi_pad // k_exp
        n_pad = -(-n // 128) * 128 + w_exp

        # --- COMPACT kept gaussians to the front (one stable N-row sort).
        # Culled slots interleave with kept ones (capacity padding, pruned
        # points, frustum culls); without compaction a >w_exp run of culled
        # rows overflows the owner window and the gather-repair fallback
        # fires EVERY step (profiled at 125 ms/view in training, where
        # ~60% of capacity slots are dead).  Kept rows have strictly
        # increasing offsets, so after compaction a chunk's owners span at
        # most k_exp+1 consecutive rows and overflow is impossible. ---------
        def fin(x):
            return jnp.where(jnp.isfinite(x), x.astype(f32), 0.0)
        keep = (tiles > 0) & (offsets < mi)
        ckey = jnp.where(keep, jnp.arange(n, dtype=jnp.int32), n)
        meta_a = pre.rmin_x + (pre.rmin_y << 11)      # 22 bits
        csorted = jax.lax.sort(
            (ckey, offsets, meta_a, jnp.arange(1, n + 1, dtype=jnp.int32),
             rw, fin(pre.mean_x), fin(pre.mean_y), fin(pre.conic_a),
             fin(pre.conic_b), fin(pre.conic_c), fin(opacity),
             fin(pre.rgb_r), fin(pre.rgb_g), fin(pre.rgb_b),
             fin(pre.depth)), num_keys=1)
        row_kept = csorted[0] < n
        coffs = jnp.where(row_kept, csorted[1], 1 << 23)

        # exact owner rank at every chunk boundary, as a compare+reduce
        # (a searchsorted here is log2(N) serial gather rounds)
        bounds = jnp.arange(nchunks + 1, dtype=jnp.int32) * k_exp
        r_bound = jnp.sum((coffs[None, :] <= bounds[:, None])
                          .astype(jnp.int32), axis=1) - 1
        g0s = jnp.clip((jnp.clip(r_bound[:-1], 0, n - 1) // 128) * 128,
                       0, n_pad - w_exp).astype(jnp.int32)
        over = (r_bound[1:] - g0s) >= w_exp   # impossible post-compaction

        # gaussian table: every value finite and exactly representable in
        # f32 (floats sanitized; ints < 2^24), so the one-hot matmul
        # spread is exact
        pad_n = n_pad - n

        def padn(x, const=0.0):
            return jnp.pad(x.astype(f32), (0, pad_n),
                           constant_values=const)
        offs_row = padn(coffs, const=float(1 << 23))
        rows = jnp.stack(
            [offs_row, padn(csorted[2]), padn(csorted[3]),
             padn(csorted[4]),
             padn(csorted[5]), padn(csorted[6]),
             padn(csorted[7]), padn(csorted[8]),
             padn(csorted[9]), padn(csorted[10]),
             padn(csorted[11]), padn(csorted[12]),
             padn(csorted[13]), padn(csorted[14]),
             jnp.zeros((n_pad,), f32), jnp.zeros((n_pad,), f32)], axis=0)
        out16 = tile_kernels.expand_rows_pallas(rows, g0s, mi_pad, w_exp,
                                                k=k_exp)

        def fix(o):
            # safety net (unreachable post-compaction): exact gather repair
            rb = jnp.clip(jnp.searchsorted(
                coffs, jnp.arange(mi_pad, dtype=coffs.dtype),
                side="right") - 1, 0, n - 1)
            sel = jnp.repeat(over, k_exp)
            return [jnp.where(sel, rows[i, rb], oi)
                    for i, oi in enumerate(o)]
        out16 = jax.lax.cond(jnp.any(over), fix, lambda o: list(o), out16)

        inst = jnp.arange(mi_pad, dtype=jnp.int32)
        off_i = out16[0].astype(jnp.int32)
        meta_i = out16[1].astype(jnp.int32)
        gid_i = out16[2].astype(jnp.int32) - 1
        rw_i = jnp.maximum(out16[3].astype(jnp.int32), 1)
        mx, my = out16[4], out16[5]
        ca, cb, cc, op = out16[6], out16[7], out16[8], out16[9]
        depth_raw = out16[13]
        if packed:
            chans_i = (mx, my, _pack2(ca, cb), _pack2(cc, op),
                       _pack2(out16[10], out16[11]), out16[12], depth_raw)
            ca, cb = _unpack2(chans_i[2])    # cull on the rounded values
            cc, op = _unpack2(chans_i[3])
        else:
            chans_i = (mx, my, ca, cb, cc, op,
                       out16[10], out16[11], out16[12], depth_raw)
        rminx = meta_i & 0x7FF
        rminy = meta_i >> 11
        valid = inst < jnp.minimum(total, mi)
    else:
        meta = (pre.rmin_x + (pre.rmin_y << 11) + (rw << 22))
        if packed:
            # ``packed``: (conic_a,conic_b), (conic_c,opacity), (r,g) ride
            # the two sorts as single int32 payloads of bf16 halves (means,
            # b and the depth KEY stay f32, so the composite ORDER is
            # exact; only those six values quantize, rel err ~2^-9).
            # 3 fewer operands per sort.
            chans = (pre.mean_x.astype(f32), pre.mean_y.astype(f32),
                     _pack2(pre.conic_a, pre.conic_b),
                     _pack2(pre.conic_c, opacity),
                     _pack2(pre.rgb_r, pre.rgb_g),
                     pre.rgb_b.astype(f32), pre.depth.astype(f32))
        else:
            chans = (pre.mean_x.astype(f32), pre.mean_y.astype(f32),
                     pre.conic_a.astype(f32), pre.conic_b.astype(f32),
                     pre.conic_c.astype(f32), opacity,
                     pre.rgb_r.astype(f32), pre.rgb_g.astype(f32),
                     pre.rgb_b.astype(f32), pre.depth.astype(f32))

        # --- instance expansion as a MERGE-SPREAD (scatter-free): each
        # kept gaussian row (sort key = its first instance slot) is merged
        # with the mi slot rows (key = slot id) by one stable sort —
        # gaussian rows precede their slot on key ties because they come
        # first in the concat — then a segmented forward-fill propagates
        # each gaussian's attributes to all slots it owns.  Seeding by
        # scatter instead is SERIAL per update on TPU (~110 ns -> 22.7
        # ms/frame at 200k gaussians) while sorts and the two-level fill
        # are fully vectorized.  Dropped gaussians (culled, or offsets >=
        # mi when over capacity) get key mi and sort past every real slot.
        # Two operands ride FREE: the fill flag is (meta > 0) — every real
        # gaussian has rw >= 1 so meta >= 1<<22, slot rows carry 0 — and
        # the owner's first slot is the key the gaussian row itself
        # carried.
        gkey = jnp.where((tiles > 0) & (offsets < mi), offsets, mi)
        zi = jnp.zeros((mi,), jnp.int32)
        merged = jax.lax.sort(
            (jnp.concatenate([gkey, jnp.arange(mi, dtype=jnp.int32)]),
             jnp.concatenate([meta, zi]),
             # gid rides as gid+1 so the zero fill decodes to -1 (padding)
             jnp.concatenate([jnp.arange(1, n + 1, dtype=jnp.int32), zi]))
            + tuple(jnp.concatenate([c, jnp.zeros((mi,), c.dtype)])
                    for c in chans), num_keys=1)
        key_m, meta_m = merged[0], merged[1]
        flag = (meta_m > 0).astype(jnp.int32)
        off0 = jnp.where(flag > 0, key_m, 0)
        filled = _ffill(flag, [meta_m, off0, merged[2]] + list(merged[3:]))
        meta_i, off_i = filled[0], filled[1]
        gid_i = filled[2] - 1
        chans_i = tuple(filled[3:])

        # slot rows: key_m is the instance id; gaussian rows culled below
        inst = key_m
        rminx = meta_i & 0x7FF
        rminy = (meta_i >> 11) & 0x7FF
        rw_i = jnp.maximum(meta_i >> 22, 1)   # guard: all-culled prefix
        valid = ((flag == 0) & (inst < jnp.minimum(total, mi))
                 & (gid_i >= 0))

        if packed:
            mx, my = chans_i[0], chans_i[1]
            ca, cb = _unpack2(chans_i[2])
            cc, op = _unpack2(chans_i[3])
            depth_raw = chans_i[6]
        else:
            mx, my = chans_i[0], chans_i[1]
            ca, cb, cc, op = chans_i[2], chans_i[3], chans_i[4], chans_i[5]
            depth_raw = chans_i[9]

    local = inst - off_i
    tx = rminx + local % rw_i
    ty = rminy + local // rw_i
    tile_id = ty * grid_x + tx

    if corner_cull and tile_x > 0:
        # drop instances whose max alpha anywhere in the tile is < 1/255 —
        # they contribute exactly zero (the compositor's cutoff), so
        # outputs are bit-identical; the rect test alone keeps corner
        # tiles the 3-sigma ellipse never reaches.  Bound: power(q) =
        # -0.5 q^T C q <= -0.5 lam_min(C) |q|^2 with |q| >= dist(mean,
        # tile rect).
        # ``y0_tiles``: strip mode — ty is strip-local, means are global
        px0 = (tx * tile_x).astype(f32)
        py0 = ((ty + y0_tiles) * tile_y).astype(f32)
        ddx = jnp.maximum(jnp.maximum(px0 - mx,
                                      mx - (px0 + tile_x - 1)), 0.0)
        ddy = jnp.maximum(jnp.maximum(py0 - my,
                                      my - (py0 + tile_y - 1)), 0.0)
        lam_min = 0.5 * (ca + cc) - jnp.sqrt(
            0.25 * (ca - cc) ** 2 + cb * cb + 1e-20)
        power_bound = -0.5 * jnp.maximum(lam_min, 0.0) * \
            (ddx * ddx + ddy * ddy)
        keep = op * jnp.exp(power_bound) >= (1.0 / 255.0)
        valid = valid & keep

    tile_id = jnp.where(valid, tile_id, num_tiles).astype(jnp.int32)
    gid_i = jnp.where(valid, gid_i, -1)
    # second sort key; sanitize invalid rows (their depth may be garbage
    # from culled gaussians) — they sort to the sentinel-tile tail anyway
    depth_i = jnp.where(valid, depth_raw, 0.0)

    # --- one stable (tile, depth) sort.  Equal (tile, depth) pairs keep
    # emission order = original gaussian order, matching cub's stable
    # radix sort of tile<<32|depth-bits keys (positive depths order the
    # same by float value and by bit pattern).  Culled/padding instances
    # must never composite: their opacity is zeroed (in packed mode by
    # masking the low bf16 half in place). ---------------------------------
    if packed:
        pco = jnp.where(valid, chans_i[3],
                        chans_i[3] & jnp.int32(-65536))
        ts_ops = jax.lax.sort(
            (tile_id, depth_i, gid_i, mx, my, chans_i[2], pco,
             chans_i[4], chans_i[5]), num_keys=2)
        gid_t = ts_ops[2]
        ca_t, cb_t = _unpack2(ts_ops[5])
        cc_t, op_t = _unpack2(ts_ops[6])
        r_t, g_t = _unpack2(ts_ops[7])
        chans_t = (ts_ops[3], ts_ops[4], ca_t, cb_t, cc_t, op_t,
                   r_t, g_t, ts_ops[8], ts_ops[1])
    else:
        opac_i = jnp.where(valid, op, 0.0)
        ts_ops = jax.lax.sort(
            (tile_id, depth_i, gid_i) + tuple(chans_i[:5]) + (opac_i,)
            + tuple(chans_i[6:9]), num_keys=2)
        gid_t = ts_ops[2]
        chans_t = ts_ops[3:] + (ts_ops[1],)  # depth key doubles as row 9

    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    start = jnp.searchsorted(ts_ops[0], tids, side="left").astype(jnp.int32)
    end = jnp.searchsorted(ts_ops[0], tids + 1, side="left").astype(jnp.int32)

    # round the buffer up to a chunk multiple so the last tile's aligned
    # envelope DMA stays in bounds (pad: gid -1, opacity 0)
    length = gid_t.shape[0]
    tail = (-length) % chunk
    gid_t = jnp.pad(gid_t, (0, tail), constant_values=-1)
    attr = jnp.stack([jnp.pad(c, (0, tail)) for c in chans_t]
                     + [jnp.zeros((length + tail,), f32)] * 6, axis=0)
    return StagedBins(attr=attr, ids=gid_t, tile_start=start,
                      tile_count=end - start,
                      num_instances=jnp.minimum(total, mi).astype(jnp.int32),
                      num_dropped=jnp.maximum(total - mi, 0).astype(jnp.int32))
