"""Pallas TPU kernels for per-tile alpha compositing (fast path).

TPU-native re-design of the reference's per-tile CUDA kernels
(forward.cu:261-393, backward.cu:399-557).  Rather than translating the
thread-per-pixel model, each grid step owns one tile and processes its
depth-sorted instance list in chunks of K Gaussians as dense [K, P] matrices
(P = pixels/tile, lanes; K on sublanes):

  * alpha evaluation for a whole chunk is one batch of VPU ops,
  * the front-to-back transmittance recurrence becomes a log-depth prefix
    PRODUCT over the K axis (doubling with `pltpu.roll`),
  * per-pixel early termination (T < 1e-4) is expressed in closed form:
    a Gaussian contributes iff its prefix transmittance stays >= 1e-4,
    and whole tiles stop early once every pixel saturates,
  * color accumulation is an MXU matmul [3,K] @ [K,P],
  * the backward re-walks forward with a prefix-SUM, using
    suffix = C_fg - prefix to recover the reference's ``accum_rec``
    (backward.cu:515-534) without a reverse traversal.

The instance table arrives PRE-STAGED from gather-free binning
(binning.bin_gaussians_staged): attribute-major [16, L] in HBM, tile-major
and depth-sorted, with UNALIGNED per-tile [start, count) ranges.  Each tile
DMAs the chunk-aligned envelope [align_down(start), align_up(start+count))
— offsets stay provable multiples of the chunk (Mosaic lane-tiling
requirement) — and self-masks boundary rows that belong to neighbouring
tiles by their instance rank.  The backward writes per-instance gradients
back at the same envelope offsets into an aliased zero-initialized output
(covering rows the n_contrib-clamped walk never visits); a chunk shared by
two tiles is merged by the successor with a read-modify-write (the grid is
sequential on a TensorCore) — fully deterministic, replacing the
reference's atomicAdd backward.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compositing import (ALPHA_MAX, ALPHA_MIN, DEPTH_DEFAULT, T_EPS,
                          ForwardTilesOut, InstanceGrads)


def _interpret() -> bool:
    # compiled Mosaic on real TPU; interpreter elsewhere (CPU tests)
    return jax.default_backend() != "tpu"


# attribute-major row indices of the staged instance tensor
# (binning.bin_gaussians_staged): x, y, conic_a, conic_b, conic_c, opacity,
# r, g, b, depth, pad*6.  16 rows = multiple of the f32 sublane tile.
_ROWS = 16
_GROWS = 16  # d_rgb(3), d_mean2d(2), d_conic(3), d_opacity, pad*7


def _row_iota(k, p):
    return jax.lax.broadcasted_iota(jnp.int32, (k, p), 0)


def _prefix_op(x, identity, op, k):
    """Inclusive prefix scan along axis 0 via log-depth doubling."""
    sh = 1
    rows = _row_iota(k, x.shape[1])
    while sh < k:
        shifted = pltpu.roll(x, shift=sh, axis=0)
        shifted = jnp.where(rows < sh, identity, shifted)
        x = op(x, shifted)
        sh *= 2
    return x


def _tri(k):
    """Inclusive lower-triangular ones [K, K] (prefix-scan operator)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (r >= c).astype(jnp.float32)


def _prefix_add(x, k, mode):
    """Inclusive prefix sum over axis 0 of [K, P]."""
    if mode == "matmul":
        # one [K,K]@[K,P] MXU matmul instead of log2(K) VPU roll rounds
        return jax.lax.dot_general(_tri(k), x, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    return _prefix_op(x, 0.0, jnp.add, k)


def _prefix_mul(x, k, mode):
    """Inclusive prefix product over axis 0 of [K, P]; x in (0, 1]."""
    if mode == "matmul":
        # product -> exp(prefix-sum(log)); x >= 1 - ALPHA_MAX = 0.01 so the
        # log is well-conditioned (rel err ~1e-5 over a 128-chunk)
        return jnp.exp(_prefix_add(jnp.log(x), k, mode))
    return _prefix_op(x, 1.0, jnp.multiply, k)


def _chunk_alpha(attr, pxf, pyf, k, p, opac=None):
    """Alpha matrix terms for a staged [_ROWS, K] chunk against P pixels.
    (Alignment-padding rows carry opacity 0 and self-mask.)

    ``opac``: [K, 1] opacity column override — callers fold row-wise
    masks (tile-range rank validity) into it so no [K, P] mask pass is
    ever spent on them.  The reference's broken-conic guard
    (forward.cu:310 / backward.cu `power > 0 -> skip`) IS enforced:
    preprocess guarantees PD conics in f32, but bf16 sort-payload
    packing can flip a near-singular needle splat's conic indefinite
    (det -0.009 observed on the r4 arena ckpt), and an unguarded
    exp(power>0) overflows — finite-but-garbage alpha in the forward,
    inf*0 = NaN moment gradients in the backward replay.  exp(min(p,0))
    keeps g finite (bit-exact where power <= 0) and the power <= 0 gate
    zeroes the contribution exactly like the reference's skip."""
    def row(i):
        return attr[i, :].reshape(k, 1)
    dx = row(0) - pxf            # [K, P]
    dy = row(1) - pyf
    ca, cb, cc = row(2), row(3), row(4)
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g = jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(ALPHA_MAX, (row(5) if opac is None else opac) * g)
    a_eff = jnp.where((alpha >= ALPHA_MIN) & (power <= 0.0), alpha, 0.0)
    return dx, dy, g, alpha, a_eff


def _pixel_basis(p, tile_x):
    """[6, P] per-tile constant basis of the expanded splat quadratic in
    TILE-LOCAL pixel coordinates (well-conditioned: every entry < 32^2)."""
    l = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    lx = (l % tile_x).astype(jnp.float32)
    ly = (l // tile_x).astype(jnp.float32)
    one = jnp.ones((1, p), jnp.float32)
    return jnp.concatenate(
        [one, lx, ly, -0.5 * lx * lx, -(lx * ly), -0.5 * ly * ly], axis=0)


def _moment_basis(p, tile_x):
    """[6, P] monomial basis (1, lx, ly, lx^2, lx*ly, ly^2) in tile-local
    pixel coordinates: the backward's five Sum_p e*dx^a*dy^b gradient
    reductions become ONE [K,P]@[P,6] moment contraction plus [K,1]
    binomial recombination (dx = gx' - lx with |lx| < tile, so the
    expansion loses < ~1e-5 relative)."""
    l = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    lx = (l % tile_x).astype(jnp.float32)
    ly = (l // tile_x).astype(jnp.float32)
    one = jnp.ones((1, p), jnp.float32)
    return jnp.concatenate(
        [one, lx, ly, lx * lx, lx * ly, ly * ly], axis=0)


def _chunk_alpha_mm(attr, pix_basis, oxf, oyf, k, p, need_dxdy=False,
                    opac=None):
    """_chunk_alpha computed as ONE [K,6]@[6,P] MXU contraction: the
    quadratic  power = -0.5*ca*dx^2 - 0.5*cc*dy^2 - cb*dx*dy  expands into
    6 per-Gaussian coefficients against the per-tile pixel basis, turning
    ~8 [K,P] VPU passes (dx/dy/power algebra) into [1,K] scalar-row algebra
    plus one tiny matmul.  HIGHEST precision (bf16x6) keeps the f32
    contraction exact enough that only inclusion-threshold ties can flip
    (tile-local coordinates bound every basis term by ~tile^2 * conic, so
    rounding stays < ~2e-4); same quirks as _chunk_alpha otherwise."""
    def row(i):
        return attr[i:i + 1, :]                     # [1, K]
    gx = row(0) - oxf
    gy = row(1) - oyf
    ca, cb, cc = row(2), row(3), row(4)
    coeff = jnp.concatenate([
        -0.5 * (ca * gx * gx + cc * gy * gy) - cb * gx * gy,
        ca * gx + cb * gy,
        cc * gy + cb * gx,
        ca, cb, cc], axis=0)                        # [6, K]
    power = jax.lax.dot_general(
        coeff, pix_basis, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)        # [K, P]
    # broken-conic guard: see _chunk_alpha (forward.cu:310)
    g = jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(
        ALPHA_MAX, (attr[5, :].reshape(k, 1) if opac is None else opac) * g)
    a_eff = jnp.where((alpha >= ALPHA_MIN) & (power <= 0.0), alpha, 0.0)
    dx = dy = None
    if need_dxdy:
        dx = attr[0, :].reshape(k, 1) - (oxf + pix_basis[1:2, :])
        dy = attr[1, :].reshape(k, 1) - (oyf + pix_basis[2:3, :])
    return dx, dy, g, alpha, a_eff


def _tile_pixel_coords(t, grid_x, tile_x, tile_y, p, y0_tiles=0):
    """``y0_tiles``: global tile-row offset of this strip (0 = full frame);
    pixel coordinates are always global so splat means need no rebasing."""
    ox = (t % grid_x) * tile_x
    oy = (t // grid_x + y0_tiles) * tile_y
    l = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    pxf = (ox + l % tile_x).astype(jnp.float32)
    pyf = (oy + l // tile_x).astype(jnp.float32)
    return pxf, pyf


# ---------------------------------------------------------------------------
# instance expansion (duplicateWithKeys, rasterizer_impl.cu:90-112)
# ---------------------------------------------------------------------------

def _expand_kernel(g0s_ref, rows_hbm, *refs, k, w):
    out_refs, (rows_vmem, sem) = refs[:-2], refs[-2:]
    """Spread gaussian attribute rows to instance slots.

    Chunk c owns output slots [c*k, (c+1)*k).  The owner of slot s is the
    LAST gaussian g with offsets[g] <= s (offsets = exclusive cumsum of
    tiles_touched; zero-tile gaussians tie with their successor and are
    skipped by taking the last).  g0s[c] is a 128-aligned lower bound such
    that every owner of the chunk lies in [g0s[c], g0s[c] + w) — verified
    by the caller, which falls back to a gather for overflowing chunks.

    The spread itself is an exact one-hot MXU matmul: out[:, s] =
    rows @ onehot(owner_rank).  Every row value is exactly representable
    in f32 (floats, or ints < 2^24) and HIGHEST-precision products by
    {0.0, 1.0} are exact, so this reproduces the gather bit-for-bit."""
    c = pl.program_id(0)
    nc = pl.num_programs(0)

    def copy_win(ci, slot):
        off = pl.multiple_of(g0s_ref[ci], 128)
        return pltpu.make_async_copy(rows_hbm.at[:, pl.ds(off, w)],
                                     rows_vmem.at[slot], sem.at[slot])

    @pl.when(c == 0)
    def _():
        copy_win(0, 0).start()

    slot = jax.lax.rem(c, 2)

    @pl.when(c + 1 < nc)
    def _():
        copy_win(c + 1, 1 - slot).start()

    copy_win(c, slot).wait()
    rows = rows_vmem[slot]
    offs = rows[0:1, :]                                       # [1, W]
    slots = (c * k + jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
             ).astype(jnp.float32)                            # [K, 1]
    # one-hot of the owner (last j with offs[j] <= slot) by MONOTONE
    # DIFFERENCE: A[s, j] = (offs[j] <= s) is non-increasing along j
    # (offs sorted), so A - shift_left(A) is 1 exactly at the owner and 0
    # elsewhere (ties from zero-tile gaussians collapse to the last).  No
    # cross-lane count reduce + rank compare (both full [K, W] passes).
    # The last column's shifted-in 0 claims ownership iff A[s, w-1] = 1 —
    # exact, because the caller's `over` guard keeps owners inside the
    # window.  A is {0, 1} so the subtraction is exact in f32.
    A = (offs <= slots).astype(jnp.float32)                   # [K, W]
    nxt = pltpu.roll(A, shift=w - 1, axis=1)  # left-by-1 (shift >= 0 only)
    colw = jax.lax.broadcasted_iota(jnp.int32, (k, w), 1)
    oh = A - jnp.where(colw == w - 1, 0.0, nxt)               # [K, W]
    # HIGHEST: each f32 splits exactly into bf16 terms, and products by
    # {0.0, 1.0} reconstruct the f32 value exactly (Mosaic supports only
    # DEFAULT — which would quantize the rows to bf16 — and HIGHEST)
    res = jax.lax.dot_general(
        rows, oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                  # [R, K]
    for i, o in enumerate(out_refs):
        o[0, :] = res[i, :]


def expand_rows_pallas(rows: jnp.ndarray, g0s: jnp.ndarray, mi_pad: int,
                       w: int, k: int = 512) -> list:
    """rows: [R, NPAD] f32 gaussian table (row 0 = offsets; NPAD a multiple
    of 128, >= max(g0s) + w).  g0s: [mi_pad // k] int32, 128-aligned window
    starts.  Returns R 1-D [mi_pad] arrays with out[i][s] = rows[i,
    owner(s)] — separate outputs so downstream column consumers never
    strided-slice a [R, MI] stack (XLA relayouts + serialized extraction,
    measured 2.8 ms/frame)."""
    r = rows.shape[0]
    nchunks = mi_pad // k
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((1, k), lambda c, *_: (0, c))] * r,
        scratch_shapes=[pltpu.VMEM((2, r, w), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    kern = functools.partial(_expand_kernel, k=k, w=w)
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, mi_pad), jnp.float32)] * r,
        interpret=_interpret(),
    )(g0s, rows)
    return [o.reshape(-1) for o in outs]


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _packed_step(metas, total, a_first, y0_ref, attr_hbm, c0_vmem, c0_sem,
                 color_ref, aux_ref, *, k, p, grid_x, tile_x, tile_y, tps,
                 need_aux):
    """One grid step whose tps tiles ALL fit in a single aligned [k]-row
    window: composite every tile with ONE chunk pipeline.

    Exactness vs the per-tile path (see _fwd_kernel docstring): pixel
    coordinates are rebuilt per ROW as integer origin + tile-local iota
    (exact f32 adds reproduce dx = gx - px bit-for-bit), the prefix is
    segmented by zeroing cross-group entries of the [K,K] triangular
    operator (the per-tile path zeroes the same contraction terms via
    out-of-range log(1)=0), and color/depth leave through group-masked
    [16,K]/[8,K] MXU contractions placing identical values at identical
    positions."""
    zero_c = jnp.zeros((3, p), jnp.float32)
    one_t = jnp.ones((1, p), jnp.float32)

    @pl.when(total == 0)
    def _():
        # all tiles empty: constant outputs, no DMA was issued
        for i in range(tps):
            color_ref[i] = zero_c
            aux_ref[i, 0, :] = jnp.full((p,), DEPTH_DEFAULT, jnp.float32)
            aux_ref[i, 1, :] = one_t[0]
            if need_aux:
                aux_ref[i, 2, :] = jnp.zeros((p,), jnp.float32)

    @pl.when(total > 0)
    def _():
        pltpu.make_async_copy(
            attr_hbm.at[:, pl.ds(a_first, k)], c0_vmem.at[0],
            c0_sem.at[0]).wait()
        attr = c0_vmem[0]
        ridx_c = a_first + jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
        ridx_r = a_first + jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
        # group membership / per-row tile origin & rank base ([K,1] and
        # [1,K] orientations built directly — no relayout transposes)
        m_c, m_r = [], []
        ox_c = jnp.zeros((k, 1), jnp.float32)
        oy_c = jnp.zeros((k, 1), jnp.float32)
        rank_c = jnp.zeros((k, 1), jnp.int32)
        gid_c = jnp.full((k, 1), -1, jnp.int32)
        gid_r = jnp.full((1, k), -1, jnp.int32)
        for i, (t, s_i, c_i, _, _) in enumerate(metas):
            mc = (ridx_c >= s_i) & (ridx_c < s_i + c_i)
            mr = (ridx_r >= s_i) & (ridx_r < s_i + c_i)
            m_c.append(mc)
            m_r.append(mr)
            oxf = ((t % grid_x) * tile_x).astype(jnp.float32)
            oyf = ((t // grid_x + y0_ref[0]) * tile_y).astype(jnp.float32)
            ox_c = jnp.where(mc, oxf, ox_c)
            oy_c = jnp.where(mc, oyf, oy_c)
            rank_c = jnp.where(mc, ridx_c - s_i + 1, rank_c)
            gid_c = jnp.where(mc, i, gid_c)
            gid_r = jnp.where(mr, i, gid_r)
        valid_c = gid_c >= 0
        # exact per-row pixel coordinates: integer origin + local iota
        l = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
        lx = (l % tile_x).astype(jnp.float32)
        ly = (l // tile_x).astype(jnp.float32)
        pxf = ox_c + lx                                          # [K, P]
        pyf = oy_c + ly
        opac_m = jnp.where(valid_c, attr[5, :].reshape(k, 1), 0.0)
        _, _, _, _, a_eff = _chunk_alpha(attr, pxf, pyf, k, p, opac=opac_m)
        # group-segmented prefix product: zero cross-group entries of the
        # triangular operator; same [K,K]@[K,P] contraction as _prefix_mul
        r_kk = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
        c_kk = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
        seg = ((r_kk >= c_kk) & (gid_c == gid_r)
               & valid_c).astype(jnp.float32)
        tt = jnp.exp(jax.lax.dot_general(
            seg, jnp.log(1.0 - a_eff), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        is_start = rank_c == 1
        tprev = jnp.where(is_start, 1.0, pltpu.roll(tt, shift=1, axis=0))
        live = tt >= T_EPS
        w = a_eff * tprev * live.astype(jnp.float32)
        # color: rows 3i+c of a group-masked [~3*tps, K] matrix -> one MXU
        # dot (row count padded to the f32 sublane tile)
        ncrow = -(-3 * tps // 8) * 8
        ndrow = -(-tps // 8) * 8
        crows = []
        for i in range(tps):
            for c in range(3):
                crows.append(jnp.where(m_r[i], attr[6 + c:7 + c, :], 0.0))
        crows.extend([jnp.zeros((1, k), jnp.float32)] * (ncrow - 3 * tps))
        cmat = jnp.concatenate(crows, axis=0)                 # [ncrow, K]
        call = jax.lax.dot_general(
            cmat, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)              # [ncrow, P]
        crossing = ((tprev > 0.5) & (tt < 0.5)).astype(jnp.float32)
        drows = [jnp.where(m_r[i], attr[9:10, :], 0.0) for i in range(tps)]
        drows.extend([jnp.zeros((1, k), jnp.float32)] * (ndrow - tps))
        dall = jax.lax.dot_general(
            jnp.concatenate(drows, axis=0), crossing,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                 # [8, P]
        for i in range(tps):
            t_i = jnp.minimum(one_t, jnp.min(
                jnp.where(m_c[i] & live, tt, 2.0), axis=0, keepdims=True))
            color_ref[i] = call[3 * i:3 * i + 3]
            aux_ref[i, 0, :] = jnp.where(t_i < 0.5, dall[i:i + 1],
                                         DEPTH_DEFAULT)[0]
            aux_ref[i, 1, :] = t_i[0]
            if need_aux:
                contrib = (a_eff > 0.0) & live & m_c[i]
                nc = jnp.max(jnp.where(contrib, rank_c, 0), axis=0,
                             keepdims=True)
                aux_ref[i, 2, :] = nc.astype(jnp.float32)[0]


def _fwd_kernel(starts_ref, counts_ref, y0_ref, attr_hbm,
                color_ref, aux_ref, attr_vmem, c0_vmem, sem, c0_sem,
                *, k, p, grid_x, tile_x, tile_y, nt, tps,
                prefix="roll", need_aux=True, alpha_matmul=False,
                pack_small=False):
    """Each grid step owns ``tps`` consecutive tiles: per-tile fixed costs
    (grid bookkeeping, output-window DMAs, and — via the batched chunk-0
    prefetch below — the first HBM fetch latency) measured ~3us/tile,
    ~40% of the 460k-instance frame, so they are amortized 1/tps.

    ``pack_small``: when every tile of a grid step fits in ONE aligned
    [K]-row window (measured ~50% of steps at bench scale — background
    regions), serve the whole step with a single chunk pipeline instead
    of tps of them: a group-segmented prefix plus group-masked output
    contractions attack the 1-chunk-per-tile compute minimum that is
    ~37% of the frame (docs/PERF.md).  Bit-identical to the per-tile
    path: per-row integer tile origins reproduce the exact dx = gx - px
    rounding, and the segmented [K,K] prefix/[*,K] output matmuls place
    the same values at the same contraction positions."""
    step = pl.program_id(0)
    rows1 = _row_iota(k, p)
    rows_col = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    cols_row = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    if alpha_matmul:
        pix_basis = _pixel_basis(p, tile_x)

    def tile_meta(i):
        ti = step * tps + i
        t = jnp.minimum(ti, nt - 1)
        start = starts_ref[t]
        count = jnp.where(ti < nt, counts_ref[t], 0)
        # tile ranges are UNALIGNED; DMA the chunk-aligned envelope and
        # mask boundary rows by instance rank (neighbours' rows -> alpha 0)
        astart = pl.multiple_of((start // k) * k, k)
        nchunks = pl.cdiv(start - astart + count, k)
        return t, start, count, astart, nchunks

    # packed-step eligibility (traced): all tps tile ranges inside one
    # aligned [k]-row window.  Only the matmul prefix segments cheaply.
    pack = pack_small and prefix == "matmul" and not alpha_matmul
    if pack:
        metas = [tile_meta(i) for i in range(tps)]
        a_first = metas[0][3]
        end_max = metas[0][1] + metas[0][2]
        total = metas[0][2]
        for _, s_i, c_i, _, _ in metas[1:]:
            end_max = jnp.maximum(end_max, s_i + c_i)
            total = total + c_i
        packable = (end_max - a_first) <= k
        not_packable = jnp.logical_not(packable)

        @pl.when(packable & (total > 0))
        def _():
            pltpu.make_async_copy(
                attr_hbm.at[:, pl.ds(a_first, k)], c0_vmem.at[0],
                c0_sem.at[0]).start()

    # batch-issue every tile's FIRST chunk DMA up front: its HBM latency
    # hides behind the preceding tiles' compute instead of stalling each
    # tile's loop entry
    for i in range(tps):
        _, _, _, astart_i, nchunks_i = tile_meta(i)
        want = nchunks_i > 0
        if pack:
            want = want & not_packable

        @pl.when(want)
        def _(i=i, astart_i=astart_i):
            pltpu.make_async_copy(
                attr_hbm.at[:, pl.ds(astart_i, k)], c0_vmem.at[i],
                c0_sem.at[i]).start()

    if pack:
        @pl.when(packable)
        def _():
            _packed_step(
                metas, total, a_first, y0_ref, attr_hbm, c0_vmem, c0_sem,
                color_ref, aux_ref, k=k, p=p, grid_x=grid_x, tile_x=tile_x,
                tile_y=tile_y, tps=tps, need_aux=need_aux)

        @pl.when(not_packable)
        def _():
            _per_tile_steps(
                tile_meta, y0_ref, attr_hbm, color_ref, aux_ref, attr_vmem,
                c0_vmem, sem, c0_sem, rows1, rows_col, cols_row,
                pix_basis=None, k=k, p=p, grid_x=grid_x, tile_x=tile_x,
                tile_y=tile_y, tps=tps, prefix=prefix, need_aux=need_aux,
                alpha_matmul=alpha_matmul)
    else:
        _per_tile_steps(
            tile_meta, y0_ref, attr_hbm, color_ref, aux_ref, attr_vmem,
            c0_vmem, sem, c0_sem, rows1, rows_col, cols_row,
            pix_basis=pix_basis if alpha_matmul else None, k=k, p=p,
            grid_x=grid_x, tile_x=tile_x, tile_y=tile_y, tps=tps,
            prefix=prefix, need_aux=need_aux, alpha_matmul=alpha_matmul)


def _per_tile_steps(tile_meta, y0_ref, attr_hbm, color_ref, aux_ref,
                    attr_vmem, c0_vmem, sem, c0_sem, rows1, rows_col,
                    cols_row, *, pix_basis, k, p, grid_x, tile_x, tile_y,
                    tps, prefix, need_aux, alpha_matmul):
    for i in range(tps):
        t, start, count, astart, nchunks = tile_meta(i)
        if alpha_matmul:
            oxf = ((t % grid_x) * tile_x).astype(jnp.float32)
            oyf = ((t // grid_x + y0_ref[0]) * tile_y).astype(jnp.float32)
        else:
            pxf, pyf = _tile_pixel_coords(t, grid_x, tile_x, tile_y, p,
                                          y0_ref[0])

        def copy_chunk(c, slot, astart=astart):
            off = pl.multiple_of(astart + c * k, k)
            return pltpu.make_async_copy(
                attr_hbm.at[:, pl.ds(off, k)], attr_vmem.at[slot],
                sem.at[slot])

        def process(attr, c, T_in, C_in, D_in, NC_in,
                    start=start, count=count, astart=astart):
            # 1-based rank of each row within THIS tile's [start, count)
            # range.  Range validity depends only on the ROW, so it folds
            # into the opacity COLUMN — zero [K, P] passes spent on
            # boundary masking.  The [1, K] row mask additionally zeroes
            # the color/depth rows so a count==0 tile (whose chunk-0
            # buffer was never DMA'd and may hold garbage, even NaN)
            # contributes exactly nothing.  Masking must be a SELECT, not
            # a multiply: uninitialized VMEM is implementation-defined and
            # NaN*0 == NaN would survive into the dot accumulation.  (The
            # alpha path is already NaN-safe: `alpha >= ALPHA_MIN` is
            # False for NaN, so a_eff selects to 0.)
            base = (astart - start) + c * k + 1
            rank1 = base + rows_col                                  # [K,1]
            maskrow = ((base + cols_row >= 1) &
                       (base + cols_row <= count)).astype(jnp.float32)
            opac_m = jnp.where((rank1 >= 1) & (rank1 <= count),
                               attr[5, :].reshape(k, 1), 0.0)
            if alpha_matmul:
                _, _, _, _, a_eff = _chunk_alpha_mm(
                    attr, pix_basis, oxf, oyf, k, p, opac=opac_m)
            else:
                _, _, _, _, a_eff = _chunk_alpha(attr, pxf, pyf, k, p,
                                                 opac=opac_m)
            # prefix transmittance within chunk (carry folded in)
            tt = _prefix_mul(1.0 - a_eff, k, prefix) * T_in          # [K,P]
            tprev = pltpu.roll(tt, shift=1, axis=0)
            tprev = jnp.where(rows1 < 1, T_in, tprev)
            live = tt >= T_EPS
            # a_eff = 0 already zeroes the weight, so live alone gates it
            w = a_eff * tprev * live.astype(jnp.float32)
            rgbk = jnp.where(maskrow > 0, attr[6:9, :], 0.0)         # [3,K]
            # HIGHEST: Mosaic DEFAULT quantizes dot inputs to bf16 (~2^-9
            # rel error on accumulated color); this dot is tiny so
            # exactness is free
            C_out = C_in + jax.lax.dot_general(
                rgbk, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            # median depth: T crosses 0.5 at most once (monotone), and
            # only at a contributing row (tt < tprev), so one {0,1}
            # matvec against the depth row captures the crossing depth
            # exactly (HIGHEST: products by 0/1); the 15.0 default is
            # applied after the loop from T_final >= 0.5
            # (forward.cu:307-308,363-372)
            crossing = ((tprev > 0.5) & (tt < 0.5)).astype(jnp.float32)
            D_out = D_in + jax.lax.dot_general(
                jnp.where(maskrow > 0, attr[9:10, :], 0.0), crossing,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            if need_aux:
                contrib = (a_eff > 0.0) & live
                NC_out = jnp.maximum(
                    NC_in, jnp.max(jnp.where(contrib, rank1, 0), axis=0,
                                   keepdims=True))
            else:
                NC_out = NC_in
            T_out = jnp.minimum(
                T_in, jnp.min(jnp.where(live, tt, 2.0), axis=0,
                              keepdims=True))
            return T_out, C_out, D_out, NC_out

        # peeled chunk 0 from the batch-prefetch buffer; kick chunk 1
        # into the rotating double-buffer before computing on chunk 0
        @pl.when(nchunks > 0)
        def _(i=i, astart=astart):
            pltpu.make_async_copy(
                attr_hbm.at[:, pl.ds(astart, k)], c0_vmem.at[i],
                c0_sem.at[i]).wait()

        @pl.when(nchunks > 1)
        def _():
            copy_chunk(1, 1).start()

        T1, C1, D1, NC1 = process(
            c0_vmem[i], 0,
            jnp.ones((1, p), jnp.float32), jnp.zeros((3, p), jnp.float32),
            jnp.zeros((1, p), jnp.float32), jnp.zeros((1, p), jnp.int32))

        def cond(carry):
            c, T_in, *_ = carry
            # early termination: stop once every pixel's transmittance is
            # saturated (forward.cu's per-pixel done flag, per tile)
            return jnp.logical_and(c < nchunks, jnp.any(T_in >= T_EPS))

        def body(carry):
            c, T_in, C_in, D_in, NC_in = carry
            slot = jax.lax.rem(c, 2)
            copy_chunk(c, slot).wait()

            @pl.when(c + 1 < nchunks)
            def _():
                copy_chunk(c + 1, 1 - slot).start()

            outs = process(attr_vmem[slot], c, T_in, C_in, D_in, NC_in)
            return (c + 1,) + outs

        c_fin, T, C, D, NC = jax.lax.while_loop(
            cond, body, (jnp.int32(1), T1, C1, D1, NC1))

        # drain the prefetch issued for a chunk never processed (early exit)
        @pl.when(c_fin < nchunks)
        def _():
            copy_chunk(c_fin, jax.lax.rem(c_fin, 2)).wait()

        color_ref[i] = C
        aux_ref[i, 0, :] = jnp.where(T < 0.5, D, DEPTH_DEFAULT)[0]
        aux_ref[i, 1, :] = T[0]
        if need_aux:
            # n_contrib rides the f32 aux plane (counts < 2^24: exact)
            aux_ref[i, 2, :] = NC.astype(jnp.float32)[0]


def _assemble(x, grid_y, grid_x, tile_y, tile_x, height, width, ch=None):
    """[NT, C?, P] -> [(C?,) H, W]"""
    if ch is None:
        x = x.reshape(grid_y, grid_x, tile_y, tile_x)
        x = jnp.moveaxis(x, 2, 1).reshape(grid_y * tile_y, grid_x * tile_x)
        return x[:height, :width]
    x = x.reshape(grid_y, grid_x, ch, tile_y, tile_x)
    x = jnp.transpose(x, (2, 0, 3, 1, 4)).reshape(
        ch, grid_y * tile_y, grid_x * tile_x)
    return x[:, :height, :width]


def forward_tiles_pallas(bins, bg, width, height, tile_x, tile_y, chunk,
                         prefix="roll", grid_y_local: int = 0,
                         y0_tiles=None, need_aux: bool = True,
                         alpha_matmul: bool = False,
                         pack_small: bool = False):
    """bins: binning.StagedBins (gather-free staged instance table).

    ``grid_y_local``/``y0_tiles``: strip mode — bins cover only
    ``grid_y_local`` tile rows starting at global tile row ``y0_tiles``
    (traced); outputs keep the full strip height, uncropped."""
    p = tile_x * tile_y
    assert p % 128 == 0, "pallas path needs tile_x*tile_y % 128 == 0"
    k = chunk
    grid_x = (width + tile_x - 1) // tile_x
    strip = grid_y_local > 0
    grid_y = grid_y_local if strip else (height + tile_y - 1) // tile_y
    out_h = grid_y * tile_y if strip else height
    nt = grid_x * grid_y
    y0 = (jnp.zeros((1,), jnp.int32) if y0_tiles is None
          else jnp.asarray(y0_tiles, jnp.int32).reshape(1))
    # tiles per grid step (amortization; see _fwd_kernel).  4 measured
    # best pre-pack; SARO_TPS is the A/B knob now that pack_small makes
    # larger steps attractive (more tiles share one packed chunk).
    tps = min(int(os.environ.get("SARO_TPS", "4")), nt)
    ntp = -(-nt // tps) * tps
    naux = 3 if need_aux else 2

    kern = functools.partial(_fwd_kernel, k=k, p=p, grid_x=grid_x,
                             tile_x=tile_x, tile_y=tile_y, nt=nt, tps=tps,
                             prefix=prefix, need_aux=need_aux,
                             alpha_matmul=alpha_matmul,
                             pack_small=pack_small)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ntp // tps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((tps, 3, p), lambda s, *_: (s, 0, 0)),
            pl.BlockSpec((tps, naux, p), lambda s, *_: (s, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((2, _ROWS, k), jnp.float32),
                        pltpu.VMEM((tps, _ROWS, k), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((tps,))],
    )
    color, aux = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ntp, 3, p), jnp.float32),
            jax.ShapeDtypeStruct((ntp, naux, p), jnp.float32),
        ],
        interpret=_interpret(),
    )(bins.tile_start, bins.tile_count, y0, bins.attr)

    color_img = _assemble(color[:nt], grid_y, grid_x, tile_y, tile_x, out_h,
                          width, ch=3)
    t_img = _assemble(aux[:nt, 1], grid_y, grid_x, tile_y, tile_x, out_h,
                      width)
    color_img = color_img + t_img[None] * bg.astype(jnp.float32)[:, None, None]
    return ForwardTilesOut(
        color=color_img,
        depth=_assemble(aux[:nt, 0], grid_y, grid_x, tile_y, tile_x, out_h,
                        width),
        final_t=t_img,
        n_contrib=(_assemble(aux[:nt, 2], grid_y, grid_x, tile_y, tile_x,
                             out_h, width).astype(jnp.int32) if need_aux
                   else jnp.zeros((out_h, width), jnp.int32)))


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(starts_ref, counts_ref, y0_ref, attr_hbm, dpix_ref, cfg_ref,
                tfin_ref, bg_ref, gzero_hbm,
                grads_hbm,
                attr_vmem, gout_vmem, gprev_vmem, sem_in, sem_out, sem_prev,
                *, k, p, grid_x, tile_x, tile_y, width, height,
                prefix="roll", alpha_matmul=False):
    del gzero_hbm  # aliased into grads_hbm: pre-zeroed output
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]   # pre-clamped to the tile's max n_contrib
    astart = pl.multiple_of((start // k) * k, k)
    lead = start - astart
    nchunks = pl.cdiv(lead + count, k)
    oxf = ((t % grid_x) * tile_x).astype(jnp.float32)
    oyf = ((t // grid_x + y0_ref[0]) * tile_y).astype(jnp.float32)
    if alpha_matmul:
        # the REPLAY must reproduce the forward's alpha chain bit-for-bit,
        # so the backward uses the same matmul quadratic
        pix_basis = _pixel_basis(p, tile_x)
    else:
        pxf, pyf = _tile_pixel_coords(t, grid_x, tile_x, tile_y, p,
                                      y0_ref[0])
    rows = _row_iota(k, p)
    rows_col = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    mom_basis = _moment_basis(p, tile_x)
    dpix = dpix_ref[0]                    # [3, P]
    c_fg = cfg_ref[0]                     # [3, P]
    tfin = tfin_ref[0]                    # [1, P]
    bg = bg_ref[0]                        # [3, P]
    bg_dot = jnp.sum(bg * dpix, axis=0, keepdims=True)   # [1, P]
    # combined cotangent constant (see d_alpha below): Sum_ch c_fg*dpix
    # + T_fin * <bg, dpix>, one [1, P] per tile
    numer = jnp.sum(c_fg * dpix, axis=0, keepdims=True) + tfin * bg_dot

    def copy_chunk(c, slot):
        off = pl.multiple_of(astart + c * k, k)
        return pltpu.make_async_copy(
            attr_hbm.at[:, pl.ds(off, k)], attr_vmem.at[slot],
            sem_in.at[slot])

    @pl.when(nchunks > 0)
    def _():
        copy_chunk(0, 0).start()
        # the first chunk's window can be SHARED with preceding tiles
        # (unaligned start): read-modify-write so their already-written
        # gradient rows survive.  The grid runs tiles in ascending order on
        # one core, so the predecessor's store has completed.
        gprev_vmem[...] = jnp.zeros((_GROWS, k), jnp.float32)

        @pl.when(lead > 0)
        def _():
            dma_prev = pltpu.make_async_copy(
                grads_hbm.at[:, pl.ds(astart, k)], gprev_vmem, sem_prev)
            dma_prev.start()
            dma_prev.wait()

    def cond(carry):
        c, T_in, _ = carry
        return jnp.logical_and(c < nchunks, jnp.any(T_in >= T_EPS))

    def body(carry):
        c, T_in, P_in = carry
        slot = jax.lax.rem(c, 2)
        copy_chunk(c, slot).wait()

        @pl.when(c + 1 < nchunks)
        def _():
            copy_chunk(c + 1, 1 - slot).start()

        attr = attr_vmem[slot]
        # rank-range mask folded into the opacity column (see _fwd_kernel)
        rank1 = (astart - start) + c * k + rows_col + 1              # [K,1]
        op_k = attr[5, :].reshape(k, 1)
        opac_m = jnp.where((rank1 >= 1) & (rank1 <= count), op_k, 0.0)
        if alpha_matmul:
            _, _, g, alpha, a_eff = _chunk_alpha_mm(
                attr, pix_basis, oxf, oyf, k, p, opac=opac_m)
        else:
            _, _, g, alpha, a_eff = _chunk_alpha(attr, pxf, pyf, k, p,
                                                 opac=opac_m)
        tt = _prefix_mul(1.0 - a_eff, k, prefix) * T_in
        tprev = pltpu.roll(tt, shift=1, axis=0)
        tprev = jnp.where(rows < 1, T_in, tprev)
        live = tt >= T_EPS
        contrib = (a_eff > 0.0) & live
        cmask = contrib.astype(jnp.float32)
        w = cmask * a_eff * tprev                         # [K, P]
        one_m = 1.0 - a_eff

        # d_alpha, all three channels at once.  The reference's per-channel
        # accum_rec suffix recovery (backward.cu:515-534) is LINEAR in the
        # channel, so  Sum_ch (c_k*tprev - S_ch/one_m)*dpix_ch  collapses:
        #   CD   = colors^T @ dpix            (one [K,3]@[3,P] MXU dot)
        #   pref = prefix(w * CD) + carry     (ONE combined prefix, not 3)
        #   d_alpha = cmask*(tprev*CD - (numer - pref)/one_m)
        CD = jax.lax.dot_general(
            attr[6:9, :], dpix, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)          # [K, P]
        pref = _prefix_add(w * CD, k, prefix) + P_in
        d_alpha = cmask * (tprev * CD - (numer - pref) / one_m)
        # NOTE: like the reference, no gradient gating on the 0.99 clamp

        # conic/mean gradient chains: every term is Sum_p e * dx^a dy^b
        # with e = opacity * g * d_alpha and dx = gx' - lx, so ONE
        # [K,P]@[P,6] moment contraction + [K,1] binomial recombination
        # replaces five separate multiply+reduce passes ({0,1}-free but
        # HIGHEST keeps it f32-exact; see _moment_basis)
        e = g * d_alpha                                   # [K, P]
        mom = jax.lax.dot_general(
            e, mom_basis, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)          # [K, 6]

        def m(j):
            return mom[:, j:j + 1]                        # [K, 1]
        gx = attr[0, :].reshape(k, 1) - oxf
        gy = attr[1, :].reshape(k, 1) - oyf
        e_dx = gx * m(0) - m(1)
        e_dy = gy * m(0) - m(2)
        e_dxx = gx * gx * m(0) - 2.0 * gx * m(1) + m(3)
        e_dxy = gx * gy * m(0) - gx * m(2) - gy * m(1) + m(4)
        e_dyy = gy * gy * m(0) - 2.0 * gy * m(2) + m(5)
        ca, cb, cc = (attr[i, :].reshape(k, 1) for i in (2, 3, 4))
        d_mx = (-(ca * e_dx + cb * e_dy) * op_k)[:, 0] * (0.5 * width)
        d_my = (-(cc * e_dy + cb * e_dx) * op_k)[:, 0] * (0.5 * height)
        d_ca = (-0.5 * e_dxx * op_k)[:, 0]
        d_cb = (-e_dxy * op_k)[:, 0]
        d_cc = (-0.5 * e_dyy * op_k)[:, 0]
        # d_op = Sum_p g*d_alpha = M0 (e has no opacity factor here)
        d_op = m(0)[:, 0]
        # d_rgb: [K, P] @ [P, 3] on the MXU (HIGHEST: see forward color dot)
        d_rgb = jax.lax.dot_general(
            w, dpix, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)          # [K, 3]

        # boundary rows belong to neighbouring tiles: the first chunk merges
        # the predecessor's rows back in (gprev; zeros when start aligned),
        # later chunks write zeros there — the SUCCESSOR tile's own RMW
        # preserves whatever it needs, and trailing rows past its range are
        # covered by the aliased zero init.
        mine = (rank1[:, 0:1] >= 1) & (rank1[:, 0:1] <= count)     # [K, 1]
        minef = mine.astype(jnp.float32)
        keep = jnp.where(c == 0, 1.0 - minef, 0.0)

        def put(i, v):
            gout_vmem[i, :] = (minef * v.reshape(k, 1)
                               + keep * gprev_vmem[i, :].reshape(k, 1)
                               ).reshape(k)

        put(0, d_rgb[:, 0])
        put(1, d_rgb[:, 1])
        put(2, d_rgb[:, 2])
        put(3, d_mx)
        put(4, d_my)
        put(5, d_ca)
        put(6, d_cb)
        put(7, d_cc)
        put(8, d_op)
        off = pl.multiple_of(astart + c * k, k)
        dma_out = pltpu.make_async_copy(
            gout_vmem, grads_hbm.at[:, pl.ds(off, k)], sem_out)
        dma_out.start()
        dma_out.wait()   # gout is reused next chunk; keep the store fenced

        T_out = jnp.minimum(
            T_in, jnp.min(jnp.where(live, tt, 2.0), axis=0, keepdims=True))
        P_out = pref[k - 1:k, :]                          # [1, P]
        return c + 1, T_out, P_out

    T0 = jnp.ones((1, p), jnp.float32)
    P0 = jnp.zeros((1, p), jnp.float32)
    c_fin, _, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), T0, P0))

    @pl.when(jnp.logical_and(c_fin > 0, c_fin < nchunks))
    def _():
        copy_chunk(c_fin, jax.lax.rem(c_fin, 2)).wait()


def _tileify(img, grid_y, grid_x, tile_y, tile_x, ch=None):
    """[(C,) H, W] -> [NT, C?, P], zero padded."""
    if ch is None:
        img = img[None]
        c = 1
    else:
        c = ch
    _, h, w = img.shape
    hp, wp = grid_y * tile_y, grid_x * tile_x
    padded = jnp.zeros((c, hp, wp), img.dtype).at[:, :h, :w].set(img)
    x = padded.reshape(c, grid_y, tile_y, grid_x, tile_x)
    x = jnp.transpose(x, (1, 3, 0, 2, 4)).reshape(
        grid_y * grid_x, c, tile_y * tile_x)
    return x


def backward_tiles_pallas(bins, bg, out_color, final_t, d_color,
                          width, height, tile_x, tile_y, chunk,
                          n_contrib=None, prefix="roll",
                          grid_y_local: int = 0, y0_tiles=None,
                          alpha_matmul: bool = False):
    """bins: binning.StagedBins.  Returns per-instance gradients aligned
    with ``bins.ids`` (unaligned layout, zero for never-visited slots).

    In strip mode the image tensors are strip-shaped; ``width``/``height``
    stay FULL-frame — the kernel's NDC mean2d scaling (backward.cu:460-461)
    must use the full frame dims."""
    p = tile_x * tile_y
    k = chunk
    grid_x = (width + tile_x - 1) // tile_x
    strip = grid_y_local > 0
    grid_y = grid_y_local if strip else (height + tile_y - 1) // tile_y
    nt = grid_x * grid_y
    mi_buf = bins.attr.shape[1]
    f32 = jnp.float32
    y0 = (jnp.zeros((1,), jnp.int32) if y0_tiles is None
          else jnp.asarray(y0_tiles, jnp.int32).reshape(1))

    tile_count = bins.tile_count
    # clamp each tile's walk to its max contributing slot (the reference's
    # back-to-front start at n_contrib, backward.cu:440-452): slots past the
    # last contribution have exactly zero gradient (the aliased zero output
    # covers the skipped tail rows)
    if n_contrib is not None:
        nc_t = _tileify(n_contrib.astype(jnp.int32), grid_y, grid_x,
                        tile_y, tile_x)[:, 0]                    # [NT, P]
        tile_count = jnp.minimum(tile_count,
                                 jnp.max(nc_t, axis=-1).astype(jnp.int32))

    bgc = bg.astype(f32)[:, None, None]
    c_fg = out_color.astype(f32) - final_t.astype(f32)[None] * bgc
    dpix_t = _tileify(d_color.astype(f32), grid_y, grid_x, tile_y, tile_x,
                      ch=3)
    cfg_t = _tileify(c_fg, grid_y, grid_x, tile_y, tile_x, ch=3)
    tfin_t = _tileify(final_t.astype(f32), grid_y, grid_x, tile_y, tile_x)
    bg_t = jnp.broadcast_to(bgc, out_color.shape)
    bg_t = _tileify(bg_t, grid_y, grid_x, tile_y, tile_x, ch=3)

    kern = functools.partial(_bwd_kernel, k=k, p=p, grid_x=grid_x,
                             tile_x=tile_x, tile_y=tile_y, width=width,
                             height=height, prefix=prefix,
                             alpha_matmul=alpha_matmul)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                 # attr
            pl.BlockSpec((1, 3, p), lambda t, *_: (t, 0, 0)),     # dpix
            pl.BlockSpec((1, 3, p), lambda t, *_: (t, 0, 0)),     # c_fg
            pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0)),     # final_t
            pl.BlockSpec((1, 3, p), lambda t, *_: (t, 0, 0)),     # bg
            pl.BlockSpec(memory_space=pl.ANY),                 # zero init
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.VMEM((2, _ROWS, k), jnp.float32),
                        pltpu.VMEM((_GROWS, k), jnp.float32),
                        pltpu.VMEM((_GROWS, k), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
    )
    gzero = jnp.zeros((_GROWS, mi_buf), jnp.float32)
    grads = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((_GROWS, mi_buf), jnp.float32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        # flat-input indexing includes the 3 scalar-prefetch operands
        input_output_aliases={8: 0},
        interpret=_interpret(),
    )(bins.tile_start, tile_count, y0, bins.attr, dpix_t, cfg_t, tfin_t,
      bg_t, gzero)[0]

    # raw channel-major per-instance grads [16, MI]; the caller transposes
    # ONCE to row-major and segment-sums all channels in a single
    # vectorized scatter-add (a fused per-channel transpose+scatter
    # compiles to XLA's serial scatter emitter, ~10 ms/view)
    return grads
