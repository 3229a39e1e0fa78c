"""Per-tile alpha compositing, pure-JAX reference path.

Replicates the semantics of the reference's per-tile CUDA kernels
(forward.cu:261-393, backward.cu:399-557) with TPU-friendly structure:

  * front-to-back order is a ``lax.scan`` over each tile's sorted instance
    slots; all per-pixel state is vectorized over the tile's pixels,
  * the per-pixel early-exit (``test_T < 1e-4``) becomes a latched mask,
  * the backward pass re-walks FRONT-to-back (mathematically identical to the
    reference's back-to-front walk) using the identity
    ``accum_rec_k = (C_fg - P_k) / T_{k+1}`` so no reverse traversal or
    atomics are needed; per-instance gradients come out dense and are later
    segment-summed per Gaussian — fully deterministic, unlike the reference's
    atomicAdd backward (backward.cu:523-554).

This path runs everywhere (CPU tests, TPU) and is the correctness oracle for
the Pallas fast path in ``tile_kernels.py``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

ALPHA_MAX = 0.99          # forward.cu:349
ALPHA_MIN = 1.0 / 255.0   # forward.cu:350
T_EPS = 1e-4              # forward.cu:353
DEPTH_DEFAULT = 15.0      # forward.cu:308 (median-depth hack)


class ForwardTilesOut(NamedTuple):
    color: jnp.ndarray      # [3, H, W] (bg composited)
    depth: jnp.ndarray      # [H, W] median depth
    final_t: jnp.ndarray    # [H, W]
    n_contrib: jnp.ndarray  # [H, W] int32


def _tile_pixels(grid_x: int, tile_x: int, tile_y: int, width: int,
                 height: int, t: jnp.ndarray, y0_px=0):
    """Pixel coordinates (flattened [P]) and inside-mask for tile index t.

    ``y0_px`` is a (possibly traced) global pixel-row offset: when rendering
    a strip of tile rows (parallel/shard.py), ``t`` is strip-local while the
    splat means are full-frame pixel coordinates."""
    ox = (t % grid_x) * tile_x
    oy = (t // grid_x) * tile_y + y0_px
    lx = jnp.arange(tile_x, dtype=jnp.int32)
    ly = jnp.arange(tile_y, dtype=jnp.int32)
    px = jnp.broadcast_to(ox + lx[None, :], (tile_y, tile_x)).reshape(-1)
    py = jnp.broadcast_to(oy + ly[:, None], (tile_y, tile_x)).reshape(-1)
    inside = (px < width) & (py < height)
    return px.astype(jnp.float32), py.astype(jnp.float32), inside


def _gather(point_list, idx):
    gid = point_list[jnp.clip(idx, 0, point_list.shape[0] - 1)]
    return gid


def _splat_terms(mean2d, conic, opacity, gid, pxf, pyf):
    g = jnp.clip(gid, 0, mean2d.shape[0] - 1)
    xy = mean2d[g]
    con = conic[g]
    op = opacity[g]
    dx = xy[0] - pxf
    dy = xy[1] - pyf
    power = -0.5 * (con[0] * dx * dx + con[2] * dy * dy) - con[1] * dx * dy
    g_val = jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, op * g_val)
    return dx, dy, power, g_val, alpha, con


def forward_tiles(point_list: jnp.ndarray,
                  tile_start: jnp.ndarray,
                  tile_count: jnp.ndarray,
                  mean2d: jnp.ndarray, conic: jnp.ndarray,
                  opacity: jnp.ndarray, rgb: jnp.ndarray,
                  depth: jnp.ndarray, bg: jnp.ndarray,
                  width: int, height: int, tile_x: int, tile_y: int,
                  max_slots: int, grid_y_local: int = 0,
                  y0_px=0) -> ForwardTilesOut:
    """``grid_y_local``/``y0_px``: render only a strip of tile rows
    (strip-local binning, global pixel coordinates); outputs keep the full
    strip height (grid_y_local*tile_y) uncropped."""
    grid_x = (width + tile_x - 1) // tile_x
    strip = grid_y_local > 0
    grid_y = grid_y_local if strip else (height + tile_y - 1) // tile_y
    num_tiles = grid_x * grid_y
    f32 = mean2d.dtype
    mean2d = mean2d.astype(f32)
    opacity = opacity.reshape(-1).astype(f32)

    def one_tile(t, start, count):
        pxf, pyf, inside = _tile_pixels(grid_x, tile_x, tile_y, width,
                                        height, t, y0_px)
        p = pxf.shape[0]
        init = (jnp.ones((p,), f32),                 # T
                jnp.zeros((p, 3), f32),              # C
                jnp.full((p,), DEPTH_DEFAULT, f32),  # D
                jnp.zeros((p,), jnp.int32),          # n_contrib
                ~inside)                             # done

        def body(carry, s):
            T, C, D, nc, done = carry
            gid = _gather(point_list, start + s)
            slot_ok = (s < count) & (gid >= 0)
            dx, dy, power, g_val, alpha, _ = _splat_terms(
                mean2d, conic, opacity, gid, pxf, pyf)
            ok = slot_ok & ~done & (power <= 0.0) & (alpha >= ALPHA_MIN)
            test_t = T * (1.0 - alpha)
            kill = ok & (test_t < T_EPS)
            contrib = ok & ~kill
            w = jnp.where(contrib, alpha * T, 0.0)
            C = C + w[:, None] * rgb[jnp.clip(gid, 0, rgb.shape[0] - 1)]
            crossing = contrib & (T > 0.5) & (test_t < 0.5)
            D = jnp.where(crossing, depth[jnp.clip(gid, 0, depth.shape[0] - 1)], D)
            nc = jnp.where(contrib, s + 1, nc)
            T = jnp.where(contrib, test_t, T)
            done = done | kill
            return (T, C, D, nc, done), None

        (T, C, D, nc, _), _ = jax.lax.scan(
            body, init, jnp.arange(max_slots, dtype=jnp.int32))
        color = C + T[:, None] * bg[None, :]
        return color, D, T, nc

    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    color, D, T, nc = jax.vmap(one_tile)(tids, tile_start, tile_count)

    out_rows = grid_y * tile_y if strip else height

    def assemble(x, extra_dims=()):
        x = x.reshape((grid_y, grid_x, tile_y, tile_x) + extra_dims)
        x = jnp.moveaxis(x, 2, 1).reshape(
            (grid_y * tile_y, grid_x * tile_x) + extra_dims)
        return x[:out_rows, :width]

    color_img = jnp.moveaxis(assemble(color, (3,)), -1, 0)
    return ForwardTilesOut(color=color_img, depth=assemble(D),
                           final_t=assemble(T), n_contrib=assemble(nc))


class InstanceGrads(NamedTuple):
    d_rgb: jnp.ndarray      # [MI_PAD, 3]
    d_mean2d: jnp.ndarray   # [MI_PAD, 2] (NDC-space grads, i.e. pixel * 0.5*W/H)
    d_conic: jnp.ndarray    # [MI_PAD, 3] (TRUE gradients; unlike CUDA's halved b)
    d_opacity: jnp.ndarray  # [MI_PAD]


def backward_tiles(point_list: jnp.ndarray,
                   tile_start: jnp.ndarray,
                   tile_count: jnp.ndarray,
                   mean2d: jnp.ndarray, conic: jnp.ndarray,
                   opacity: jnp.ndarray, rgb: jnp.ndarray,
                   bg: jnp.ndarray,
                   out_color: jnp.ndarray, final_t: jnp.ndarray,
                   d_color: jnp.ndarray,
                   width: int, height: int, tile_x: int, tile_y: int,
                   max_slots: int, grid_y_local: int = 0,
                   y0_px=0) -> InstanceGrads:
    """Per-instance gradients of the compositing stage.

    ``d_color`` is dL/d(out_color) [3, H, W].  The depth output has no
    backward, matching the reference (submodules README: depth gradients
    unimplemented; __init__.py backward ignores them).

    In strip mode (``grid_y_local``/``y0_px``) the image tensors are
    strip-shaped while ``width``/``height`` stay FULL-frame: the NDC
    mean2d scaling (backward.cu:460-461) must use the full frame dims.
    """
    grid_x = (width + tile_x - 1) // tile_x
    strip = grid_y_local > 0
    grid_y = grid_y_local if strip else (height + tile_y - 1) // tile_y
    img_rows = grid_y * tile_y if strip else height
    num_tiles = grid_x * grid_y
    f32 = mean2d.dtype
    mean2d = mean2d.astype(f32)
    opacity = opacity.reshape(-1).astype(f32)
    mi_pad = point_list.shape[0]

    def tile_slice(img, t, extra_first=False):
        """[H,W] or [C,H,W] -> flattened per-tile pixels, zero padded."""
        ox = (t % grid_x) * tile_x
        oy = (t // grid_x) * tile_y
        if extra_first:
            c = img.shape[0]
            padded = jnp.zeros((c, grid_y * tile_y, grid_x * tile_x), f32)
            padded = padded.at[:, :img_rows, :width].set(img)
            sl = jax.lax.dynamic_slice(
                padded, (jnp.zeros((), oy.dtype), oy, ox),
                (c, tile_y, tile_x))
            return sl.reshape(c, -1).T                     # [P, C]
        padded = jnp.zeros((grid_y * tile_y, grid_x * tile_x), f32)
        padded = padded.at[:img_rows, :width].set(img)
        sl = jax.lax.dynamic_slice(padded, (oy, ox), (tile_y, tile_x))
        return sl.reshape(-1)

    def one_tile(t, start, count):
        pxf, pyf, inside = _tile_pixels(grid_x, tile_x, tile_y, width,
                                        height, t, y0_px)
        p = pxf.shape[0]
        dpix = tile_slice(d_color, t, extra_first=True)        # [P, 3]
        dpix = jnp.where(inside[:, None], dpix, 0.0)
        t_final = tile_slice(final_t, t)
        col_out = tile_slice(out_color, t, extra_first=True)   # [P, 3]
        c_fg = col_out - t_final[:, None] * bg[None, :]
        bg_dot = dpix @ bg

        init = (jnp.ones((p,), f32),          # running T
                jnp.zeros((p, 3), f32),       # running partial sum P_k
                ~inside)                      # done latch

        def body(carry, s):
            T, P_sum, done = carry
            gid = _gather(point_list, start + s)
            slot_ok = (s < count) & (gid >= 0)
            dx, dy, power, g_val, alpha, con = _splat_terms(
                mean2d, conic, opacity, gid, pxf, pyf)
            ok = slot_ok & ~done & (power <= 0.0) & (alpha >= ALPHA_MIN)
            test_t = T * (1.0 - alpha)
            kill = ok & (test_t < T_EPS)
            contrib = ok & ~kill
            cmask = contrib.astype(f32)

            g = jnp.clip(gid, 0, rgb.shape[0] - 1)
            c_k = rgb[g]
            w = alpha * T                                   # [P]
            P_sum = P_sum + (cmask * w)[:, None] * c_k
            S = c_fg - P_sum                                # suffix sum
            one_m_a = 1.0 - alpha
            d_alpha = (jnp.sum((c_k * T[:, None] -
                                S / one_m_a[:, None]) * dpix, axis=-1)
                       - t_final / one_m_a * bg_dot)
            d_alpha = cmask * d_alpha
            # NOTE: like the reference, the 0.99 alpha-clamp is NOT gated in
            # the backward (backward.cu:499,538 always use con_o.w * G).
            d_g = opacity[g] * d_alpha
            gdx = g_val * dx
            gdy = g_val * dy
            d_rgb_slot = (cmask * w)[:, None] * dpix        # [P,3]
            d_mx = d_g * (-gdx * con[0] - gdy * con[1]) * (0.5 * width)
            d_my = d_g * (-gdy * con[2] - gdx * con[1]) * (0.5 * height)
            d_ca = d_g * (-0.5 * gdx * dx)
            d_cb = d_g * (-gdx * dy)
            d_cc = d_g * (-0.5 * gdy * dy)
            d_op = g_val * d_alpha

            T = jnp.where(contrib, test_t, T)
            done = done | kill
            ys = (jnp.sum(d_rgb_slot, axis=0),
                  jnp.stack([jnp.sum(d_mx), jnp.sum(d_my)]),
                  jnp.stack([jnp.sum(d_ca), jnp.sum(d_cb), jnp.sum(d_cc)]),
                  jnp.sum(d_op))
            return (T, P_sum, done), ys

        _, ys = jax.lax.scan(body, init,
                             jnp.arange(max_slots, dtype=jnp.int32))
        return ys  # each [max_slots, ...]

    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    d_rgb, d_m2d, d_con, d_op = jax.vmap(one_tile)(tids, tile_start,
                                                   tile_count)

    # scatter per-(tile, slot) grads into the padded instance layout
    slot_idx = jnp.arange(max_slots, dtype=jnp.int32)[None, :]
    # a tile's padded extent: distance to the next tile's start
    next_start = jnp.concatenate(
        [tile_start[1:], jnp.array([mi_pad], jnp.int32)])
    padded_count = next_start - tile_start
    pos = tile_start[:, None] + slot_idx
    pos = jnp.where(slot_idx < padded_count[:, None], pos, mi_pad)
    pos = pos.reshape(-1)

    def scat(x, shape):
        flat = x.reshape((-1,) + shape)
        out = jnp.zeros((mi_pad,) + shape, f32)
        return out.at[pos].add(flat, mode='drop')

    return InstanceGrads(d_rgb=scat(d_rgb, (3,)),
                         d_mean2d=scat(d_m2d, (2,)),
                         d_conic=scat(d_con, (3,)),
                         d_opacity=scat(d_op, ()))
