"""Mip-pyramid 2D texture sampling, pure JAX (differentiable).

Replaces the reference's nvdiffrast ``texture(..., mip_level_bias=levels,
boundary_mode="clamp", max_mip_level=...)`` call (scene/hexplane.py:49-56),
which is the crux of the scale-aware field: each Gaussian samples the feature
planes at a mip level proportional to its spatial scale.

Semantics implemented (nvdiffrast conventions):
  * texture coords in [0, 1]; texel centers at (i + 0.5) / res,
  * 'clamp' boundary mode,
  * trilinear filtering (linear within a level, linear between levels),
  * mip levels built by 2x2 box-filter downsampling of the base level,
    rebuilt from the learnable level-0 grid every call so gradients flow to
    the base grid (nvdiffrast computes pyramid grads the same way),
  * the level input itself carries no gradient (the reference detaches the
    scales driving it, saro_gaussian.py:780).

TPU note: the pyramid is flattened into one [C, total_texels] buffer so each
sample gathers exactly 8 texels (4 corners x 2 bracketing levels) regardless
of pyramid depth; per-sample level resolution is pure integer math.
"""
from __future__ import annotations

import functools
import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def max_mip_levels(h: int, w: int, cap: int) -> int:
    """Number of levels ABOVE the base that can be built (nvdiffrast caps at
    ``max_mip_level``; level n has resolution res >> n)."""
    n = 0
    while n < cap and (h >> (n + 1)) >= 1 and (w >> (n + 1)) >= 1 \
            and (h >> n) % 2 == 0 and (w >> n) % 2 == 0:
        n += 1
    return n


def build_pyramid(grid: jnp.ndarray, num_levels: int) -> List[jnp.ndarray]:
    """[C, H, W] -> list of num_levels+1 grids (level 0 = input)."""
    levels = [grid]
    g = grid
    for _ in range(num_levels):
        c, h, w = g.shape
        g = g.reshape(c, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
        levels.append(g)
    return levels


def _bilinear(grid: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Sample [C, H, W] at normalized coords (u->W axis, v->H axis), clamp
    boundary, texel centers at half-integers.  Returns [N, C]."""
    c, h, w = grid.shape
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = jnp.clip(x - x0, 0, 1)
    fy = jnp.clip(y - y0, 0, 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    flat = grid.reshape(c, -1).T                 # [H*W, C]
    v00 = flat[y0i * w + x0i]
    v01 = flat[y0i * w + x1i]
    v10 = flat[y1i * w + x0i]
    v11 = flat[y1i * w + x1i]
    top = v00 * (1 - fx)[:, None] + v01 * fx[:, None]
    bot = v10 * (1 - fx)[:, None] + v11 * fx[:, None]
    return top * (1 - fy)[:, None] + bot * fy[:, None]


def _sample_mip_impl(grid: jnp.ndarray, coords: jnp.ndarray,
                     level: jnp.ndarray, max_level: int) -> jnp.ndarray:
    """Gather-based implementation (forward; autodiff backward is the
    oracle for the custom VJP below)."""
    u, v = coords[:, 0], coords[:, 1]
    c, h, w = grid.shape
    n_levels = max_mip_levels(h, w, max_level)
    if n_levels == 0:
        return _bilinear(grid, u, v)
    level = jax.lax.stop_gradient(
        jnp.clip(level.astype(jnp.float32), 0.0, n_levels))
    pyr = build_pyramid(grid, n_levels)
    flat = jnp.concatenate([p.reshape(c, -1) for p in pyr], axis=1).T
    offs = np.cumsum([0] + [int(p.shape[1] * p.shape[2]) for p in pyr])
    offs = jnp.asarray(offs[:-1], jnp.int32)

    l0 = jnp.clip(jnp.floor(level).astype(jnp.int32), 0, n_levels)
    l1 = jnp.clip(l0 + 1, 0, n_levels)
    frac = level - l0

    def samp(l):
        w_l = jnp.right_shift(w, l)
        h_l = jnp.right_shift(h, l)
        x = u * w_l - 0.5
        y = v * h_l - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = jnp.clip(x - x0, 0, 1)
        fy = jnp.clip(y - y0, 0, 1)
        x0i = jnp.clip(x0.astype(jnp.int32), 0, w_l - 1)
        x1i = jnp.minimum(x0i + 1, w_l - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h_l - 1)
        y1i = jnp.minimum(y0i + 1, h_l - 1)
        base = offs[l]
        v00 = flat[base + y0i * w_l + x0i]
        v01 = flat[base + y0i * w_l + x1i]
        v10 = flat[base + y1i * w_l + x0i]
        v11 = flat[base + y1i * w_l + x1i]
        top = v00 * (1 - fx)[:, None] + v01 * fx[:, None]
        bot = v10 * (1 - fx)[:, None] + v11 * fx[:, None]
        return top * (1 - fy)[:, None] + bot * fy[:, None]

    s0 = samp(l0)
    s1 = samp(l1)
    return s0 * (1 - frac)[:, None] + s1 * frac[:, None]


# ------------------------------------------------------------- custom VJP ---

def _scatter_backend() -> str:
    env = os.environ.get("SARO_GRID_SCATTER", "")
    if env in ("pallas", "xla", "window"):
        return env
    # Default "window" is an ALIAS of "xla" (kept for config compat): the
    # .at[].add scatter transpose.  "pallas" is the sorted-window MXU
    # kernel (ops/grid_scatter.py) — opt-in because its Mosaic compile
    # crashed/wedged the remote TPU compile service twice on 2026-08-19;
    # scripts/grid_scatter_bench.py quantifies both on the real chip.
    return "window" if jax.default_backend() == "tpu" else "xla"


def _tap_cells_weights(u, v, w_l, h_l, base):
    """Absolute flat texel ids + bilinear weights of one level's 4 taps.
    ``w_l``/``h_l``/``base`` may be per-point arrays (heterogeneous mip
    levels).  cells[0] is each point's smallest id (sort key for the
    windowed scatter); clamped border taps duplicate ids and their
    weights simply add."""
    x = u * w_l - 0.5
    y = v * h_l - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = jnp.clip(x - x0, 0, 1)
    fy = jnp.clip(y - y0, 0, 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w_l - 1)
    x1i = jnp.minimum(x0i + 1, w_l - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h_l - 1)
    y1i = jnp.minimum(y0i + 1, h_l - 1)
    cells = jnp.stack([base + y0i * w_l + x0i, base + y0i * w_l + x1i,
                       base + y1i * w_l + x0i, base + y1i * w_l + x1i])
    one = jnp.ones_like(fx)
    wts = jnp.stack([(one - fx) * (one - fy), fx * (one - fy),
                     (one - fx) * fy, fx * fy])
    return cells, wts


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sample_mip(grid: jnp.ndarray, coords: jnp.ndarray, level: jnp.ndarray,
               max_level: int) -> jnp.ndarray:
    """Mip-biased trilinear sample.

    Args:
      grid: [C, H, W] base (learnable) plane.
      coords: [N, 2] in [0,1]; coords[:,0] indexes W, coords[:,1] indexes H.
      level: [N] fractional mip level (no gradient; stop-gradient applied).
      max_level: static cap (0 = plain bilinear, like the reference's time
        planes).
    Returns [N, C].

    Custom VJP: the grid gradient routes through the sorted-window MXU
    scatter (ops/grid_scatter.py) on TPU — XLA's serial scatter emitter was
    the top op of the training step — with the plain `.at[].add` transpose
    elsewhere.  ``coords``/``level`` receive ZERO gradients, matching the
    reference semantics where every field input is detached before
    sampling (saro_gaussian.py:780, scene/hexplane.py:49-56; our callers
    stop-gradient the same way, models/gaussians.py:165).
    """
    return _sample_mip_impl(grid, coords, level, max_level)


def _sample_mip_fwd(grid, coords, level, max_level):
    return _sample_mip_impl(grid, coords, level, max_level), \
        (grid, coords, level)


def _sample_mip_bwd(max_level, res, dfeat):
    from . import grid_scatter
    grid, coords, level = res
    c, h, w = grid.shape
    u, v = coords[:, 0], coords[:, 1]
    dfeat = dfeat.astype(jnp.float32)
    use_pallas = _scatter_backend() == "pallas" and grid.dtype == jnp.float32
    n_levels = max_mip_levels(h, w, max_level)
    zeros = (jnp.zeros_like(coords), jnp.zeros_like(level))

    if n_levels == 0:
        cells, wts = _tap_cells_weights(u, v, w, h, 0)
        d_flat = grid_scatter.scatter_taps(cells, wts, dfeat, h * w,
                                           use_pallas)
        return (d_flat.reshape(c, h, w).astype(grid.dtype),) + zeros

    level_c = jax.lax.stop_gradient(
        jnp.clip(level.astype(jnp.float32), 0.0, n_levels))
    l0 = jnp.clip(jnp.floor(level_c).astype(jnp.int32), 0, n_levels)
    l1 = jnp.clip(l0 + 1, 0, n_levels)
    frac = level_c - l0
    sizes = [(h >> l, w >> l) for l in range(n_levels + 1)]
    offs_np = np.cumsum([0] + [hl * wl for hl, wl in sizes])
    total = int(offs_np[-1])
    offs = jnp.asarray(offs_np[:-1], jnp.int32)

    def bracket(l, factor):
        w_l = jnp.right_shift(w, l)
        h_l = jnp.right_shift(h, l)
        cells, wts = _tap_cells_weights(u, v, w_l, h_l, offs[l])
        return grid_scatter.scatter_taps(cells, wts,
                                         dfeat * factor[:, None], total,
                                         use_pallas)

    d_flat = bracket(l0, 1.0 - frac) + bracket(l1, frac)   # [C, total]

    # transpose of flatten(build_pyramid): spread each level's cotangent
    # down through the 2x2 mean-pool chain (factor 1/4 per level)
    d = None
    for l in reversed(range(n_levels + 1)):
        hl, wl = sizes[l]
        seg = jax.lax.dynamic_slice_in_dim(
            d_flat, int(offs_np[l]), hl * wl, axis=1).reshape(c, hl, wl)
        if d is None:
            d = seg
        else:
            d = seg + 0.25 * jnp.repeat(jnp.repeat(d, 2, axis=1), 2,
                                        axis=2)
    return (d.astype(grid.dtype),) + zeros


sample_mip.defvjp(_sample_mip_fwd, _sample_mip_bwd)
