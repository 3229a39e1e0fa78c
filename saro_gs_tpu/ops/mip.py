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
    """
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
