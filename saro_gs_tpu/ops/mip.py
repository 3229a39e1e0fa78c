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

TPU notes: sampling is 4 gathers per level; levels are resolved with a
`switch`-free weighted gather over the two bracketing levels.
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp


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
    boundary, texel centers at half-integers. Returns [N, C]."""
    c, h, w = grid.shape
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    # also clamp the sample position itself (clamp boundary mode)
    fx = jnp.clip(jnp.where(x0 < 0, 0.0, jnp.where(x0 > w - 2, 1.0, fx)), 0, 1)
    fy = jnp.clip(jnp.where(y0 < 0, 0.0, jnp.where(y0 > h - 2, 1.0, fy)), 0, 1)

    g = grid  # [C, H, W]
    v00 = g[:, y0i, x0i]
    v01 = g[:, y0i, x1i]
    v10 = g[:, y1i, x0i]
    v11 = g[:, y1i, x1i]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    out = top * (1 - fy) + bot * fy
    return out.T  # [N, C]


def sample_mip(grid: jnp.ndarray, coords: jnp.ndarray, level: jnp.ndarray,
               max_level: int) -> jnp.ndarray:
    """Mip-biased trilinear sample.

    Args:
      grid: [C, H, W] base (learnable) plane.
      coords: [N, 2] in [0,1]; coords[:,0] indexes W, coords[:,1] indexes H.
      level: [N] fractional mip level (no gradient; stop-gradient applied).
      max_level: static cap (0 = plain bilinear).
    Returns [N, C].
    """
    u, v = coords[:, 0], coords[:, 1]
    c, h, w = grid.shape
    n_levels = max_mip_levels(h, w, max_level)
    if n_levels == 0:
        return _bilinear(grid, u, v)
    level = jax.lax.stop_gradient(jnp.clip(level, 0.0, n_levels))
    pyr = build_pyramid(grid, n_levels)
    l0 = jnp.floor(level).astype(jnp.int32)
    frac = level - l0
    l0 = jnp.clip(l0, 0, n_levels)
    l1 = jnp.clip(l0 + 1, 0, n_levels)
    samples = jnp.stack([_bilinear(p, u, v) for p in pyr], axis=0)  # [L,N,C]
    nidx = jnp.arange(c)[None, :]
    s0 = jnp.take_along_axis(
        samples, l0[:, None, None].repeat(1, 1), axis=0)
    # take_along_axis needs matching dims; use simple gather instead:
    s0 = samples[l0, jnp.arange(level.shape[0])]
    s1 = samples[l1, jnp.arange(level.shape[0])]
    return s0 * (1 - frac)[:, None] + s1 * frac[:, None]
