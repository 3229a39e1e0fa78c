"""K-nearest-neighbor distances, pure JAX (init-time only).

Replaces the reference's CUDA ``simple_knn._C.distCUDA2`` (mean squared
distance to the 3 nearest neighbors, used once to initialize log-scales,
saro_gaussian.py:187-189) and the mmcv 2-NN used in point-cloud
sparsification (helper_model.py:150-166).

Exact blocked O(N^2) — fine for one-shot initialization at <=300k points on
TPU; data-prep paths may also use scipy on host (see data/pointcloud.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def knn_sq_dists(points: jnp.ndarray, k: int, block: int = 256,
                 valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Squared distances [N, k] to each point's k nearest OTHER points.

    ``valid`` optionally masks padding rows (excluded as neighbors; their own
    outputs are garbage).
    """
    n = points.shape[0]
    pad = (-n) % block
    pts = jnp.pad(points.astype(jnp.float32), ((0, pad), (0, 0)))
    vmask = jnp.ones((n,), bool) if valid is None else valid
    vmask = jnp.pad(vmask, (0, pad))
    npad = pts.shape[0]

    def one_block(start):
        q = jax.lax.dynamic_slice(pts, (start, 0), (block, 3))
        d2 = jnp.sum((q[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
        rows = start + jnp.arange(block)
        self_or_pad = (jnp.arange(npad)[None, :] == rows[:, None]) | \
            ~vmask[None, :]
        d2 = jnp.where(self_or_pad, jnp.inf, d2)
        neg_top, _ = jax.lax.top_k(-d2, k)
        return -neg_top

    starts = jnp.arange(0, npad, block)
    out = jax.lax.map(one_block, starts)
    return out.reshape(npad, k)[:n]


def mean_sq_dist_to_3nn(points: jnp.ndarray,
                        valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """distCUDA2 equivalent: mean of squared distances to 3 nearest
    neighbors, [N]."""
    d2 = knn_sq_dists(points, 3, valid=valid)
    d2 = jnp.where(jnp.isfinite(d2), d2, 0.0)
    return d2.mean(axis=-1)
