"""Point-cloud preprocessing (init-time, host-side NumPy/scipy).

Re-implements helper_model.py's one-shot preprocessing of the merged
per-frame clouds:
  * ``sparsify`` keeps, per timestamp, the most-isolated 1/N of points
    (nearest-neighbor distance ranking) — helper_model.interpolate_point
    :122-175 (frame 0 is kept in full),
  * ``prune_max_z`` drops points above a height — :273-285,
  * ``add_sky_points`` adds a spherical-cap shell of synthetic points
    (coffee-scene fix) — :286-314.
``preprocess_points`` dispatches on the reference's ``preprocesspoints``
mode integer (saro_gaussian.create_from_pcd:159-175).
"""
from __future__ import annotations

import numpy as np

from ..models.gaussians import PointCloud


def _nn_distance(points: np.ndarray) -> np.ndarray:
    """Distance to the nearest OTHER point, [N]."""
    from .. import native
    d = native.nn_distance(points)
    if d is not None:
        return d
    try:
        from scipy.spatial import cKDTree
        tree = cKDTree(points)
        d, _ = tree.query(points, k=2)
        return d[:, 1]
    except Exception:
        # fallback: blocked exact
        n = points.shape[0]
        out = np.empty(n)
        block = 1024
        for s in range(0, n, block):
            q = points[s:s + block]
            d2 = ((q[:, None, :] - points[None, :, :]) ** 2).sum(-1)
            idx = np.arange(s, min(s + block, n))
            d2[np.arange(len(idx)), idx] = np.inf
            out[s:s + block] = np.sqrt(d2.min(axis=1))
        return out


def sparsify(pcd: PointCloud, n: int = 4) -> PointCloud:
    """Keep the most isolated 1/n points per timestamp (frame 0 in full)."""
    save_rate = 1.0 / n
    times = pcd.times if pcd.times is not None else np.zeros(
        (pcd.points.shape[0], 1))
    # Group rows by timestamp once (O(N log N)) rather than scanning the
    # whole array per unique stamp — random-time inits (Blender) have ~N
    # unique stamps and the per-stamp scan is O(N^2).
    stamps, inverse = np.unique(times[:, 0], return_inverse=True)
    order = np.argsort(inverse, kind="stable")
    bounds = np.searchsorted(inverse[order], np.arange(stamps.shape[0] + 1))
    keep = np.zeros(times.shape[0], bool)
    for ti in range(stamps.shape[0]):
        idx = order[bounds[ti]:bounds[ti + 1]]
        if ti == 0:
            keep[idx] = True
            continue
        num_take = int(idx.shape[0] * save_rate)
        if num_take <= 0:
            continue
        d = _nn_distance(pcd.points[idx])
        thresh = np.sort(d)[-num_take]
        keep[idx[d > thresh]] = True
    return PointCloud(points=pcd.points[keep], colors=pcd.colors[keep],
                      times=times[keep])


def prune_max_z(pcd: PointCloud, maxz: float = 200.0) -> PointCloud:
    sel = pcd.points[:, 2] < maxz
    t = pcd.times[sel] if pcd.times is not None else None
    return PointCloud(points=pcd.points[sel], colors=pcd.colors[sel],
                      times=t)


def add_sky_points(pcd: PointCloud, extra: int = 5000, radius: float = 200,
                   min_radius: float = 63,
                   rng: np.random.RandomState | None = None) -> PointCloud:
    rng = rng or np.random.RandomState(666)
    r = rng.rand(extra) * radius + min_radius
    phi = rng.rand(extra) * np.pi / 2 + np.pi / 4
    sita = rng.rand(extra) * np.pi / 4
    x = r * np.sin(phi) * np.cos(sita)
    y = r * np.cos(phi)
    z = r * np.sin(phi) * np.sin(sita)
    xyz = np.stack([x, y, z], axis=1)
    rgb = np.full((extra, 3), 0.5)
    t = np.full((extra, 1), 0.5)
    times = pcd.times if pcd.times is not None else np.zeros(
        (pcd.points.shape[0], 1))
    return PointCloud(points=np.concatenate([pcd.points, xyz]),
                      colors=np.concatenate([pcd.colors, rgb]),
                      times=np.concatenate([times, t]))


def preprocess_points(pcd: PointCloud, mode: int) -> PointCloud:
    """Dispatch on the reference's ``preprocesspoints`` integer."""
    if mode == 0:
        return pcd
    if mode == 3:
        return prune_max_z(add_sky_points(sparsify(pcd, 40), 5000, 100, 0),
                           300)
    if mode == 31:
        return prune_max_z(sparsify(pcd, 40), 200)
    if mode == 4:
        return sparsify(pcd, 40)
    return sparsify(pcd, mode)
