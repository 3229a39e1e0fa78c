"""Scale-aware residual field: mip-sampled HexPlane 4D feature grids.

Re-design of the reference's ``ScaleAwareResField`` (scene/hexplane.py:155)
as a functional JAX module: six coordinate-pair 2D planes per multires scale
over (x, y, z, t), zero-initialized, sampled with a per-Gaussian mip-level
bias proportional to spatial scale (Eq. 18 of the paper), summed over planes
and concatenated over scales.

Plane order follows itertools.combinations(range(4), 2):
  0:(x,y)  1:(x,z)  2:(x,t)  3:(y,z)  4:(y,t)  5:(z,t)
Each plane is stored [C, res[b], res[a]] for pair (a, b) — the second
coordinate indexes rows, like the reference's reversed reso layout
(hexplane.py:74-77).
"""
from __future__ import annotations

import itertools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import mip

COMBS: Tuple[Tuple[int, int], ...] = tuple(
    itertools.combinations(range(4), 2))
SPATIAL_MAX_MIP = 7      # hexplane.py:55 (planes without time)
TV_PLANES = (0, 1, 3)    # hexplane.py:311-318
# NOTE: preserved reference quirk — index set [1,4,5] includes the (x,z)
# spatial plane instead of (x,t) (hexplane.py:320-326).
TIMESMOOTH_PLANES = (1, 4, 5)


class FieldConfig(NamedTuple):
    resolution: Tuple[int, int, int, int] = (64, 64, 64, 25)
    out_dim: int = 32
    multires: Tuple[int, ...] = (1,)

    @property
    def feat_dim(self) -> int:
        return self.out_dim * len(self.multires)

    def reso(self, scale_mult: int) -> Tuple[int, int, int, int]:
        r = self.resolution
        return (r[0] * scale_mult, r[1] * scale_mult, r[2] * scale_mult,
                r[3])


def init_field(cfg: FieldConfig, dtype=jnp.float32):
    """Zero-initialized planes (hexplane.py:78-86 zero-inits all of them)."""
    grids = []
    for m in cfg.multires:
        reso = cfg.reso(m)
        planes = []
        for (a, b) in COMBS:
            planes.append(jnp.zeros((cfg.out_dim, reso[b], reso[a]), dtype))
        grids.append(planes)
    return grids


class FieldStatic(NamedTuple):
    """Scene-derived, non-learnable field inputs (aabb + duration)."""
    aabb_min: jnp.ndarray   # [3]
    aabb_max: jnp.ndarray   # [3]
    duration: jnp.ndarray   # scalar f32 (frame count)


def make_static(xyz_min, xyz_max, duration) -> FieldStatic:
    return FieldStatic(aabb_min=jnp.asarray(xyz_min, jnp.float32),
                       aabb_max=jnp.asarray(xyz_max, jnp.float32),
                       duration=jnp.asarray(duration, jnp.float32))


def get_levels(cfg: FieldConfig, static: FieldStatic,
               scales_lin: jnp.ndarray) -> jnp.ndarray:
    """Per-axis mip level for each Gaussian (hexplane.py:231-242).

    base cell size derives from the FIRST multires entry's resolution;
    level = log2(2 * clamp(s) / base_cell); the time axis is forced to 0.
    """
    reso0 = np.asarray(cfg.reso(cfg.multires[0])[:3], np.float32)
    base = (static.aabb_max - static.aabb_min) / reso0
    min_s = base / 2.0
    max_s = min_s * reso0
    s = jnp.clip(scales_lin, min_s, max_s)
    lvl = jnp.log2(2.0 * s / base)
    return jnp.concatenate(
        [lvl, jnp.zeros((lvl.shape[0], 1), lvl.dtype)], axis=-1)


def field_features(grids, cfg: FieldConfig, static: FieldStatic,
                   pts: jnp.ndarray, t: jnp.ndarray,
                   scales_lin: jnp.ndarray) -> jnp.ndarray:
    """Sample the field: pts [N,3], t [N,1] in [0,(d-1)/d], linear scales
    [N,3] -> features [N, feat_dim].

    The inputs are stop-gradiented by the CALLER when reproducing the
    reference semantics (saro_gaussian.py:780 detaches xyz/t/scales).
    """
    norm = (pts - static.aabb_min) / (static.aabb_max - static.aabb_min)
    tn = t * static.duration / (static.duration - 1.0)   # hexplane.py:23-24
    coords4 = jnp.concatenate([norm, tn.reshape(-1, 1)], axis=-1)
    levels4 = get_levels(cfg, static, scales_lin)

    outs = []
    for planes in grids:
        acc = None
        for ci, (a, b) in enumerate(COMBS):
            spatio_only = 3 not in (a, b)
            lvl = jnp.minimum(levels4[:, a], levels4[:, b])
            feat = mip.sample_mip(
                planes[ci], coords4[:, (a, b)], lvl,
                SPATIAL_MAX_MIP if spatio_only else 0)
            acc = feat if acc is None else acc + feat
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)


def convert_coarse_to_fine(cfg: FieldConfig, static: FieldStatic,
                           old_grids, old_static: FieldStatic):
    """Warm-start this field's planes from a coarser field.

    Reproduces ``ScaleAwareResField.convert_coarse_to_fine``
    (scene/hexplane.py:279-309): for every plane, build the target grid's
    sample coordinates, map them through the OLD field's aabb into its
    normalized frame, and nearest-sample (align_corners) the old plane.
    The time axis always spans the full old range.  Returns new grids
    shaped per ``init_field(cfg)``.
    """
    new_grids = []
    for mi_idx, m in enumerate(cfg.multires):
        reso = cfg.reso(m)
        planes = []
        for ci, (a, b) in enumerate(COMBS):
            old = old_grids[mi_idx][ci]          # [C, Ho, Wo]
            h, w = reso[b], reso[a]

            def axis_coords(axis, n):
                # new aabb endpoints in the old aabb's [0, 1] frame
                if axis == 3:
                    lo, hi = 0.0, 1.0
                else:
                    olo = old_static.aabb_min[axis]
                    ohi = old_static.aabb_max[axis]
                    lo = (static.aabb_min[axis] - olo) / (ohi - olo)
                    hi = (static.aabb_max[axis] - olo) / (ohi - olo)
                return lo + (hi - lo) * jnp.linspace(0.0, 1.0, n)

            xs = axis_coords(a, w)               # along width
            ys = axis_coords(b, h)               # along height
            ho, wo = old.shape[1], old.shape[2]
            # nearest, align_corners=True: u in [0,1] -> round(u*(n-1))
            ix = jnp.clip(jnp.round(xs * (wo - 1)), 0, wo - 1).astype(jnp.int32)
            iy = jnp.clip(jnp.round(ys * (ho - 1)), 0, ho - 1).astype(jnp.int32)
            planes.append(old[:, iy][:, :, ix])
        new_grids.append(planes)
    return new_grids


def plane_tv(grids) -> jnp.ndarray:
    """Total variation over the spatial planes (hexplane.py:147-153,311-318).
    """
    total = 0.0
    for planes in grids:
        for idx in TV_PLANES:
            t = planes[idx][None]       # [1, C, H, W]
            _, c, h, w = t.shape
            count_h = c * (h - 1) * w
            count_w = c * h * (w - 1)
            h_tv = jnp.square(t[..., 1:, :] - t[..., :h - 1, :]).sum()
            w_tv = jnp.square(t[..., :, 1:] - t[..., :, :w - 1]).sum()
            total = total + 2 * (h_tv / count_h + w_tv / count_w)
    return total


def time_smoothness(grids) -> jnp.ndarray:
    """Second-difference smoothness along rows (hexplane.py:139-145,320-326;
    the reference's plane index set is preserved verbatim)."""
    total = 0.0
    for planes in grids:
        for idx in TIMESMOOTH_PLANES:
            t = planes[idx][None]
            h = t.shape[2]
            first = t[..., 1:, :] - t[..., :h - 1, :]
            second = first[..., 1:, :] - first[..., :h - 2, :]
            total = total + jnp.square(second).mean()
    return total
