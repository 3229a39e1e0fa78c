"""SPMD scaling over a jax.sharding.Mesh (the reference is single-GPU).

Two parallel axes, per SURVEY.md §2.3:
  * ``data``   — views of the training batch, one (or more) per device;
    gradients/stats are psum-merged — exactly the reference's sequential
    batch-gradient accumulation, executed concurrently,
  * ``tile``   — rows of the tile grid of a single large render; tiles are
    independent so per-device compositing is exact, per-Gaussian gradients
    are partial sums over the device's pixels -> psum.

Everything lowers to XLA collectives over ICI/DCN via ``shard_map``; there
is no custom communication layer.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import binning, compositing, projection
from ..train import step as step_mod


def make_mesh(n_data: int = 1, n_tile: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    need = n_data * n_tile
    assert len(devices) >= need, (len(devices), need)
    arr = np.array(devices[:need]).reshape(n_data, n_tile)
    return Mesh(arr, axis_names=("data", "tile"))


# ---------------------------------------------------------------------------
# data-parallel training step
# ---------------------------------------------------------------------------

def dp_train_step(state, cams, gt, timestamps, bg, fstatic,
                  st: step_mod.StepStatics, *, stage: str, sh_degree: int,
                  scale_integral: bool, n_data: int):
    """Training step with the view batch sharded over the ``data`` axis.

    The model state is replicated; each device runs its local views through
    ``train_step_core`` with psum-merged gradients, so all devices compute
    an identical update (like the reference's batch mean,
    saro_gaussian.set_batch_gradient:266-281).
    """
    mesh = make_mesh(n_data, 1)
    batch_spec = P("data")
    rep = P()

    def inner(state, cams, gt, timestamps, bg_, fstatic_):
        return step_mod.train_step_core(
            state, cams, gt, timestamps, bg_, fstatic_, st, stage=stage,
            sh_degree=sh_degree, scale_integral=scale_integral,
            axis_name="data")

    fn = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(rep, batch_spec, batch_spec, batch_spec, rep, rep),
        out_specs=(rep, rep), check_vma=False)
    return fn(state, cams, gt, timestamps, bg, fstatic)


# ---------------------------------------------------------------------------
# tile-parallel rendering (single big frame across devices)
# ---------------------------------------------------------------------------

def tile_sharded_render(means3d, scales, quats, opacities, rgb_precomp,
                        cam, bg, *, width: int, height: int,
                        tile_x: int = 16, tile_y: int = 16,
                        chunk: int = 64, max_instances: int = 1 << 18,
                        max_slots: int = 1024, n_tile: int = 2,
                        mesh: Optional[Mesh] = None):
    """Forward render with the tile-row grid sharded over ``tile``.

    Gaussians are replicated (preprocess is cheap); each device bins and
    composites its strip of tile rows; the strips are reassembled by the
    out_spec.  Exact: tiles are independent in the forward.
    """
    if mesh is None:
        mesh = make_mesh(1, n_tile)
    grid_x = (width + tile_x - 1) // tile_x
    grid_y = (height + tile_y - 1) // tile_y
    assert grid_y % n_tile == 0, (grid_y, n_tile)
    rows_local = grid_y // n_tile
    h_pad = grid_y * tile_y
    rep = P()

    def strip(idx_arr, means3d, scales, quats, opacities, rgb_precomp,
              cam, bg):
        row0 = idx_arr[0]
        pre = projection.preprocess(
            means3d, scales, quats, opacities, cam, width, height,
            tile_x, tile_y, colors_precomp=rgb_precomp)
        # clip each splat's tile rect to this device's rows and rebase
        rm = pre.rect_min.at[:, 1].set(
            jnp.clip(pre.rect_min[:, 1] - row0, 0, rows_local))
        rx = pre.rect_max.at[:, 1].set(
            jnp.clip(pre.rect_max[:, 1] - row0, 0, rows_local))
        tiles = ((rx[:, 1] - rm[:, 1]) * (rx[:, 0] - rm[:, 0])).astype(
            jnp.int32)
        mask = pre.mask & (tiles > 0)
        tiles = jnp.where(mask, tiles, 0)
        pre_local = pre._replace(rect_min=rm, rect_max=rx,
                                 tiles_touched=tiles, mask=mask)
        bins = binning.bin_gaussians(pre_local, grid_x, rows_local,
                                     max_instances, chunk)
        fwd = compositing.forward_tiles(
            bins.point_list, bins.tile_start, bins.tile_count,
            pre.mean2d - jnp.array([0.0, row0 * tile_y]),  # strip-local px
            pre.conic, opacities.reshape(-1), pre.rgb, pre.depth, bg,
            width, rows_local * tile_y, tile_x, tile_y, max_slots)
        return fwd.color  # [3, rows_local*tile_y, width]

    device_rows = jnp.arange(n_tile, dtype=jnp.int32) * rows_local

    fn = jax.shard_map(
        strip, mesh=mesh,
        in_specs=(P("tile"), P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(None, "tile", None), check_vma=False)
    img = fn(device_rows, means3d, scales, quats, opacities, rgb_precomp,
             cam, bg)
    return img[:, :height, :]
