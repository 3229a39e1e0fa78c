"""SPMD scaling over a jax.sharding.Mesh (the reference is single-GPU).

Two parallel axes, per SURVEY.md §2.3:
  * ``data``   — views of the training batch, one (or more) per device;
    gradients/stats are psum-merged — exactly the reference's sequential
    batch-gradient accumulation, executed concurrently,
  * ``tile``   — strips of tile rows of every render; tiles are
    independent so per-device compositing is exact; per-Gaussian gradients
    are partial sums over the device's pixels -> psum over ``tile``
    (the SP/CP analogue; reference backward hot loop backward.cu:399-557).

The axes compose: a (data, tile) mesh runs each data-shard's view batch
with every render strip-sharded over ``tile``.  The full rasterizer
(SH, depth, custom VJP, pallas or jax backend) participates via
``RasterConfig.strip_rows`` + the traced ``row0`` input (ops/rasterize.py).
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

from ..ops.rasterize import RasterConfig, rasterize
from ..train import step as step_mod


def make_mesh(n_data: int = 1, n_tile: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    need = n_data * n_tile
    assert len(devices) >= need, (len(devices), need)
    arr = np.array(devices[:need]).reshape(n_data, n_tile)
    return Mesh(arr, axis_names=("data", "tile"))


# ---------------------------------------------------------------------------
# data x tile parallel training step
# ---------------------------------------------------------------------------

def dp_train_step(state, cams, gt, timestamps, bg, fstatic,
                  st: step_mod.StepStatics, *, stage: str, sh_degree: int,
                  scale_integral: bool, n_data: int, n_tile: int = 1,
                  sh_mask=None):
    """Training step over a (data, tile) mesh.

    The view batch is sharded over ``data`` (the reference's batch mean,
    saro_gaussian.set_batch_gradient:266-281, as a pmean); each view's
    render is strip-sharded over ``tile`` with per-Gaussian cotangents
    psum'd.  Model state is replicated; all devices compute an identical
    update.
    """
    mesh = make_mesh(n_data, n_tile)
    batch_spec = P("data")
    rep = P()

    if sh_mask is None:
        # all-ones over the ALLOCATED coefficients (dc + rest), not the
        # active degree — the mask multiplies the full shs tensor
        k_alloc = 1 + state.points.features_rest.shape[1]
        sh_mask = jnp.ones((k_alloc, 1), jnp.float32)
    # scale_integral may be traced (the flag flips mid-run without a
    # recompile) — pass it as an explicit replicated operand, shard_map
    # must not close over tracers
    scale_flag = jnp.asarray(scale_integral)

    def inner(state, cams, gt, timestamps, bg_, fstatic_, sh_mask_,
              scale_):
        return step_mod.train_step_core(
            state, cams, gt, timestamps, bg_, fstatic_, st, stage=stage,
            sh_degree=sh_degree, scale_integral=scale_,
            sh_mask=sh_mask_,
            axis_name="data" if n_data > 1 else None,
            axis_tile="tile" if n_tile > 1 else None, n_tile=n_tile)

    fn = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(rep, batch_spec, batch_spec, batch_spec, rep, rep, rep,
                  rep),
        out_specs=(rep, rep), check_vma=False)
    return fn(state, cams, gt, timestamps, bg, fstatic, sh_mask,
              scale_flag)


# ---------------------------------------------------------------------------
# tile-parallel rendering (single big frame across devices)
# ---------------------------------------------------------------------------

def tile_sharded_render(means3d, scales, quats, opacities, rgb_precomp,
                        cam, bg, *, width: int, height: int,
                        tile_x: int = 16, tile_y: int = 16,
                        chunk: int = 64, max_instances: int = 1 << 18,
                        max_slots: int = 1024, n_tile: int = 2,
                        mesh: Optional[Mesh] = None,
                        backend: str = "jax",
                        shs=None, sh_degree: int = 0,
                        config: Optional[RasterConfig] = None):
    """Forward render with the tile-row grid strip-sharded over ``tile``.

    Runs the FULL rasterizer per strip (any backend, SH or precomputed
    colors, depth/median semantics intact); Gaussians are replicated
    (preprocess is cheap), each device bins + composites its strip, and
    the strips reassemble via the out_spec.  Any image height works — the
    tile grid is padded to a multiple of ``n_tile`` strips and cropped.
    """
    if mesh is None:
        mesh = make_mesh(1, n_tile)
    if config is None:
        config = RasterConfig(tile_x=tile_x, tile_y=tile_y, chunk=chunk,
                              max_instances=max_instances,
                              max_slots=max_slots, backend=backend)
    grid_y = (height + config.tile_y - 1) // config.tile_y
    rows_local = (grid_y + n_tile - 1) // n_tile
    cfg = config._replace(strip_rows=rows_local)
    use_shs = shs is not None
    color_arg = shs if use_shs else rgb_precomp

    def strip(means3d, scales, quats, opacities, color_arg, cam, bg):
        row0 = jax.lax.axis_index("tile") * rows_local
        out = rasterize(
            means3d, scales, quats, opacities, cam, bg,
            width=width, height=height, sh_degree=sh_degree, config=cfg,
            shs=color_arg if use_shs else None,
            colors_precomp=None if use_shs else color_arg, row0=row0)
        return out.color  # [3, rows_local*tile_y, W]

    fn = jax.shard_map(
        strip, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(None, "tile", None), check_vma=False)
    img = fn(means3d, scales, quats, opacities, color_arg, cam, bg)
    return img[:, :height, :]
