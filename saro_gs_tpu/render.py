"""Renderer glue: camera + model state -> rasterized images (L2 layer).

Mirrors renderer/__init__.py: ``train_render`` (:35-138) dispatches on the
stage (static uses canonical activations; dynamic runs the deformation) and
``test_render`` (:140-228) reuses cached field features and pre-filters
dying Gaussians — here expressed as an ``active`` mask (state > 0.001, the
reference's visibility pre-filter at saro_gaussian.py:878-881; skipped
Gaussians contribute alpha < 1/255 anyway so images are identical).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .models import gaussians as gm
from .models.field import FieldStatic
from .ops.projection import CameraParams
from .ops.rasterize import RasterConfig, RenderOutput, rasterize

EVAL_STATE_CUTOFF = 1e-3


class RenderPackage(NamedTuple):
    out: RenderOutput
    deform: Optional[gm.DeformOut]   # None in static stage


def train_render(cam: CameraParams, timestamp,
                 params: gm.GaussianParams, nets: gm.NetParams,
                 alive: jnp.ndarray, mcfg: gm.ModelConfig,
                 fstatic: FieldStatic, bg: jnp.ndarray, *,
                 width: int, height: int, stage: str, sh_degree: int,
                 rcfg: RasterConfig,
                 mean2d_dummy: Optional[jnp.ndarray] = None,
                 feat: Optional[jnp.ndarray] = None,
                 row0=None, sh_mask=None) -> RenderPackage:
    # sh_mask ([K, 1] float, traced): zero the coefficients above the
    # active ramp degree so ONE compiled graph (full-degree basis) serves
    # every ramp stage — identical colors AND gradients to the reference's
    # degree-truncated sum, since masked coefficients contribute nothing
    # and receive zero cotangents.
    def msk(shs):
        return shs if sh_mask is None else shs * sh_mask
    if stage == "dynamatic":
        d = gm.deform(params, nets, mcfg, fstatic, timestamp, feat=feat)
        out = rasterize(d.xyz, d.scaling, d.rotation, d.opacity.reshape(-1),
                        cam, bg, width=width, height=height,
                        sh_degree=sh_degree, config=rcfg, shs=msk(d.shs),
                        mean2d_dummy=mean2d_dummy, active=alive, row0=row0)
        return RenderPackage(out=out, deform=d)
    out = rasterize(params.xyz, gm.get_scaling(params),
                    gm.get_rotation(params),
                    gm.get_opacity(params).reshape(-1), cam, bg,
                    width=width, height=height, sh_degree=sh_degree,
                    config=rcfg, shs=msk(gm.get_features(params)),
                    mean2d_dummy=mean2d_dummy, active=alive, row0=row0)
    return RenderPackage(out=out, deform=None)


def test_render(cam: CameraParams, timestamp,
                params: gm.GaussianParams, nets: gm.NetParams,
                alive: jnp.ndarray, mcfg: gm.ModelConfig,
                fstatic: FieldStatic, bg: jnp.ndarray, *,
                width: int, height: int, sh_degree: int,
                rcfg: RasterConfig,
                feat: Optional[jnp.ndarray] = None,
                require_segment: bool = False):
    """Eval-path render with feature caching + survival filtering.

    ``feat`` is the cached field feature tensor (get_deformfeature,
    saro_gaussian.py:863-869) — compute once per checkpoint, reuse across
    frames.  Returns (RenderOutput, segment RenderOutput | None).
    """
    d = gm.deform(params, nets, mcfg, fstatic, timestamp, feat=feat)
    active = alive * (d.state[:, 0] > EVAL_STATE_CUTOFF)
    # eval renders are forward-only: skip the n_contrib bookkeeping in the
    # pallas compositor (backward replay bound; need_aux=False)
    rcfg = rcfg._replace(need_aux=False)
    out = rasterize(d.xyz, d.scaling, d.rotation, d.opacity.reshape(-1),
                    cam, bg, width=width, height=height,
                    sh_degree=sh_degree, config=rcfg, shs=d.shs,
                    active=active)
    seg = None
    if require_segment:
        # dynamic/static segmentation: render lifespan as color
        # (renderer/__init__.py:212-226)
        lifespan_rgb = jax.lax.stop_gradient(
            jnp.broadcast_to(d.lifespan, (d.lifespan.shape[0], 3)))
        seg = rasterize(d.xyz, d.scaling, d.rotation,
                        d.opacity.reshape(-1), cam, bg, width=width,
                        height=height, sh_degree=sh_degree, config=rcfg,
                        colors_precomp=lifespan_rgb, active=active)
    return out, seg
