"""Per-Gaussian rasterization preprocess, pure JAX (vectorized over N).

TPU-native replacement for the reference's ``preprocessCUDA``
(forward.cu:155-256): frustum cull, projection, 3D->2D covariance, conic,
screen radius, tile-rect computation and SH->RGB, all as one fused batched
computation (XLA fuses the elementwise chain; no per-point kernel needed).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from . import math3d, sh


class CameraParams(NamedTuple):
    """Per-view parameters (a pytree; width/height stay static args)."""
    viewmat: jnp.ndarray    # [4,4] row-vector world->view
    projmat: jnp.ndarray    # [4,4] row-vector world->NDC (full view-proj)
    campos: jnp.ndarray     # [3]
    tanfovx: jnp.ndarray    # scalar
    tanfovy: jnp.ndarray    # scalar


class PreprocessOut(NamedTuple):
    depth: jnp.ndarray        # [N] view-space z
    radii: jnp.ndarray        # [N] int32, 0 for culled
    mean2d: jnp.ndarray       # [N,2] pixel coords
    p_proj: jnp.ndarray       # [N,3] NDC
    conic: jnp.ndarray        # [N,3] inverse 2D covariance (a,b,c)
    rgb: jnp.ndarray          # [N,3]
    clamped: jnp.ndarray      # [N,3] bool, SH color clamp mask
    rect_min: jnp.ndarray     # [N,2] int32 tile coords (x,y)
    rect_max: jnp.ndarray     # [N,2] int32 exclusive
    tiles_touched: jnp.ndarray  # [N] int32
    mask: jnp.ndarray         # [N] bool: survives culling
    cov3d: jnp.ndarray        # [N,6]
    cov2d: jnp.ndarray        # [N,3]


def mark_visible(means3d: jnp.ndarray, cam: CameraParams) -> jnp.ndarray:
    """Frustum-visibility boolean per point (``markVisible``,
    rasterize_points.cu:196-215 / rasterizer_impl.cu:141-153): view-space
    z > 0.2."""
    p_view = math3d.transform_point_4x3(means3d, cam.viewmat)
    return p_view[..., 2] > 0.2


def get_rect(point_image: jnp.ndarray, radius: jnp.ndarray,
             grid_x: int, grid_y: int, tile_x: int, tile_y: int,
             radius_y: jnp.ndarray = None):
    """Tile rectangle covered by a splat (auxiliary.h:46-56), optionally
    with distinct per-axis radii.

    C truncation-toward-zero on possibly-negative operands is made irrelevant
    by the outer max(0, .) exactly as in the reference.
    """
    p_x, p_y = point_image[..., 0], point_image[..., 1]
    r = radius.astype(point_image.dtype)
    ry = r if radius_y is None else radius_y.astype(point_image.dtype)
    if radius_y is None:
        # reference formula verbatim; its `(p+r+B-1)/B` ceiling assumes
        # enough slack in r (3-sigma vs the 3.33-sigma cutoff) and can
        # exclude a boundary tile for fractional p
        max_x = jnp.floor((p_x + r + tile_x - 1) / tile_x)
        max_y = jnp.floor((p_y + ry + tile_y - 1) / tile_y)
    else:
        # exact coverage: the last tile containing a pixel <= p + r
        max_x = jnp.floor((p_x + r) / tile_x) + 1
        max_y = jnp.floor((p_y + ry) / tile_y) + 1
    rect_min_x = jnp.clip(jnp.floor((p_x - r) / tile_x), 0, grid_x).astype(jnp.int32)
    rect_min_y = jnp.clip(jnp.floor((p_y - ry) / tile_y), 0, grid_y).astype(jnp.int32)
    rect_max_x = jnp.clip(max_x, 0, grid_x).astype(jnp.int32)
    rect_max_y = jnp.clip(max_y, 0, grid_y).astype(jnp.int32)
    return (jnp.stack([rect_min_x, rect_min_y], -1),
            jnp.stack([rect_max_x, rect_max_y], -1))


def preprocess(means3d: jnp.ndarray,
               scales: jnp.ndarray,
               quats: jnp.ndarray,
               opacities: jnp.ndarray,
               cam: CameraParams,
               width: int,
               height: int,
               tile_x: int,
               tile_y: int,
               sh_degree: int = 0,
               shs: Optional[jnp.ndarray] = None,
               colors_precomp: Optional[jnp.ndarray] = None,
               scale_modifier: float = 1.0,
               active: Optional[jnp.ndarray] = None,
               tight_rect: bool = False) -> PreprocessOut:
    """Vectorized preprocess of N Gaussians for one camera.

    ``active`` masks out dead capacity-padding slots (treated as culled).
    """
    f32 = means3d.dtype  # compute dtype follows the input (f32 prod, f64 tests)
    means3d = means3d.astype(f32)
    grid_x = (width + tile_x - 1) // tile_x
    grid_y = (height + tile_y - 1) // tile_y

    p_view = math3d.transform_point_4x3(means3d, cam.viewmat)
    depth = p_view[..., 2]
    in_front = depth > math3d.NEAR_CULL_Z            # auxiliary.h:154 culls z<=0.2

    p_proj = math3d.project_points(means3d, cam.projmat)

    cov3d = math3d.build_cov3d(scales.astype(f32), scale_modifier,
                               quats.astype(f32))
    focal_x = width / (2.0 * cam.tanfovx)
    focal_y = height / (2.0 * cam.tanfovy)
    cov2d = math3d.compute_cov2d(means3d, focal_x, focal_y, cam.tanfovx,
                                 cam.tanfovy, cov3d, cam.viewmat)
    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = a * c - b * b
    det_ok = det != 0.0
    det_inv = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conic = jnp.stack([c * det_inv, -b * det_inv, a * det_inv], axis=-1)

    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lam_max = jnp.maximum(mid + disc, mid - disc)
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0)))

    mean2d = jnp.stack([math3d.ndc2pix(p_proj[..., 0], width),
                        math3d.ndc2pix(p_proj[..., 1], height)], axis=-1)
    if tight_rect:
        # exact per-axis extents of the alpha >= 1/255 level set (the
        # compositor's cutoff): |x| <= sqrt(2 ln(255 o) * Sigma_xx).
        # Intersected with the reference's 3-sigma circle, so the covered
        # tile set is a subset of the reference's with identical rendered
        # output — pixels outside the level set contribute exactly zero
        # (forward.cu:341 drops alpha < 1/255).  This is the dominant
        # instance-count (and therefore sort/scan capacity) reducer.
        s = 2.0 * jnp.log(jnp.maximum(opacities.reshape(-1), 1e-30) * 255.0)
        s = jnp.maximum(s, 0.0)
        rx = jnp.minimum(radius_f, jnp.ceil(
            jnp.sqrt(s * jnp.maximum(a, 0.0))))
        ry = jnp.minimum(radius_f, jnp.ceil(
            jnp.sqrt(s * jnp.maximum(c, 0.0))))
        tmin, tmax = get_rect(mean2d, rx, grid_x, grid_y,
                              tile_x, tile_y, radius_y=ry)
        # intersect with the reference rect: its `(p+r+B-1)/B` ceiling
        # under-covers boundary tiles for fractional centers (a reference
        # quirk, auxiliary.h:46-56) — staying a subset keeps outputs
        # bit-identical to the reference semantics
        rmin, rmax = get_rect(mean2d, radius_f, grid_x, grid_y,
                              tile_x, tile_y)
        rect_min = jnp.maximum(tmin, rmin)
        rect_max = jnp.maximum(jnp.minimum(tmax, rmax), rect_min)
    else:
        rect_min, rect_max = get_rect(mean2d, radius_f, grid_x, grid_y,
                                      tile_x, tile_y)
    tiles = ((rect_max[..., 1] - rect_min[..., 1]) *
             (rect_max[..., 0] - rect_min[..., 0])).astype(jnp.int32)

    mask = in_front & det_ok & (tiles > 0)
    if active is not None:
        mask = mask & (active > 0)

    if colors_precomp is not None:
        rgb = colors_precomp.astype(f32)
        clamped = jnp.zeros(rgb.shape, dtype=bool)
    else:
        assert shs is not None, "need shs or colors_precomp"
        rgb, clamped = sh.eval_sh_color(sh_degree, shs.astype(f32), means3d,
                                        cam.campos)

    radii = jnp.where(mask, radius_f, 0.0).astype(jnp.int32)
    tiles = jnp.where(mask, tiles, 0)
    return PreprocessOut(depth=depth, radii=radii, mean2d=mean2d,
                         p_proj=p_proj, conic=conic, rgb=rgb, clamped=clamped,
                         rect_min=rect_min, rect_max=rect_max,
                         tiles_touched=tiles, mask=mask, cov3d=cov3d,
                         cov2d=cov2d)
