"""Per-Gaussian rasterization preprocess, pure JAX (vectorized over N).

TPU-native replacement for the reference's ``preprocessCUDA``
(forward.cu:155-256): frustum cull, projection, 3D->2D covariance, conic,
screen radius, tile-rect computation and SH->RGB, all as one fused batched
computation (XLA fuses the elementwise chain; no per-point kernel needed).

Internally everything is STRUCTURE-OF-ARRAYS: per-component 1-D [N] arrays.
[N, 3]-minor-dim tensors and batched 3x3 einsums compile to serialized TPU
loop fusions / MXU convolutions with strided slice extraction (profiled at
~16 ms/frame for 200k Gaussians, vs <1 ms for the flat elementwise chain).
``PreprocessOut`` exposes both the 1-D columns (fast consumers: staged
binning, Pallas path) and the stacked [N, k] views (oracle path, tests);
unused stacks are DCE'd inside jit.
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
    # --- structure-of-arrays columns (same data, 1-D views) ---------------
    mean_x: jnp.ndarray = None      # [N]
    mean_y: jnp.ndarray = None      # [N]
    conic_a: jnp.ndarray = None     # [N]
    conic_b: jnp.ndarray = None     # [N]
    conic_c: jnp.ndarray = None     # [N]
    rgb_r: jnp.ndarray = None       # [N]
    rgb_g: jnp.ndarray = None       # [N]
    rgb_b: jnp.ndarray = None       # [N]
    rmin_x: jnp.ndarray = None      # [N] int32
    rmin_y: jnp.ndarray = None      # [N] int32
    rmax_x: jnp.ndarray = None      # [N] int32
    rmax_y: jnp.ndarray = None      # [N] int32


def mark_visible(means3d: jnp.ndarray, cam: CameraParams) -> jnp.ndarray:
    """Frustum-visibility boolean per point (``markVisible``,
    rasterize_points.cu:196-215 / rasterizer_impl.cu:141-153): view-space
    z > 0.2."""
    p_view = math3d.transform_point_4x3(means3d, cam.viewmat)
    return p_view[..., 2] > 0.2


def get_rect_cols(p_x, p_y, radius, grid_x: int, grid_y: int,
                  tile_x: int, tile_y: int, radius_y=None):
    """Tile rectangle covered by a splat (auxiliary.h:46-56) on coordinate
    columns; optionally with distinct per-axis radii.  Returns
    (min_x, min_y, max_x, max_y) int32 columns.

    C truncation-toward-zero on possibly-negative operands is made irrelevant
    by the outer max(0, .) exactly as in the reference.
    """
    r = radius.astype(p_x.dtype)
    ry = r if radius_y is None else radius_y.astype(p_x.dtype)
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
    min_x = jnp.clip(jnp.floor((p_x - r) / tile_x), 0, grid_x).astype(
        jnp.int32)
    min_y = jnp.clip(jnp.floor((p_y - ry) / tile_y), 0, grid_y).astype(
        jnp.int32)
    max_x = jnp.clip(max_x, 0, grid_x).astype(jnp.int32)
    max_y = jnp.clip(max_y, 0, grid_y).astype(jnp.int32)
    return min_x, min_y, max_x, max_y


def get_rect(point_image: jnp.ndarray, radius: jnp.ndarray,
             grid_x: int, grid_y: int, tile_x: int, tile_y: int,
             radius_y: jnp.ndarray = None):
    """Stacked-[N,2] wrapper over ``get_rect_cols``."""
    min_x, min_y, max_x, max_y = get_rect_cols(
        point_image[..., 0], point_image[..., 1], radius, grid_x, grid_y,
        tile_x, tile_y, radius_y=radius_y)
    return (jnp.stack([min_x, min_y], -1), jnp.stack([max_x, max_y], -1))


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
    grid_x = (width + tile_x - 1) // tile_x
    grid_y = (height + tile_y - 1) // tile_y

    # one transpose per input tensor; every column read below is contiguous
    mt = means3d.astype(f32).T                      # [3, N]
    px, py, pz = mt[0], mt[1], mt[2]
    st = scales.astype(f32).T                       # [3, N]
    qt = quats.astype(f32).T                        # [4, N]

    vm = cam.viewmat
    depth = px * vm[0, 2] + py * vm[1, 2] + pz * vm[2, 2] + vm[3, 2]
    in_front = depth > math3d.NEAR_CULL_Z            # auxiliary.h:154 culls z<=0.2

    ndc_x, ndc_y, ndc_z = math3d.project_points_cols(px, py, pz, cam.projmat)

    cov6 = math3d.build_cov3d_cols(st[0], st[1], st[2], scale_modifier,
                                   qt[0], qt[1], qt[2], qt[3])
    focal_x = width / (2.0 * cam.tanfovx)
    focal_y = height / (2.0 * cam.tanfovy)
    a, b, c = math3d.compute_cov2d_cols(px, py, pz, focal_x, focal_y,
                                        cam.tanfovx, cam.tanfovy, cov6,
                                        cam.viewmat)
    det = a * c - b * b
    det_ok = det != 0.0
    det_inv = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conic_a = c * det_inv
    conic_b = -b * det_inv
    conic_c = a * det_inv

    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lam_max = jnp.maximum(mid + disc, mid - disc)
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0)))

    mean_x = math3d.ndc2pix(ndc_x, width)
    mean_y = math3d.ndc2pix(ndc_y, height)
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
        tmin_x, tmin_y, tmax_x, tmax_y = get_rect_cols(
            mean_x, mean_y, rx, grid_x, grid_y, tile_x, tile_y, radius_y=ry)
        # intersect with the reference rect: its `(p+r+B-1)/B` ceiling
        # under-covers boundary tiles for fractional centers (a reference
        # quirk, auxiliary.h:46-56) — staying a subset keeps outputs
        # bit-identical to the reference semantics
        rmin_x_, rmin_y_, rmax_x_, rmax_y_ = get_rect_cols(
            mean_x, mean_y, radius_f, grid_x, grid_y, tile_x, tile_y)
        rmin_x = jnp.maximum(tmin_x, rmin_x_)
        rmin_y = jnp.maximum(tmin_y, rmin_y_)
        rmax_x = jnp.maximum(jnp.minimum(tmax_x, rmax_x_), rmin_x)
        rmax_y = jnp.maximum(jnp.minimum(tmax_y, rmax_y_), rmin_y)
    else:
        rmin_x, rmin_y, rmax_x, rmax_y = get_rect_cols(
            mean_x, mean_y, radius_f, grid_x, grid_y, tile_x, tile_y)
    tiles = ((rmax_y - rmin_y) * (rmax_x - rmin_x)).astype(jnp.int32)

    # non-finite covariance/position culls like a frustum cull: an inf/NaN
    # cov2d (e.g. an exploded scale) must not poison binning — int casts of
    # NaN rects produce garbage tile ids (a NaN compares false everywhere,
    # so such a splat contributes nothing anyway)
    finite = (jnp.isfinite(a) & jnp.isfinite(b) & jnp.isfinite(c)
              & jnp.isfinite(mean_x) & jnp.isfinite(mean_y))
    mask = in_front & det_ok & finite & (tiles > 0)
    if active is not None:
        mask = mask & (active > 0)

    if colors_precomp is not None:
        cpt = colors_precomp.astype(f32).T
        rgb_cols = (cpt[0], cpt[1], cpt[2])
        false = jnp.zeros(px.shape, dtype=bool)
        clamp_cols = (false, false, false)
    else:
        assert shs is not None, "need shs or colors_precomp"
        rgb_cols, clamp_cols = sh.eval_sh_color_cols(
            sh_degree, shs.astype(f32), px, py, pz, cam.campos)

    # degenerate-payload cull: a splat whose COMPOSITED attributes (color,
    # opacity, depth) are non-finite poisons every pixel it touches — the
    # conic/position cull above cannot see it (e.g. the r4 arena
    # degenerates: collapsed scale + saturated opacity logits rendering
    # NaN SH colors on the views that saw them, wasting ~36% of late
    # steps on skip-guard trips).  The reference ASSERTS on the resulting
    # NaN grads (saro_gaussian.py:278-279); culling is the recoverable
    # choice — the point simply contributes nothing until its params heal.
    op_col = opacities.astype(f32).reshape(-1)
    mask = (mask & jnp.isfinite(depth) & jnp.isfinite(op_col)
            & jnp.isfinite(rgb_cols[0]) & jnp.isfinite(rgb_cols[1])
            & jnp.isfinite(rgb_cols[2]))

    radii = jnp.where(mask, radius_f, 0.0).astype(jnp.int32)
    tiles = jnp.where(mask, tiles, 0)
    return PreprocessOut(
        depth=depth, radii=radii,
        mean2d=jnp.stack([mean_x, mean_y], axis=-1),
        p_proj=jnp.stack([ndc_x, ndc_y, ndc_z], axis=-1),
        conic=jnp.stack([conic_a, conic_b, conic_c], axis=-1),
        rgb=jnp.stack(rgb_cols, axis=-1),
        clamped=jnp.stack(clamp_cols, axis=-1),
        rect_min=jnp.stack([rmin_x, rmin_y], axis=-1),
        rect_max=jnp.stack([rmax_x, rmax_y], axis=-1),
        tiles_touched=tiles, mask=mask,
        cov3d=jnp.stack(cov6, axis=-1),
        cov2d=jnp.stack([a, b, c], axis=-1),
        mean_x=mean_x, mean_y=mean_y,
        conic_a=conic_a, conic_b=conic_b, conic_c=conic_c,
        rgb_r=rgb_cols[0], rgb_g=rgb_cols[1], rgb_b=rgb_cols[2],
        rmin_x=rmin_x, rmin_y=rmin_y, rmax_x=rmax_x, rmax_y=rmax_y)
