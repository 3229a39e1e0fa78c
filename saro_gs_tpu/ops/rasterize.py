"""Differentiable tile-based Gaussian rasterizer — public API.

TPU-native re-design of the reference CUDA rasterizer
(submodules/gaussian_rasterization_ch3): the full pipeline
(preprocess -> binning -> per-tile compositing) under one ``jax.custom_vjp``
with the exact forward/backward numerics of forward.cu / backward.cu,
including their documented quirks:

  * w-epsilon 1e-7 in the homogeneous divide,
  * +0.3 low-pass on cov2d diagonal, 1.3*tanfov view clamp (with gradient
    masking via the clip VJP),
  * radius = ceil(3*sqrt(max λ)) with the 0.1 floor inside the sqrt,
  * alpha clamp 0.99 (NOT gated in backward), 1/255 alpha cutoff,
    T < 1e-4 termination latch, median depth with 15.0 default,
  * un-normalized quaternion covariance and pass-through quaternion grads,
  * depth output has no backward,
  * the ``mean2d_dummy`` input receives the NDC-space screen gradients used
    for densification, like the reference's retained-grad screenspace points.

Backward determinism: per-instance gradients from the tile compositor are
``segment_sum``-reduced per Gaussian (no atomics).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import binning, compositing, math3d, projection, sh
from .projection import CameraParams


class RasterConfig(NamedTuple):
    """Static rasterizer configuration (hashable; part of the jit key)."""
    tile_x: int = 16
    tile_y: int = 16
    chunk: int = 64            # alignment of per-tile instance ranges
    max_instances: int = 1 << 18
    max_slots: int = 1024      # per-tile instance cap for the pure-JAX path
    backend: str = "jax"       # "jax" | "pallas"
    # exact opacity-aware per-axis tile rects (subset of the reference's
    # 3-sigma circle; rendered output identical, far fewer instances).
    # False reproduces the reference's instance sets exactly (n_contrib
    # slot indices included) for oracle parity.
    tight_rect: bool = True
    # in-chunk prefix scans inside the pallas kernels: "roll" = log-depth
    # VPU doubling (exact), "matmul" = one [K,K] MXU matmul (prefix product
    # via exp∘sum∘log, rel err ~1e-5)
    prefix: str = "roll"
    # pack (conic_a,conic_b), (conic_c,opacity), (r,g) as bf16 pairs in the
    # binning sort payloads (pallas path only): ~25% fewer sort bytes; the
    # depth KEY stays f32 so composite order is exact, but those six attr
    # values quantize (rel err ~2^-9 — visually lossless, not bit-exact)
    packed: bool = False
    # instance expansion: "sort" = merge-spread (stable sort + segmented
    # ffill over N+MI rows), "pallas" = windowed one-hot-matmul spread
    # kernel (bit-identical, ~4x cheaper, final sort over MI rows only)
    expander: str = "sort"
    # strip mode (tile-axis sharding, parallel/shard.py): render only
    # ``strip_rows`` tile rows starting at the traced global tile row
    # ``row0`` passed to ``rasterize``; outputs are [strip_rows*tile_y]
    # tall, pixel coordinates and NDC gradient scaling stay full-frame
    strip_rows: int = 0
    # False skips n_contrib (the backward replay bound) in the pallas
    # forward — eval-only renders save its rank/max bookkeeping; taking
    # gradients with need_aux=False raises at trace time
    need_aux: bool = True
    # evaluate the splat quadratic as one [K,6]@[6,P] MXU contraction in
    # tile-local coordinates instead of ~8 [K,P] VPU passes (pallas path);
    # f32-accurate (HIGHEST), but inclusion thresholds can tie-flip vs the
    # exact dx/dy form — False is the oracle-exact arithmetic
    alpha_matmul: bool = False
    # serve a grid step whose tps tiles ALL fit one aligned [chunk]-row
    # window with a single group-segmented chunk pipeline (~50% of steps
    # at bench scale), incl. a constant-write shortcut for all-empty
    # steps.  Bit-identical to the per-tile path (tile_kernels._packed_step);
    # only active with prefix="matmul" and alpha_matmul=False
    pack_small: bool = True


class RenderOutput(NamedTuple):
    color: jnp.ndarray       # [3, H, W]
    depth: jnp.ndarray       # [H, W]
    radii: jnp.ndarray       # [N] int32
    final_t: jnp.ndarray     # [H, W]
    n_contrib: jnp.ndarray   # [H, W] int32
    num_dropped: jnp.ndarray  # [] int32 — instances beyond capacity
    num_instances: jnp.ndarray  # [] int32 — instances actually emitted


def _clip_to_strip(pre, row0i, rows_local: int):
    """Restrict a full-frame preprocess to tile rows [row0, row0+rows_local)
    and rebase the rect rows to strip-local coordinates."""
    rmin_y = jnp.clip(pre.rmin_y - row0i, 0, rows_local)
    rmax_y = jnp.clip(pre.rmax_y - row0i, 0, rows_local)
    tiles = ((rmax_y - rmin_y) * (pre.rmax_x - pre.rmin_x)).astype(jnp.int32)
    mask = pre.mask & (tiles > 0)
    tiles = jnp.where(mask, tiles, 0)
    return pre._replace(
        rmin_y=rmin_y, rmax_y=rmax_y,
        rect_min=jnp.stack([pre.rmin_x, rmin_y], -1),
        rect_max=jnp.stack([pre.rmax_x, rmax_y], -1),
        tiles_touched=tiles, mask=mask)


def _forward(statics, means3d, scales, quats, opacities, shs, colors_precomp,
             cam, bg, active, row0):
    width, height, sh_degree, cfg = statics
    pre = projection.preprocess(
        means3d, scales, quats, opacities, cam, width, height,
        cfg.tile_x, cfg.tile_y, sh_degree=sh_degree, shs=shs,
        colors_precomp=colors_precomp, active=active,
        tight_rect=cfg.tight_rect)
    grid_x = (width + cfg.tile_x - 1) // cfg.tile_x
    strip = cfg.strip_rows > 0
    if strip:
        row0i = (jnp.zeros((), jnp.int32) if row0 is None
                 else row0.astype(jnp.int32))
        pre = _clip_to_strip(pre, row0i, cfg.strip_rows)
        grid_y = cfg.strip_rows
    else:
        row0i = jnp.zeros((), jnp.int32)
        grid_y = (height + cfg.tile_y - 1) // cfg.tile_y
    opac = opacities.reshape(-1)
    if cfg.backend == "pallas":
        from . import tile_kernels
        bins = binning.bin_gaussians_staged(
            pre, opac, grid_x, grid_y, cfg.max_instances, cfg.chunk,
            tile_x=cfg.tile_x, tile_y=cfg.tile_y,
            corner_cull=cfg.tight_rect, packed=cfg.packed,
            expander=cfg.expander, y0_tiles=row0i)
        fwd = tile_kernels.forward_tiles_pallas(
            bins, bg, width, height, cfg.tile_x, cfg.tile_y, cfg.chunk,
            prefix=cfg.prefix, grid_y_local=cfg.strip_rows,
            y0_tiles=row0i, need_aux=cfg.need_aux,
            alpha_matmul=cfg.alpha_matmul, pack_small=cfg.pack_small)
    else:
        bins = binning.bin_gaussians(pre, grid_x, grid_y, cfg.max_instances,
                                     cfg.chunk)
        fwd = compositing.forward_tiles(
            bins.point_list, bins.tile_start, bins.tile_count,
            pre.mean2d, pre.conic, opac, pre.rgb, pre.depth,
            bg, width, height, cfg.tile_x, cfg.tile_y, cfg.max_slots,
            grid_y_local=cfg.strip_rows, y0_px=row0i * cfg.tile_y)
    return pre, bins, fwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _rasterize(statics, means3d, scales, quats, opacities, shs,
               colors_precomp, mean2d_dummy, cam, bg, active, row0):
    del mean2d_dummy
    pre, bins, fwd = _forward(statics, means3d, scales, quats, opacities,
                              shs, colors_precomp, cam, bg, active, row0)
    return RenderOutput(color=fwd.color, depth=fwd.depth, radii=pre.radii,
                        final_t=fwd.final_t, n_contrib=fwd.n_contrib,
                        num_dropped=bins.num_dropped,
                        num_instances=bins.num_instances)


def _rasterize_fwd(statics, means3d, scales, quats, opacities, shs,
                   colors_precomp, mean2d_dummy, cam, bg, active, row0):
    pre, bins, fwd = _forward(statics, means3d, scales, quats, opacities,
                              shs, colors_precomp, cam, bg, active, row0)
    out = RenderOutput(color=fwd.color, depth=fwd.depth, radii=pre.radii,
                       final_t=fwd.final_t, n_contrib=fwd.n_contrib,
                       num_dropped=bins.num_dropped,
                       num_instances=bins.num_instances)
    res = (means3d, scales, quats, opacities, shs, colors_precomp, cam, bg,
           active, row0, pre, bins, fwd)
    return out, res


def _conic_to_cov2d_grads(cov2d, d_conic):
    """Chain dL/dconic -> dL/dcov2d with the reference's eps'd denominator
    (backward.cu:201-212; our d_conic carries TRUE b-gradients so the
    reference's compensating 2x factors become the exact coefficients)."""
    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    ga, gb, gc = d_conic[..., 0], d_conic[..., 1], d_conic[..., 2]
    denom = a * c - b * b
    denom2inv = 1.0 / (denom * denom + 1e-7)
    d_a = denom2inv * (-c * c * ga + b * c * gb + (denom - a * c) * gc)
    d_c = denom2inv * (-a * a * gc + a * b * gb + (denom - a * c) * ga)
    d_b = denom2inv * (2 * b * c * ga - (denom + 2 * b * b) * gb
                       + 2 * a * b * gc)
    return jnp.stack([d_a, d_b, d_c], axis=-1)


def _rasterize_bwd(statics, res, cot):
    width, height, sh_degree, cfg = statics
    (means3d, scales, quats, opacities, shs, colors_precomp, cam, bg,
     active, row0, pre, bins, fwd) = res
    d_color = cot.color  # depth/radii/final_t/n_contrib are non-differentiable
    n = means3d.shape[0]
    opac = opacities.reshape(-1)
    row0i = (jnp.zeros((), jnp.int32) if row0 is None
             else row0.astype(jnp.int32))

    if cfg.backend == "pallas":
        if not cfg.need_aux:
            raise ValueError(
                "RasterConfig(need_aux=False) renders are forward-only: "
                "the backward replay needs n_contrib")
        from . import tile_kernels
        g16 = tile_kernels.backward_tiles_pallas(
            bins, bg, fwd.color, fwd.final_t, d_color,
            width, height, cfg.tile_x, cfg.tile_y, cfg.chunk,
            n_contrib=fwd.n_contrib, prefix=cfg.prefix,
            grid_y_local=cfg.strip_rows, y0_tiles=row0i,
            alpha_matmul=cfg.alpha_matmul)                   # [16, MI]
        ids = bins.ids
        # per-instance -> per-Gaussian: ONE row-window scatter-add over all
        # grad channels.  The barrier materializes the row-major transpose —
        # letting XLA fuse it into the scatter selects the serial
        # per-element emitter (measured 10 ms/view vs ~0.1 ms).
        rows = jax.lax.optimization_barrier(g16.T)           # [MI, 16]
        seg = jnp.where(ids >= 0, ids, n).astype(jnp.int32)
        summed = jax.ops.segment_sum(rows, seg, num_segments=n + 1)[:n]
        d_rgb = summed[:, 0:3]
        d_mean2d = summed[:, 3:5]         # NDC-space grads
        d_conic = summed[:, 5:8]
        d_opacity_raster = summed[:, 8]
    else:
        inst = compositing.backward_tiles(
            bins.point_list, bins.tile_start, bins.tile_count,
            pre.mean2d, pre.conic, opac, pre.rgb,
            bg, fwd.color, fwd.final_t, d_color,
            width, height, cfg.tile_x, cfg.tile_y, cfg.max_slots,
            grid_y_local=cfg.strip_rows, y0_px=row0i * cfg.tile_y)
        ids = bins.point_list

        # ---- per-instance -> per-Gaussian (deterministic segment sum) ------
        seg = jnp.where(ids >= 0, ids, n).astype(jnp.int32)
        def seg_sum(x):
            return jax.ops.segment_sum(x, seg, num_segments=n + 1)[:n]
        d_rgb = seg_sum(inst.d_rgb)
        d_mean2d = seg_sum(inst.d_mean2d)     # NDC-space grads
        d_conic = seg_sum(inst.d_conic)
        d_opacity_raster = seg_sum(inst.d_opacity)

    mask = pre.mask
    maskf = mask.astype(means3d.dtype)
    # safe primal for culled points: 1 unit in front of the camera so the
    # vjp recomputation below never divides by ~0 view-z.
    safe_mean = cam.campos + cam.viewmat[:3, 2]
    means_safe = jnp.where(mask[:, None], means3d, safe_mean)

    focal_x = width / (2.0 * cam.tanfovx)
    focal_y = height / (2.0 * cam.tanfovy)

    # ---- conic -> cov2d -> (mean, cov3d) -> (scale, quat) ------------------
    d_cov2d = _conic_to_cov2d_grads(pre.cov2d, d_conic) * maskf[:, None]

    def cov2d_fn(m, c6):
        return math3d.compute_cov2d(m, focal_x, focal_y, cam.tanfovx,
                                    cam.tanfovy, c6, cam.viewmat)
    _, cov2d_vjp = jax.vjp(cov2d_fn, means_safe, pre.cov3d)
    d_mean_cov, d_cov3d = cov2d_vjp(d_cov2d)

    def cov3d_fn(s, q):
        return math3d.build_cov3d(s, 1.0, q)
    _, cov3d_vjp = jax.vjp(cov3d_fn, scales.astype(means3d.dtype),
                           quats.astype(means3d.dtype))
    d_scales, d_quats = cov3d_vjp(d_cov3d)

    # ---- mean2d (NDC) -> mean3d (projection path) --------------------------
    def proj_fn(m):
        return math3d.project_points(m, cam.projmat)[..., :2]
    _, proj_vjp = jax.vjp(proj_fn, means_safe)
    (d_mean_proj,) = proj_vjp(d_mean2d * maskf[:, None])

    d_means = d_mean_cov + d_mean_proj

    # ---- rgb -> (shs, mean3d) or colors_precomp ----------------------------
    d_rgb = d_rgb * maskf[:, None]
    d_shs = None
    d_colors_precomp = None
    if colors_precomp is not None:
        d_colors_precomp = d_rgb
    else:
        clamped = pre.clamped

        def sh_fn(m, s_):
            d = m - cam.campos
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            basis = sh.sh_basis(sh_degree, d)
            raw = jnp.einsum('...k,...kc->...c', basis, s_) + 0.5
            # exact clamp-gradient gating via the saved forward mask
            return jnp.where(clamped, 0.0, raw)

        _, sh_vjp = jax.vjp(sh_fn, means_safe, shs.astype(means3d.dtype))
        d_mean_sh, d_shs = sh_vjp(d_rgb)
        d_means = d_means + d_mean_sh
        d_shs = d_shs.astype(shs.dtype)

    d_means = (d_means * maskf[:, None]).astype(means3d.dtype)
    d_scales = (d_scales * maskf[:, None]).astype(scales.dtype)
    d_quats = (d_quats * maskf[:, None]).astype(quats.dtype)
    d_opac = (d_opacity_raster * maskf).reshape(opacities.shape).astype(
        opacities.dtype)
    d_mean2d_out = d_mean2d * maskf[:, None]

    d_cam = jax.tree_util.tree_map(jnp.zeros_like, cam)
    d_bg = jnp.zeros_like(bg)
    d_active = None if active is None else jnp.zeros_like(active)
    d_row0 = None if row0 is None else jnp.zeros_like(row0)
    return (d_means, d_scales, d_quats, d_opac, d_shs, d_colors_precomp,
            d_mean2d_out, d_cam, d_bg, d_active, d_row0)


_rasterize.defvjp(_rasterize_fwd, _rasterize_bwd)


def rasterize(means3d: jnp.ndarray,
              scales: jnp.ndarray,
              quats: jnp.ndarray,
              opacities: jnp.ndarray,
              cam: CameraParams,
              bg: jnp.ndarray,
              *,
              width: int,
              height: int,
              sh_degree: int = 0,
              config: RasterConfig = RasterConfig(),
              shs: Optional[jnp.ndarray] = None,
              colors_precomp: Optional[jnp.ndarray] = None,
              mean2d_dummy: Optional[jnp.ndarray] = None,
              active: Optional[jnp.ndarray] = None,
              row0=None) -> RenderOutput:
    """Render N Gaussians to one image.

    Mirrors ``GaussianRasterizer.forward`` (diff_gaussian_rasterization_ch3/
    __init__.py:134-197) with explicit static shape configuration.
    ``mean2d_dummy`` ([N,2] zeros) receives NDC screen-space gradients.
    ``row0`` (traced, tile-row units) selects the strip rendered when
    ``config.strip_rows > 0``.
    """
    if mean2d_dummy is None:
        mean2d_dummy = jnp.zeros((means3d.shape[0], 2), jnp.float32)
    if active is not None:
        # float mask so the custom_vjp cotangent is a plain zero array
        active = active.astype(jnp.float32)
    if row0 is not None:
        # float scalar so the custom_vjp cotangent is a plain zero array
        row0 = jnp.asarray(row0).astype(jnp.float32)
    statics = (int(width), int(height), int(sh_degree), config)
    return _rasterize(statics, means3d, scales, quats, opacities, shs,
                      colors_precomp, mean2d_dummy, cam, bg, active, row0)
