"""The 4D Gaussian model: capacity-padded parameter pytrees + deformation.

Functional re-design of the reference's ``GaussianModel``
(scene/saro_gaussian.py:30): parameters live in fixed-capacity arrays with an
``alive`` mask so every training step stays jit-stable; densify/prune write
into dead slots instead of reallocating (see models/densify.py).  The
temporal model — scale-aware residual field features, lifespan/state, the
four MLP heads, and the closed-form temporal-opacity integral — follows
saro_gaussian.py:757-921.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import knn, math3d, sh
from . import field as field_mod
from . import mlp


class ModelConfig(NamedTuple):
    """Static model hyperparameters (mirrors arguments/__init__.py:47-112)."""
    sh_degree: int = 3
    deform_hidden_dim: int = 128          # H, saro_gaussian.py:93
    deform_time_encode: int = 4           # PE octaves, :94
    dx: bool = True
    drot: bool = True
    dopacity: bool = True
    dsh: bool = True
    sigmoid_tcenter: bool = False
    min_intergral: float = 0.1
    min_interval: float = 1.0
    # boundary-renormalize Eq. 22: divide by the fraction of the point's
    # temporal mass inside [0, 1] (clipped to <= 4x boost) so a splat
    # centered at t~0/t~1 is not integral-pruned / LR-starved for mass
    # the clip window cannot see.  Deviation from the reference (off by
    # default); targets the t-edge frame quality ceiling.
    integral_renorm: bool = False
    scale_reg: bool = True
    shs_reg: bool = False
    motion_reg: bool = False
    field: field_mod.FieldConfig = field_mod.FieldConfig()

    @property
    def time_embed_dim(self) -> int:
        return 1 + 2 * self.deform_time_encode


class GaussianParams(NamedTuple):
    """Learnable per-point parameters, capacity-padded [C, ...]."""
    xyz: jnp.ndarray            # [C, 3]
    features_dc: jnp.ndarray    # [C, 1, 3]
    features_rest: jnp.ndarray  # [C, 15, 3]
    scaling: jnp.ndarray        # [C, 3] (log)
    rotation: jnp.ndarray       # [C, 4]
    opacity: jnp.ndarray        # [C, 1] (logit)
    temporal_pos: jnp.ndarray   # [C, 1]


class NetParams(NamedTuple):
    """Learnable networks: field planes + the four MLP heads."""
    grids: list
    motion_mlp: dict
    rot_mlp: dict
    opacity_mlp: dict
    shs_mlp: dict


def init_nets(key, cfg: ModelConfig) -> NetParams:
    h = cfg.deform_hidden_dim
    fd = cfg.field.feat_dim
    te = cfg.time_embed_dim
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return NetParams(
        grids=field_mod.init_field(cfg.field),
        motion_mlp=mlp.init_mlp(k1, [te + fd, h, h, 3]),
        rot_mlp=mlp.init_mlp(k2, [te + fd, h, h, 7]),
        opacity_mlp=mlp.init_mlp(k3, [fd, h, h // 2, 1]),
        shs_mlp=mlp.init_mlp(k4, [te + fd, h, h, 48]))


def time_embed(cfg: ModelConfig, x: jnp.ndarray) -> jnp.ndarray:
    """NeRF positional encoding of the time distance
    (saro_gaussian.py:922-969): include_input + sin/cos at 2^0..2^(L-1)."""
    outs = [x]
    for i in range(cfg.deform_time_encode):
        f = 2.0 ** i
        outs.append(jnp.sin(x * f))
        outs.append(jnp.cos(x * f))
    return jnp.concatenate(outs, axis=-1)


def time_embed_cols(cfg: ModelConfig, x: jnp.ndarray) -> jnp.ndarray:
    """time_embed on a 1-D [N] column, stacked to [E, N] rows (the layout
    apply_mlp_cols consumes)."""
    outs = [x]
    for i in range(cfg.deform_time_encode):
        f = 2.0 ** i
        outs.append(jnp.sin(x * f))
        outs.append(jnp.cos(x * f))
    return jnp.stack(outs, axis=0)


# ---------------------------------------------------------------------------
# activations (saro_gaussian.py:32-47)
# ---------------------------------------------------------------------------

def get_scaling(p: GaussianParams):
    return jnp.exp(p.scaling)


def get_rotation(p: GaussianParams):
    return math3d.quat_normalize(p.rotation)


def get_opacity(p: GaussianParams):
    return jax.nn.sigmoid(p.opacity)


def get_temporal_pos(p: GaussianParams, cfg: ModelConfig):
    if cfg.sigmoid_tcenter:
        return jax.nn.sigmoid(p.temporal_pos)
    return p.temporal_pos


def get_features(p: GaussianParams):
    return jnp.concatenate([p.features_dc, p.features_rest], axis=1)


# ---------------------------------------------------------------------------
# temporal model
# ---------------------------------------------------------------------------

def survival_state(dist_over_lifespan: jnp.ndarray) -> jnp.ndarray:
    """Eq. 9: exp(-4 x^2) (saro_gaussian.py:757-759)."""
    return jnp.exp(-4.0 * dist_over_lifespan ** 2)


def compute_lifespan(nets: NetParams, cfg: ModelConfig,
                     feat: jnp.ndarray, duration) -> jnp.ndarray:
    """lifespan = (1 - min_scale)*(1 - sigmoid-MLP(feat)) + min_scale
    (saro_gaussian.py:782-785)."""
    raw = 1.0 - mlp.apply_mlp_cols(nets.opacity_mlp, feat.T,
                                   final_activation=jax.nn.sigmoid).T
    min_scale = cfg.min_interval / duration
    return (1.0 - min_scale) * raw + min_scale


class DeformOut(NamedTuple):
    xyz: jnp.ndarray
    rotation: jnp.ndarray      # normalized quat
    scaling: jnp.ndarray       # linear (exp applied)
    opacity: jnp.ndarray       # [C, 1]
    shs: jnp.ndarray           # [C, 16, 3]
    lifespan: jnp.ndarray      # [C, 1]
    state: jnp.ndarray         # [C, 1] survival
    scale_residual: Optional[jnp.ndarray]
    shs_residual: Optional[jnp.ndarray]
    motion_residual: Optional[jnp.ndarray]
    real_xyz: jnp.ndarray      # base-time deformed position (no grad)


def field_feat(params: GaussianParams, nets: NetParams, cfg: ModelConfig,
               fstatic: field_mod.FieldStatic) -> jnp.ndarray:
    """Field features at the Gaussians' (xyz, t_center, scale) — all inputs
    detached (saro_gaussian.py:780)."""
    sg = jax.lax.stop_gradient
    return field_mod.field_features(
        nets.grids, cfg.field, fstatic,
        sg(params.xyz), sg(get_temporal_pos(params, cfg)),
        sg(get_scaling(params)))


def deform(params: GaussianParams, nets: NetParams, cfg: ModelConfig,
           fstatic: field_mod.FieldStatic, timestamp,
           feat: Optional[jnp.ndarray] = None) -> DeformOut:
    """Full temporal deformation (saro_gaussian.py:779-847)."""
    sg = jax.lax.stop_gradient
    if feat is None:
        feat = field_feat(params, nets, cfg, fstatic)
    lifespan = compute_lifespan(nets, cfg, feat, fstatic.duration)
    t_pos = get_temporal_pos(params, cfg)
    distance = timestamp - t_pos
    state = survival_state(distance / lifespan)

    # transposed [C, N] activations throughout the heads (see
    # mlp.apply_mlp_cols): feature rows concat on axis 0, one MXU dot per
    # layer, outputs transposed back once
    feat_t = feat.T                                         # [F, N]
    dist_col = distance.reshape(-1)
    emb = sg(time_embed_cols(cfg, dist_col))     # PE detached (:792)
    df = jnp.concatenate([feat_t, emb], axis=0)
    base_emb = sg(time_embed_cols(cfg, jnp.zeros_like(dist_col)))
    base_df = jnp.concatenate([feat_t, base_emb], axis=0)

    heads = [nets.motion_mlp, nets.rot_mlp, nets.shs_mlp]
    m_df, rr, shs_df = mlp.apply_heads_cols(heads, df)
    m_base, rr_base, shs_base = mlp.apply_heads_cols(heads, base_df)

    scale_residual = rr_base[4:].T if cfg.scale_reg else None
    shs_residual = (shs_base.T.reshape(-1, 16, 3)
                    if cfg.shs_reg else None)
    motion_residual = m_base.T if cfg.motion_reg else None
    real_xyz = sg(params.xyz + m_base.T)

    if cfg.dx:
        xyz = params.xyz + m_df.T
    else:
        xyz = params.xyz

    if cfg.drot:
        rot = math3d.quat_normalize(params.rotation + rr[:4].T)
        # logit cap 30: the post-step clamp bounds params.scaling at
        # log(2*extent) but the per-frame net residual is unbounded, and
        # exp overflow -> inf cov3d -> NaN gradient chains even for
        # points the rasterizer culls (0 cotangent * inf partial).  Any
        # legitimate splat is < e^7; e^30 still renders (huge, finite)
        # and gradients keep flowing to shrink it.
        scaling = jnp.exp(jnp.minimum(params.scaling + rr[4:].T, 30.0))
    else:
        rot = get_rotation(params)
        scaling = get_scaling(params)

    if cfg.dopacity:
        opacity = jax.nn.sigmoid(params.opacity) * state
    else:
        opacity = get_opacity(params)

    shs = get_features(params)
    if cfg.dsh:
        shs = shs + shs_df.T.reshape(-1, 16, 3)

    return DeformOut(xyz=xyz, rotation=rot, scaling=scaling, opacity=opacity,
                     shs=shs, lifespan=lifespan, state=state,
                     scale_residual=scale_residual, shs_residual=shs_residual,
                     motion_residual=motion_residual, real_xyz=real_xyz)


def temporal_integral(params: GaussianParams, nets: NetParams,
                      cfg: ModelConfig, fstatic: field_mod.FieldStatic,
                      start=0.0, end=1.0,
                      feat: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Closed-form temporal opacity integral, Eq. 22
    (saro_gaussian.py:761-777).  No gradients by construction."""
    sg = jax.lax.stop_gradient
    if feat is None:
        feat = field_feat(params, nets, cfg, fstatic)
    feat = sg(feat)
    lifespan = sg(compute_lifespan(nets, cfg, feat, fstatic.duration))
    t_pos = sg(get_temporal_pos(params, cfg))

    def Q(x):
        a1, a2 = 0.070565902, 1.5976
        return 1.0 - 1.0 / (1.0 + jnp.exp(a1 * x ** 3 + a2 * x))

    c = 2.0 * math.sqrt(2.0)
    p1 = Q(c * (end - t_pos) / lifespan)
    p2 = Q(c * (start - t_pos) / lifespan)
    integral = lifespan * (math.sqrt(math.pi) / 2.0) * (p1 - p2)
    if cfg.integral_renorm:
        # Q(+inf) - Q(-inf) = 1, so p1 - p2 IS the in-window mass
        # fraction.  Dividing by it (clipped: boost <= 4x so a point
        # fully OUTSIDE [0,1] stays integral-prunable) makes an edge-
        # centered splat's integral match its unclipped mass instead of
        # penalizing it for mass past the boundary (cfg.integral_renorm;
        # deviation from saro_gaussian.py:761-777).
        integral = integral / jnp.clip(p1 - p2, 0.25, 1.0)
    return integral


# ---------------------------------------------------------------------------
# creation
# ---------------------------------------------------------------------------

class PointCloud(NamedTuple):
    points: np.ndarray   # [N, 3]
    colors: np.ndarray   # [N, 3] in [0, 1]
    times: Optional[np.ndarray] = None


def create_from_pcd(key, pcd: PointCloud, capacity: int,
                    cfg: ModelConfig) -> tuple[GaussianParams, jnp.ndarray]:
    """Initialize parameters from a point cloud (saro_gaussian.py:159-218).

    Returns (params, alive mask [capacity] f32).  Scales come from the mean
    squared 3-NN distance, clamped to [-10, 1] in log space; temporal
    positions are U(0, 1); SH DC from RGB; opacity logit of 0.1.
    """
    n = pcd.points.shape[0]
    assert n <= capacity, (n, capacity)
    f32 = jnp.float32

    pts = jnp.asarray(pcd.points, f32)
    d2 = knn.mean_sq_dist_to_3nn(pts)
    d2 = jnp.maximum(d2, 1e-7)
    scales = jnp.clip(jnp.log(jnp.sqrt(d2)), -10.0, 1.0)[:, None].repeat(
        3, axis=1)

    def pad(x, fill=0.0):
        padding = [(0, capacity - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, padding, constant_values=fill)

    dc = sh.rgb2sh(jnp.asarray(pcd.colors, f32)).reshape(n, 1, 3)
    rots = jnp.zeros((n, 4), f32).at[:, 0].set(1.0)
    opac = math3d.inverse_sigmoid(0.1 * jnp.ones((n, 1), f32))
    times = jax.random.uniform(key, (n, 1), f32)

    rots_padded = pad(rots).at[n:, 0].set(1.0)   # identity quats in padding
    params = GaussianParams(
        xyz=pad(pts),
        features_dc=pad(dc),
        features_rest=pad(jnp.zeros((n, 15, 3), f32)),
        scaling=pad(scales, fill=-10.0),
        rotation=rots_padded,
        opacity=pad(opac, fill=-10.0),
        temporal_pos=pad(times, fill=0.5))
    alive = (jnp.arange(capacity) < n).astype(f32)
    return params, alive


def num_alive(alive: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(alive > 0)
