"""Pure train-step functions (shared by the single-chip and SPMD paths).

The batch loss/grad/update logic lives here as pure functions of explicit
state so the same code runs directly (one device) or inside
``shard_map`` over a device mesh (parallel/shard.py): with ``axis_name``
set, per-view gradients and densify statistics are psum-reduced across the
``data`` axis — the reference's sequential batch gradient accumulation
(train.py:190-226) executed concurrently on devices.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models import densify as dens
from ..models import field as field_mod
from ..models import gaussians as gm
from ..render import train_render
from . import losses, optim


class StepStatics(NamedTuple):
    """Hashable bundle of everything static for the jitted step."""
    mcfg: object           # gm.ModelConfig
    rcfg: object           # RasterConfig
    weights: object        # LossWeights
    width: int
    height: int
    cfg_lrs: tuple         # see make_lr_statics
    extent: float
    # relative scale floor (x extent); 0 = off (reference-faithful).  The
    # r4 arena run's 290x-LR window minted 41k/124k points with scales
    # < 1e-5 and saturated opacity — with the +0.3px low-pass those render
    # as opaque 1px dots (salt noise + non-finite gradient fodder)
    scale_floor: float = 0.0


def make_lr_statics(cfg) -> tuple:
    return (cfg.position_lr_init, cfg.position_lr_final,
            cfg.position_lr_delay_mult, cfg.position_lr_max_steps,
            cfg.feature_lr, cfg.opacity_lr, cfg.scaling_lr,
            cfg.rotation_lr, cfg.trbfc_lr, cfg.mlp_lr, cfg.mlp_lr_final,
            cfg.hexplane_lr, cfg.hexplane_lr_final)


def _masked_std(x, mask):
    n = jnp.maximum(mask.sum(), 2.0)
    mean = (x * mask).sum() / n
    var = (mask * (x - mean) ** 2).sum() / (n - 1.0)
    return jnp.sqrt(var)


def batch_loss_fn(points, nets, m2d, *, cams, gt, timestamps, alive, bg,
                  fstatic, st: StepStatics, stage: str, sh_degree: int,
                  sh_mask=None,
                  axis_tile: Optional[str] = None, n_tile: int = 1):
    """Mean loss over the (local) view batch; aux = (radii, ll1, dropped,
    last image).

    With ``axis_tile`` set (inside shard_map over a ``tile`` mesh axis),
    each device renders its strip of tile rows, the strips are
    all-gathered into the full frame, and the IDENTICAL full-frame loss is
    computed on every device, scaled by 1/n_tile.  Every device
    differentiates its own copy, so the effective objective is
    sum_over_devices(L/n) = L: the all_gather transpose delivers each
    device n_tile * (its strip's image cotangent) / n_tile = exactly its
    strip's share, and replicated regularizer gradients appear once per
    device at 1/n_tile strength — a psum over ``axis_tile`` in the caller
    therefore yields the exact full-frame gradient for every term."""
    mcfg, rcfg, weights = st.mcfg, st.rcfg, st.weights
    row0 = None
    loss_scale = 1.0
    if axis_tile is not None:
        grid_y = (st.height + rcfg.tile_y - 1) // rcfg.tile_y
        rows_local = (grid_y + n_tile - 1) // n_tile
        rcfg = rcfg._replace(strip_rows=rows_local)
        row0 = jax.lax.axis_index(axis_tile) * rows_local
        loss_scale = 1.0 / n_tile
    alive_col = alive[:, None]
    batch = gt.shape[0]

    # Field features depend only on (xyz, t_center, scale) — not the view
    # timestamp (saro_gaussian.py:780) — so sample the hexplane ONCE per
    # step and share across the view batch.  The grid-sampling backward
    # (scatter-add into the planes) was the top device op at ~86 ms/view
    # when recomputed inside the per-view loop.
    feat = None
    if stage == "dynamatic":
        cap = points.xyz.shape[0]
        if axis_tile is not None and cap % n_tile == 0:
            # point-axis sharding over the (otherwise idle-at-this-stage)
            # tile axis: each device samples the hexplane for C/n_tile
            # Gaussians, all_gather reassembles [C, F].  Exactness: the
            # gather's transpose psums every consumer device's cotangent
            # (n_tile copies of dL/dfeat at 1/n_tile loss scale) back to
            # the producing slice, so the sliced hexplane backward yields
            # exact partial grid grads that the caller's psum over
            # ``axis_tile`` completes.  field_feat inputs are detached
            # (saro_gaussian.py:780), so no g_points path changes.
            per = cap // n_tile
            row = jax.lax.axis_index(axis_tile) * per
            pslice = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_slice_in_dim(x, row, per, 0),
                points)
            feat_local = gm.field_feat(pslice, nets, mcfg, fstatic)
            feat = jax.lax.all_gather(feat_local, axis_tile, axis=0,
                                      tiled=True)
        else:
            feat = gm.field_feat(points, nets, mcfg, fstatic)

    def one_view(i):
        cam = jax.tree_util.tree_map(lambda x: x[i], cams)
        pkg = train_render(
            cam, timestamps[i], points, nets, alive, mcfg, fstatic, bg,
            width=st.width, height=st.height, stage=stage,
            sh_degree=sh_degree, rcfg=rcfg, mean2d_dummy=m2d[i],
            feat=feat, row0=row0, sh_mask=sh_mask)
        color = pkg.out.color
        if axis_tile is not None:
            # strips -> full frame; the transpose routes each device its
            # own strip's cotangent
            color = jax.lax.all_gather(color, axis_tile, axis=1,
                                       tiled=True)[:, :st.height, :]
        d = pkg.deform
        loss, logs = losses.composite_loss(
            weights, color, gt[i],
            t_centers=None,
            scale_residual=(None if d is None or d.scale_residual is None
                            else d.scale_residual * alive_col),
            shs_residual=(None if d is None or d.shs_residual is None
                          else d.shs_residual * alive_col[..., None]),
            motion_residual=(None if d is None or d.motion_residual is None
                            else d.motion_residual * alive_col),
            active_sh_degree=sh_degree, sh_mask=sh_mask,
            grids=nets.grids if (weights.lambda_dplanetv > 0 or
                                 weights.lambda_dtime_smooth > 0) else None,
            plane_tv_fn=field_mod.plane_tv,
            time_smooth_fn=field_mod.time_smoothness)
        if weights.lambda_dtstd > 0 and stage == "dynamatic":
            ltstd = 1.0 - _masked_std(
                gm.get_temporal_pos(points, mcfg)[:, 0], alive)
            loss = loss + weights.lambda_dtstd * ltstd
        return loss * loss_scale, (pkg.out.radii, logs["Ll1"],
                                   pkg.out.num_dropped, color)

    losses_all, (radii, ll1s, dropped, colors) = jax.lax.map(
        one_view, jnp.arange(batch))
    return losses_all.mean(), (radii, ll1s.mean(), dropped.max(), colors[-1])


def lr_trees(step, inv_integral, points_tpl, nets_tpl, st: StepStatics,
             *, stage: str, scale_integral):
    """LR pytrees per update_learning_rate (saro_gaussian.py:345-398).

    ``scale_integral`` may be a python bool or a traced 0/1 scalar — it
    only gates an LR factor, so keeping it traced avoids a full step
    recompile when the flag flips at densify_until_iter."""
    (pli, plf, pldm, plms, feat_lr, op_lr, sc_lr, rot_lr, tc_lr,
     mlp_i, mlp_f, hex_i, hex_f) = st.cfg_lrs
    ext = st.extent
    inv = inv_integral[:, 0] if stage == "dynamatic" else 1.0
    xyz_lr = optim.expon_lr(step, pli * ext, plf * ext, plms,
                            lr_delay_mult=pldm)
    mlp_lr = optim.expon_lr(step, mlp_i, mlp_f, plms)
    hex_lr = optim.expon_lr(step, hex_i, hex_f, plms)
    if isinstance(scale_integral, bool):
        scal_lr = sc_lr * inv if scale_integral else sc_lr
    else:
        scal_lr = sc_lr * jnp.where(scale_integral, inv,
                                    jnp.ones_like(inv))

    points_lr = gm.GaussianParams(
        xyz=xyz_lr * inv, features_dc=feat_lr * inv,
        features_rest=jnp.asarray(feat_lr / 20.0), scaling=scal_lr,
        rotation=rot_lr * inv, opacity=op_lr * inv,
        temporal_pos=tc_lr * inv)

    def bc(tree, v):
        return jax.tree_util.tree_map(lambda _: v, tree)
    nets_lr = gm.NetParams(grids=bc(nets_tpl.grids, hex_lr),
                           motion_mlp=bc(nets_tpl.motion_mlp, mlp_lr),
                           rot_mlp=bc(nets_tpl.rot_mlp, mlp_lr),
                           opacity_mlp=bc(nets_tpl.opacity_mlp, mlp_lr),
                           shs_mlp=bc(nets_tpl.shs_mlp, mlp_lr))
    wd = 8e-7 if stage == "dynamatic" else 0.0
    nets_wd = jax.tree_util.tree_map(lambda _: wd, nets_tpl)
    points_wd = jax.tree_util.tree_map(lambda _: 0.0, points_tpl)
    return ({"points": points_lr, "nets": nets_lr},
            {"points": points_wd, "nets": nets_wd})


def train_step_core(state, cams, gt, timestamps, bg, fstatic,
                    st: StepStatics, *, stage: str, sh_degree: int,
                    scale_integral: bool, sh_mask=None,
                    axis_name: Optional[str] = None,
                    axis_tile: Optional[str] = None, n_tile: int = 1):
    """One full optimization step; under ``shard_map`` pass ``axis_name``
    to average gradients / merge stats across the data axis, and/or
    ``axis_tile`` to shard each render over tile rows (per-Gaussian
    cotangents are partial sums over the device's pixels -> psum)."""
    if gt.dtype == jnp.uint8:
        # GT uploads dominate host->device traffic and the axon PJRT
        # client leaks its transfer staging (66 MB/step at batch-4
        # 1352x1014 f32 — host-OOM'd the r3 stress run at iter ~1850);
        # uint8 transport cuts the volume 4x, decoded on-device here
        gt = gt.astype(jnp.float32) * (1.0 / 255.0)
    cap = state.alive.shape[0]
    batch = gt.shape[0]
    m2d0 = jnp.zeros((batch, cap, 2), jnp.float32)

    def loss_fn(points, nets, m2d):
        return batch_loss_fn(points, nets, m2d, cams=cams, gt=gt,
                             timestamps=timestamps, alive=state.alive,
                             bg=bg, fstatic=fstatic, st=st, stage=stage,
                             sh_degree=sh_degree, sh_mask=sh_mask,
                             axis_tile=axis_tile, n_tile=n_tile)

    (loss, (radii, ll1, dropped, last_img)), grads = \
        jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)(
            state.points, state.nets, m2d0)
    g_points, g_nets, g_m2d = grads

    if axis_tile is not None:
        # per-Gaussian grads are partial sums over this device's strip
        # pixels (SURVEY §2.3: the SP/CP analogue); the 1/n_tile loss
        # scaling in batch_loss_fn makes this psum exact for every term
        g_points = jax.lax.psum(g_points, axis_tile)
        g_nets = jax.lax.psum(g_nets, axis_tile)
        g_m2d = jax.lax.psum(g_m2d, axis_tile)
        dropped = jax.lax.pmax(dropped, axis_tile)
        loss = loss * n_tile  # undo the reporting scale

    # densify stats (train.py:278-292).  The reference accumulates the
    # screen-grad norm of each view's OWN loss; our batch loss is the mean
    # over views, so undo the 1/B scaling on the per-view dummy grads.
    norms = jnp.linalg.norm(g_m2d, axis=-1) * batch
    vis = radii > 0
    vis_count = vis.sum(axis=0)
    summed = norms.sum(axis=0)
    max_radii = radii.max(axis=0)

    if axis_name is not None:
        g_points = jax.lax.pmean(g_points, axis_name)
        g_nets = jax.lax.pmean(g_nets, axis_name)
        vis_count = jax.lax.psum(vis_count, axis_name)
        summed = jax.lax.psum(summed, axis_name)
        max_radii = jax.lax.pmax(max_radii, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
        ll1 = jax.lax.pmean(ll1, axis_name)
        dropped = jax.lax.pmax(dropped, axis_name)

    batch_grad = jnp.where(vis_count > 0, summed / vis_count, 0.0)
    aux = dens.add_stats(state.aux, batch_grad, vis_count > 0, max_radii)

    if stage != "dynamatic":
        g_nets = jax.tree_util.tree_map(jnp.zeros_like, g_nets)
        g_points = g_points._replace(
            temporal_pos=jnp.zeros_like(g_points.temporal_pos))

    lr_tree, wd_tree = lr_trees(state.step, state.inv_integral,
                                state.points, state.nets, st, stage=stage,
                                scale_integral=scale_integral)
    new_params, new_opt = optim.adam_step(
        state.opt, {"points": state.points, "nets": state.nets},
        {"points": g_points, "nets": g_nets}, lr_tree, wd_tree)
    # physical projection: under the per-Gaussian integral LR scaling
    # (inv_integral up to 1/min_intergral) Adam's ~lr-sized log-space
    # steps can run a scale away until exp() overflows; cap at 2x the
    # camera extent (a splat that big is degenerate regardless)
    pts = new_params["points"]
    pts = pts._replace(scaling=jnp.minimum(
        pts.scaling, jnp.log(2.0 * st.extent + 1e-6)))
    if st.scale_floor > 0.0:
        # symmetric floor (config scale_floor, relative to extent): stop
        # the collapsed-scale/saturated-opacity degeneracy (see above)
        pts = pts._replace(scaling=jnp.maximum(
            pts.scaling, jnp.log(st.scale_floor * st.extent)))
    new_state = state._replace(
        points=pts, nets=new_params["nets"], opt=new_opt,
        aux=aux, step=state.step + 1)

    # non-finite guard: one bad frame (the reference ASSERTS on NaN
    # t-center grads, saro_gaussian.py:278-279) must not poison the whole
    # run — skip the parameter/stat update, keep the step counter.
    # bad_src is a bitmask attributing WHICH gradient group went
    # non-finite (decode with bad_src_names); the r3 stress run skipped
    # 31-47/50 steps with no way to tell temporal_pos from hexplane.
    finite = jnp.isfinite(loss)
    bad_src = jnp.where(finite, 0, 1).astype(jnp.int32)   # bit 0 = loss
    groups = list(zip(gm.GaussianParams._fields, g_points))
    groups += [("nets", g_nets), ("mean2d", g_m2d)]
    gmax = {}   # per-group max |grad|: the leading indicator of a blow-up
    for bit, (name, leaves) in enumerate(groups, start=1):
        gf = jnp.bool_(True)
        gm_ = jnp.float32(0.0)
        # g_m2d feeds the densify-stat accumulator (aux) which persists
        # across steps — a NaN there would poison every later densify
        # decision, so it must gate the update like the parameter grads
        for leaf in jax.tree_util.tree_leaves(leaves):
            gf = gf & jnp.isfinite(jnp.sum(leaf))
            gm_ = jnp.maximum(gm_, jnp.max(jnp.abs(leaf)))
        finite = finite & gf
        bad_src = bad_src | jnp.where(gf, 0, 1 << bit).astype(jnp.int32)
        gmax[name] = gm_
    skipped = state._replace(step=state.step + 1)
    new_state = jax.tree_util.tree_map(
        lambda new, old: jnp.where(finite, new, old), new_state, skipped)
    # cumulative health counters update even on skipped steps: the host
    # reads them on a stride (a per-step read would serialize the remote
    # tunnel), so per-step metrics alone would leave blind spots
    new_state = new_state._replace(
        dropped_hwm=jnp.maximum(state.dropped_hwm,
                                dropped).astype(jnp.int32),
        bad_steps=state.bad_steps + (~finite).astype(jnp.int32))

    metrics = {"loss": loss, "Ll1": ll1, "dropped": dropped,
               "bad_step": (~finite).astype(jnp.int32),
               "bad_src": bad_src, "gmax": gmax,
               "inv_lr_max": jnp.max(state.inv_integral),
               "psnr": losses.psnr(jnp.clip(last_img, 0, 1), gt[-1])}
    return new_state, metrics


def bad_src_names(mask: int):
    """Decode metrics['bad_src'] into the non-finite gradient groups."""
    names = ["loss"] + list(gm.GaussianParams._fields) + ["nets", "mean2d"]
    return [n for i, n in enumerate(names) if mask & (1 << i)]
