"""Adaptive density control under static shapes (jit-stable).

Re-design of the reference's densify/clone/split/prune + optimizer surgery
(saro_gaussian.py:540-759, helper_train.py:103-174) for capacity-padded
arrays: instead of reallocating tensors, new Gaussians are written into dead
slots (tracked by an ``alive`` mask) and the Adam moments of affected rows
are zeroed in place — exactly the state the reference produces via tensor
concatenation/boolean indexing, minus the row reordering (which nothing
downstream depends on; the rasterizer re-sorts by depth every frame).

Split efficiency: the reference adds N=2 children and prunes the parent; we
write child 1 into the parent's slot and child 2 into a fresh slot, which is
state-equivalent and halves slot pressure.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import math3d
from . import gaussians as gm


class DensifyAux(NamedTuple):
    """Densification statistics (training_setup, saro_gaussian.py:297-303)."""
    xyz_grad_accum: jnp.ndarray   # [C, 1]
    denom: jnp.ndarray            # [C, 1]
    max_radii2d: jnp.ndarray      # [C]


def init_aux(capacity: int) -> DensifyAux:
    f32 = jnp.float32
    return DensifyAux(xyz_grad_accum=jnp.zeros((capacity, 1), f32),
                      denom=jnp.zeros((capacity, 1), f32),
                      max_radii2d=jnp.zeros((capacity,), f32))


def add_stats(aux: DensifyAux, batch_grad_norm: jnp.ndarray,
              visibility: jnp.ndarray, radii: jnp.ndarray) -> DensifyAux:
    """Per-iteration stat merge (train.py:278-292 +
    add_densification_stats_grad :745-750): ``batch_grad_norm`` is already
    the batch-mean screen-grad norm over visible views."""
    vis = visibility.astype(jnp.float32)
    return DensifyAux(
        xyz_grad_accum=aux.xyz_grad_accum + (batch_grad_norm * vis)[:, None],
        denom=aux.denom + vis[:, None],
        max_radii2d=jnp.where(visibility,
                              jnp.maximum(aux.max_radii2d,
                                          radii.astype(jnp.float32)),
                              aux.max_radii2d))


def reset_opacity(params: gm.GaussianParams, mu, nu):
    """Clamp opacity to <= 0.01 and zero its Adam moments
    (saro_gaussian.py:451-455, replace_tensor_to_optimizer)."""
    new_op = math3d.inverse_sigmoid(
        jnp.minimum(gm.get_opacity(params), 0.01))
    params = params._replace(opacity=new_op)
    mu = mu._replace(opacity=jnp.zeros_like(mu.opacity))
    nu = nu._replace(opacity=jnp.zeros_like(nu.opacity))
    return params, mu, nu


def _dead_slot_lookup(alive: jnp.ndarray):
    """lookup[r] = index of the r-th dead slot (else C)."""
    c = alive.shape[0]
    dead = alive <= 0
    rank = jnp.cumsum(dead) - 1
    lookup = jnp.full((c,), c, jnp.int32)
    pos = jnp.where(dead, rank, c).astype(jnp.int32)
    return lookup.at[pos].set(jnp.arange(c, dtype=jnp.int32), mode='drop'), \
        jnp.sum(dead).astype(jnp.int32)


class DensifyResult(NamedTuple):
    params: gm.GaussianParams
    mu: gm.GaussianParams
    nu: gm.GaussianParams
    alive: jnp.ndarray
    aux: DensifyAux
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    overflowed: jnp.ndarray    # bool: ran out of dead slots


def densify_pruneclone(params: gm.GaussianParams, mu, nu,
                       alive: jnp.ndarray, aux: DensifyAux, key,
                       *, grad_threshold: float, min_opacity: float,
                       extent, percent_dense: float,
                       max_screen_size,  # None or int
                       inv_integral: jnp.ndarray,        # [C, 1]
                       integral: jnp.ndarray,            # [C, 1]
                       min_intergral: float,
                       prune_z: bool, prune_big_ws: bool,
                       min_scale_abs: float = 0.0) -> DensifyResult:
    """One densify+prune pass (saro_gaussian.py:646-739).

    ``integral`` is the current temporal-opacity integral (computed by the
    caller with the nets), ``inv_integral`` the LR/densify scaling tensor.
    """
    c = alive.shape[0]
    alivef = alive > 0
    grads = aux.xyz_grad_accum / aux.denom
    grads = jnp.where(jnp.isnan(grads), 0.0, grads)
    grads = (grads * inv_integral)[:, 0]

    scaling = gm.get_scaling(params)
    max_scale = scaling.max(axis=1)
    hit = (grads >= grad_threshold) & alivef
    clone_mask = hit & (max_scale <= percent_dense * extent)
    split_mask = hit & (max_scale > percent_dense * extent)

    lookup, n_free = _dead_slot_lookup(alive)
    rank_c = (jnp.cumsum(clone_mask) - 1).astype(jnp.int32)
    n_clone = jnp.sum(clone_mask).astype(jnp.int32)
    rank_s = (jnp.cumsum(split_mask) - 1).astype(jnp.int32)
    n_split = jnp.sum(split_mask).astype(jnp.int32)

    # clone destinations: dead slots [0, n_clone); split child-2
    # destinations: dead slots [n_clone, n_clone + n_split)
    dest_c = lookup[jnp.clip(rank_c, 0, c - 1)]
    dest_s2 = lookup[jnp.clip(n_clone + rank_s, 0, c - 1)]
    fits_c = clone_mask & (rank_c < n_free)
    fits_s = split_mask & (n_clone + rank_s < n_free)
    overflow = (n_clone + n_split) > n_free

    # ---- clone: copy raw rows (densify_and_clone :685-701) ----------------
    params_new = jax.tree_util.tree_map(
        lambda x: x.at[jnp.where(fits_c, dest_c, c)].set(x, mode='drop'),
        params)
    # cloned rows start with zero moments (cat_tensors_to_optimizer :596-617)
    def zero_rows(t, mask, dest):
        return jax.tree_util.tree_map(
            lambda x: x.at[jnp.where(mask, dest, c)].set(
                jnp.zeros_like(x), mode='drop'), t)
    mu_new = zero_rows(mu, fits_c, dest_c)
    nu_new = zero_rows(nu, fits_c, dest_c)
    alive_new = alive.at[jnp.where(fits_c, dest_c, c)].set(1.0, mode='drop')

    # ---- split (densify_and_splitv2 :646-682, N=2) ------------------------
    k1, k2 = jax.random.split(key)
    rot = math3d.quat_to_rotmat_raw(math3d.quat_normalize(params.rotation))
    samp1 = jax.random.normal(k1, params.xyz.shape) * scaling
    samp2 = jax.random.normal(k2, params.xyz.shape) * scaling
    child_xyz1 = jnp.einsum('nij,nj->ni', rot, samp1) + params.xyz
    child_xyz2 = jnp.einsum('nij,nj->ni', rot, samp2) + params.xyz
    child_scaling = jnp.log(scaling / (0.8 * 2))

    def child(tree, xyz, scal):
        return tree._replace(xyz=xyz, scaling=scal)

    child1 = child(params, child_xyz1, child_scaling)
    child2 = child(params, child_xyz2, child_scaling)
    # child 1 overwrites the parent slot (parent is pruned in the reference)
    params_new = jax.tree_util.tree_map(
        lambda dst, src: jnp.where(
            fits_s.reshape((-1,) + (1,) * (dst.ndim - 1)), src, dst),
        params_new, child1)
    mu_new = jax.tree_util.tree_map(
        lambda x: jnp.where(fits_s.reshape((-1,) + (1,) * (x.ndim - 1)),
                            0.0, x), mu_new)
    nu_new = jax.tree_util.tree_map(
        lambda x: jnp.where(fits_s.reshape((-1,) + (1,) * (x.ndim - 1)),
                            0.0, x), nu_new)
    # child 2 into a fresh dead slot
    params_new = jax.tree_util.tree_map(
        lambda dst, src: dst.at[jnp.where(fits_s, dest_s2, c)].set(
            src, mode='drop'), params_new, child2)
    mu_new = zero_rows(mu_new, fits_s, dest_s2)
    nu_new = zero_rows(nu_new, fits_s, dest_s2)
    alive_new = alive_new.at[jnp.where(fits_s, dest_s2, c)].set(
        1.0, mode='drop')

    # ---- prune (densify_pruneclone :718-736) ------------------------------
    opacity_now = gm.get_opacity(params_new)[:, 0]
    prune = opacity_now < min_opacity
    prune = prune | (integral[:, 0] < min_intergral)
    if prune_z:
        prune = prune | (params_new.xyz[:, 2] < 4.5)
    if max_screen_size is not None:
        big_vs = aux.max_radii2d > max_screen_size
        # newly created slots have zero max_radii2d -> never big_vs
        if prune_big_ws:
            big_ws = gm.get_scaling(params_new).max(axis=1) > 0.1 * extent
            prune = prune | big_vs | big_ws
        else:
            prune = prune | big_vs
    if min_scale_abs > 0.0:
        # collapsed-scale prune (config prune_min_scale, x extent; NOT in
        # the reference): the log-space scale walk is unbounded below and
        # the +0.3 low-pass hides sub-pixel shrinkage, so speckle-fitting
        # points collapse to ~1e-8-scale max-opacity dots (r5 arena: 41k
        # of 120k by it 8000) that waste capacity and overfit train views
        prune = prune | (gm.get_scaling(params_new).max(axis=1)
                         < min_scale_abs)
    alive_out = jnp.where(prune, 0.0, alive_new)
    n_pruned = jnp.sum((alive_new > 0) & prune).astype(jnp.int32)

    return DensifyResult(params=params_new, mu=mu_new, nu=nu_new,
                         alive=alive_out, aux=init_aux(c),
                         n_cloned=jnp.sum(fits_c).astype(jnp.int32),
                         n_split=jnp.sum(fits_s).astype(jnp.int32),
                         n_pruned=n_pruned, overflowed=overflow)


def prune_mask_only(alive: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Plain prune (e.g. z-floater prune on real_xyz, train.py:128-142,
    helper_train.py:138-142)."""
    return jnp.where(mask, 0.0, alive)


def integral_prune_and_lr(alive: jnp.ndarray, integral: jnp.ndarray,
                          min_intergral: float, clip: float = 0.0):
    """Every-50-iteration integral prune + inverse-integral LR tensor
    (update_learning_rate, saro_gaussian.py:345-398): prune low-integral
    points, then inv = (1/I) / min(1/I) over survivors.

    ``clip`` > 0 caps the multiplier (config inv_lr_clip); the reference
    leaves it unbounded up to 1/min_intergral (~625x at the Neural3D
    setting), which at reference-scale LRs drove the r3 stress run
    non-finite after a large densify."""
    valid = (integral[:, 0] > min_intergral) & (alive > 0)
    alive_out = jnp.where(valid, alive, 0.0)
    inv = 1.0 / jnp.maximum(integral[:, 0], 1e-12)
    inv_min = jnp.min(jnp.where(valid, inv, jnp.inf))
    inv_min = jnp.where(jnp.isfinite(inv_min), inv_min, 1.0)
    inv_integral = jnp.where(valid, inv / inv_min, 1.0)[:, None]
    if clip > 0.0:
        inv_integral = jnp.minimum(inv_integral, clip)
    return alive_out, inv_integral
