"""Adam with per-group LRs, per-Gaussian LR tensors, and state surgery.

The reference drives torch's fused Adam (eps=1e-15) with a *tensor* learning
rate per parameter group — the adaptive-optimization trick scales each
Gaussian's LR by the inverse of its temporal-opacity integral
(saro_gaussian.py:323,345-398).  optax can't express row-wise LR tensors
directly, so this is a small purpose-built Adam over the model pytree:

  * moments are pytrees shaped like the params,
  * the LR is a pytree of scalars or broadcastable [C, 1] tensors,
  * weight decay is torch-style (grad += wd * param) on the network groups
    (training_setup passes weight_decay=8e-7 for the MLP/hexplane groups),
  * densify/prune mutate the moment arrays directly (models/densify.py),
    matching the reference's optimizer surgery (:540-617).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

BETA1, BETA2 = 0.9, 0.999
EPS = 1e-15


class AdamState(NamedTuple):
    mu: Any        # pytree like params
    nu: Any
    count: jnp.ndarray  # scalar int32


def init_adam(params) -> AdamState:
    z = jax.tree_util.tree_map(jnp.zeros_like, params)
    z2 = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(mu=z, nu=z2, count=jnp.zeros((), jnp.int32))


def adam_step(state: AdamState, params, grads, lr_tree, wd_tree):
    """One Adam step.  ``lr_tree``/``wd_tree`` match the params structure
    with scalar or row-broadcastable leaves."""
    count = state.count + 1
    b1c = 1.0 - BETA1 ** count.astype(jnp.float32)
    b2c = 1.0 - BETA2 ** count.astype(jnp.float32)

    def upd(p, g, m, v, lr, wd):
        g = g + wd * p
        m = BETA1 * m + (1 - BETA1) * g
        v = BETA2 * v + (1 - BETA2) * g * g
        mhat = m / b1c
        vhat = v / b2c
        lr = jnp.asarray(lr)
        if lr.ndim > 0 and lr.ndim < p.ndim:
            lr = lr.reshape(lr.shape + (1,) * (p.ndim - lr.ndim))
        p = p - lr * mhat / (jnp.sqrt(vhat) + EPS)
        return p, m, v

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_v = treedef.flatten_up_to(state.nu)
    flat_lr = treedef.flatten_up_to(lr_tree)
    flat_wd = treedef.flatten_up_to(wd_tree)
    out = [upd(p, g, m, v, lr, wd) for p, g, m, v, lr, wd in
           zip(flat_p, flat_g, flat_m, flat_v, flat_lr, flat_wd)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, AdamState(mu=new_m, nu=new_v, count=count)


def expon_lr(step, lr_init, lr_final, max_steps, lr_delay_steps=0,
             lr_delay_mult=1.0, start_step=0):
    """Plenoxels-style log-linear LR decay (utils/general_utils.py:76-111).

    Traceable (jnp) so it can live inside the jitted train step."""
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros(())
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay = 1.0
    t = jnp.clip(step / (max_steps - start_step), 0, 1)
    log_lerp = jnp.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
    out = delay * log_lerp
    # reference: return lr_init before start_step; 0 for negative steps
    out = jnp.where(step < start_step, lr_init, out)
    return jnp.where(step < 0, 0.0, out)
