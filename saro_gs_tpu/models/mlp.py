"""Minimal functional MLP (params as pytrees of arrays).

Mirrors the reference's head networks (saro_gaussian.py:104-110): plain
``Linear-ReLU`` stacks.  Initialization follows torch's ``nn.Linear``
default (kaiming-uniform with a=sqrt(5), i.e. U(-1/sqrt(fan_in),
1/sqrt(fan_in)) for both weight and bias), which is what the reference
networks actually use (its ``params_init`` helper is dead code — it
references a nonexistent attribute and is never called).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def init_mlp(key, sizes: Sequence[int], dtype=jnp.float32):
    """sizes = [in, h1, ..., out].  Returns {'w': [...], 'b': [...]} lists."""
    ws, bs = [], []
    for i in range(len(sizes) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        fan_in = sizes[i]
        bound = 1.0 / jnp.sqrt(fan_in)
        ws.append(jax.random.uniform(k1, (sizes[i], sizes[i + 1]), dtype,
                                     -bound, bound))
        bs.append(jax.random.uniform(k2, (sizes[i + 1],), dtype, -bound,
                                     bound))
    return {"w": ws, "b": bs}


def apply_mlp(params, x, final_activation=None):
    """ReLU between layers; optional activation on the last output."""
    ws, bs = params["w"], params["b"]
    for i, (w, b) in enumerate(zip(ws, bs)):
        x = x @ w + b
        if i < len(ws) - 1:
            x = jax.nn.relu(x)
    if final_activation is not None:
        x = final_activation(x)
    return x


def apply_heads_cols(heads, x, pad_to=128):
    """First layers of several heads sharing the same [C_in, N] input,
    fused into ONE contraction-padded MXU dot; each head then finishes
    through its remaining layers.  Returns one [C_out_i, N] per head.

    XLA lowers a small-K dot (K=16 here: field feat + time PE) to VPU
    broadcast-FMA chains (~0.6 ms per head at 200k points, measured);
    zero-padding the shared contraction to 128 and concatenating the
    heads' first-layer outputs makes it a single MXU matmul (~0.05 ms)."""
    cin = x.shape[0]
    pad = -cin % pad_to
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    wcat = jnp.concatenate([h["w"][0] for h in heads], axis=1)
    wp = jnp.pad(wcat.astype(x.dtype), ((0, pad), (0, 0)))
    y = jax.lax.dot_general(wp, xp, (((0,), (0,)), ((), ())),
                            preferred_element_type=x.dtype)
    outs, o = [], 0
    for h in heads:
        n_out = h["w"][0].shape[1]
        hi = y[o:o + n_out] + h["b"][0][:, None]
        o += n_out
        if len(h["w"]) > 1:
            hi = apply_mlp_cols({"w": h["w"][1:], "b": h["b"][1:]},
                                jax.nn.relu(hi))
        outs.append(hi)
    return outs


def apply_mlp_cols(params, x, final_activation=None):
    """Same network on TRANSPOSED activations: x is [C_in, N], returns
    [C_out, N].

    On TPU the batch-major form hits a layout trap: the [N, c_in] input is
    assembled from 1-D feature columns, so XLA materializes it
    column-major and lowers the first (small-K) matmul as a serialized
    loop fusion (~0.6 ms per head at 200k points).  With features on the
    sublane axis and N on lanes, every layer is a clean [C_out, C_in] @
    [C_in, N] MXU dot."""
    ws, bs = params["w"], params["b"]
    for i, (w, b) in enumerate(zip(ws, bs)):
        x = jax.lax.dot_general(w, x, (((0,), (0,)), ((), ())),
                                preferred_element_type=x.dtype) + b[:, None]
        if i < len(ws) - 1:
            x = jax.nn.relu(x)
    if final_activation is not None:
        x = final_activation(x)
    return x
