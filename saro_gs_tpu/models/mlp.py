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
