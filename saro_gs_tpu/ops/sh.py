"""Spherical-harmonics color evaluation (degree <= 3), pure JAX.

Matches the rasterizer-side SH evaluation exactly
(reference forward.cu:20-71 / utils/sh_utils.py:57-112): real SH basis with
hard-coded constants, a +0.5 offset, and clamp-to-zero whose mask is recorded
for the backward pass (backward.cu:29-34 zeroes clamped channels' grads).
"""
from __future__ import annotations

import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396)
SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def sh_basis(degree: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the real SH basis at unit directions.

    Args:
      degree: static int in [0, 3]; basis length is always 16, with
        coefficients beyond ``(degree+1)^2`` zeroed (so a fixed-width matmul
        against [..., 16, 3] SH tensors reproduces degree-limited eval).
      dirs: [..., 3] unit directions.
    Returns:
      [..., 16] basis values.
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    b = [SH_C0 * one] + [zero] * 15
    if degree > 0:
        b[1] = -SH_C1 * y
        b[2] = SH_C1 * z
        b[3] = -SH_C1 * x
    if degree > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        b[4] = SH_C2[0] * xy
        b[5] = SH_C2[1] * yz
        b[6] = SH_C2[2] * (2.0 * zz - xx - yy)
        b[7] = SH_C2[3] * xz
        b[8] = SH_C2[4] * (xx - yy)
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy = x * y
        b[9] = SH_C3[0] * y * (3.0 * xx - yy)
        b[10] = SH_C3[1] * xy * z
        b[11] = SH_C3[2] * y * (4.0 * zz - xx - yy)
        b[12] = SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy)
        b[13] = SH_C3[4] * x * (4.0 * zz - xx - yy)
        b[14] = SH_C3[5] * z * (xx - yy)
        b[15] = SH_C3[6] * x * (xx - 3.0 * yy)
    return jnp.stack(b, axis=-1)


def eval_sh_color(degree: int, shs: jnp.ndarray, means: jnp.ndarray,
                  campos: jnp.ndarray):
    """SH [..., 16, 3] + positions -> (rgb [..., 3], clamped mask [..., 3]).

    rgb is max(result + 0.5, 0); ``clamped`` marks channels that were clamped
    (needed to zero their gradients, backward.cu:29-34).
    """
    d = means - campos
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    basis = sh_basis(degree, d)                       # [..., 16]
    raw = jnp.einsum('...k,...kc->...c', basis, shs) + 0.5
    clamped = raw < 0
    return jnp.maximum(raw, 0.0), clamped


def sh_basis_cols(degree: int, x, y, z):
    """``sh_basis`` on direction columns -> list of 16 1-D arrays (zeros
    beyond ``(degree+1)^2``)."""
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    b = [SH_C0 * one] + [zero] * 15
    if degree > 0:
        b[1] = -SH_C1 * y
        b[2] = SH_C1 * z
        b[3] = -SH_C1 * x
    if degree > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        b[4] = SH_C2[0] * xy
        b[5] = SH_C2[1] * yz
        b[6] = SH_C2[2] * (2.0 * zz - xx - yy)
        b[7] = SH_C2[3] * xz
        b[8] = SH_C2[4] * (xx - yy)
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy = x * y
        b[9] = SH_C3[0] * y * (3.0 * xx - yy)
        b[10] = SH_C3[1] * xy * z
        b[11] = SH_C3[2] * y * (4.0 * zz - xx - yy)
        b[12] = SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy)
        b[13] = SH_C3[4] * x * (4.0 * zz - xx - yy)
        b[14] = SH_C3[5] * z * (xx - yy)
        b[15] = SH_C3[6] * x * (xx - 3.0 * yy)
    return b


def eval_sh_color_cols(degree: int, shs: jnp.ndarray, px, py, pz, campos):
    """Column version of ``eval_sh_color``: position columns ->
    ((r, g, b), (clamp_r, clamp_g, clamp_b)) 1-D arrays.

    The [N, 16, 3] SH tensor is transposed once to [16, 3, N] so each
    coefficient read is a contiguous 1-D slice (strided [:, k, c] slices
    serialize on TPU); the weighted sum is then a pure elementwise chain.
    """
    dx = px - campos[0]
    dy = py - campos[1]
    dz = pz - campos[2]
    inv_n = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz)
    basis = sh_basis_cols(degree, dx * inv_n, dy * inv_n, dz * inv_n)
    n_coef = num_sh_coeffs(degree)
    sht = jnp.transpose(shs[:, :n_coef, :], (1, 2, 0))     # [K, 3, N]
    rgb, clamped = [], []
    for c in range(3):
        raw = basis[0] * sht[0, c]
        for k in range(1, n_coef):
            raw = raw + basis[k] * sht[k, c]
        raw = raw + 0.5
        clamped.append(raw < 0)
        rgb.append(jnp.maximum(raw, 0.0))
    return tuple(rgb), tuple(clamped)


def rgb2sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """DC-band conversion (utils/sh_utils.py:114)."""
    return (rgb - 0.5) / SH_C0


def sh2rgb(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * SH_C0 + 0.5
