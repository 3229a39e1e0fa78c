"""Core 3D math for Gaussian splatting, pure JAX.

Conventions (all chosen to reproduce the reference pipeline semantics,
see /root/reference/utils/graphics_utils.py and
/root/reference/submodules/gaussian_rasterization_ch3/cuda_rasterizer/forward.cu):

  * Matrices are stored in ROW-VECTOR convention: a point transforms as
    ``p_out = p_hom @ M``.  This matches the reference, which stores
    ``world_view_transform = getWorld2View2(R, T).T`` (cameras.py:90) and the
    CUDA ``transformPoint4x4`` which reads the flat buffer as
    ``out_j = sum_i p_i * M[i, j]`` (auxiliary.h:68-77).
  * Quaternions are (r, x, y, z).  The rasterizer-side covariance build uses
    the quaternion RAW (no normalization), matching forward.cu:127.
  * cov3d is the symmetric 3x3 packed as the 6-vector
    [xx, xy, xz, yy, yz, zz] (forward.cu:146-151).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

# w-epsilon of the homogeneous divide (forward.cu:199).
W_EPS = 1e-7
# Low-pass filter added to the 2D covariance diagonal (forward.cu:110-111).
COV2D_LOWPASS = 0.3
# Frustum near-cull threshold on view-space z (auxiliary.h:154).
NEAR_CULL_Z = 0.2


# ---------------------------------------------------------------------------
# Camera matrices (host-side, numpy: used when building cameras from data).
# ---------------------------------------------------------------------------

def world_to_view_matrix(R: np.ndarray, t: np.ndarray,
                         translate=np.array([0.0, 0.0, 0.0]),
                         scale: float = 1.0) -> np.ndarray:
    """World->view 4x4 in row-vector convention (already transposed).

    Equivalent to ``getWorld2View2(R, t, translate, scale).T``
    (graphics_utils.py:39-50 + cameras.py:90).
    """
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    cam_center = (C2W[:3, 3] + translate) * scale
    C2W[:3, 3] = cam_center
    Rt = np.linalg.inv(C2W)
    return np.float32(Rt.T)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float,
                      cx: float = 0.0, cy: float = 0.0) -> np.ndarray:
    """GL-style projection 4x4, row-vector convention (already transposed).

    Matches ``getProjectionMatrix(CV)`` (graphics_utils.py:52-75,114-160) with
    the reference's ``(zfar+znear)/(zfar-znear)`` z-scale variant, followed by
    the ``.transpose(0, 1)`` applied at cameras.py:96-99.  ``cx, cy`` are
    principal-point offsets in the [-0.5, 0.5] ratio convention.
    """
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    top = tan_half_fovy * znear
    bottom = -top
    right = tan_half_fovx * znear
    left = -right
    dx = (2 * tan_half_fovx * znear) * cx
    dy = (2 * tan_half_fovy * znear) * cy
    left += dx
    right += dx
    top += dy
    bottom += dy

    P = np.zeros((4, 4))
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = 1.0
    P[2, 2] = (zfar + znear) / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return np.float32(P.T)


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


# ---------------------------------------------------------------------------
# Point transforms (JAX, batched over leading axes).
# ---------------------------------------------------------------------------

def transform_point_4x3(p: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] @ row-vector 4x4 -> [..., 3] (no homogeneous divide)."""
    return p @ m[:3, :3] + m[3, :3]


def transform_point_4x4(p: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> homogeneous [..., 4] through a row-vector 4x4."""
    return p @ m[:3, :4] + m[3, :4]


def project_points(p: jnp.ndarray, projmat: jnp.ndarray) -> jnp.ndarray:
    """Project [..., 3] world points to NDC [..., 3] with the reference's
    w-epsilon (forward.cu:198-200)."""
    hom = transform_point_4x4(p, projmat)
    inv_w = 1.0 / (hom[..., 3:4] + W_EPS)
    return hom[..., :3] * inv_w


# ---------------------------------------------------------------------------
# Structure-of-arrays (column) variants.
#
# TPU layouts put the minor axis on the 128-wide vector lanes; [N, 3]-shaped
# tensors and [N, 3, 3] einsums compile to serialized loop fusions /
# MXU convolutions with strided slice extraction (profiled at ~16 ms/frame
# for 200k Gaussians).  These variants take and return plain 1-D [N] arrays
# so the whole preprocess fuses into one vectorized elementwise pass.
# ---------------------------------------------------------------------------

def transform_point_4x3_cols(px, py, pz, m):
    """Column version of ``transform_point_4x3`` -> (x, y, z) 1-D arrays."""
    return (px * m[0, 0] + py * m[1, 0] + pz * m[2, 0] + m[3, 0],
            px * m[0, 1] + py * m[1, 1] + pz * m[2, 1] + m[3, 1],
            px * m[0, 2] + py * m[1, 2] + pz * m[2, 2] + m[3, 2])


def project_points_cols(px, py, pz, projmat):
    """Column version of ``project_points`` -> (ndc_x, ndc_y, ndc_z).

    The denominator is sanitized where |hw + eps| < 1e-4: such points sit
    AT the camera plane and are frustum-culled (z <= 0.2) long before
    compositing, but 1/(~0) would put an inf PRIMAL in the graph and the
    VJP then turns the culled point's zero cotangent into 0*inf = NaN,
    poisoning every geometric gradient group (the reference hits the same
    NaN and asserts, saro_gaussian.py:278-279).  Visible points always
    have hw + eps >= 0.2, so surviving values are bit-identical."""
    m = projmat
    hx = px * m[0, 0] + py * m[1, 0] + pz * m[2, 0] + m[3, 0]
    hy = px * m[0, 1] + py * m[1, 1] + pz * m[2, 1] + m[3, 1]
    hz = px * m[0, 2] + py * m[1, 2] + pz * m[2, 2] + m[3, 2]
    hw = px * m[0, 3] + py * m[1, 3] + pz * m[2, 3] + m[3, 3]
    denom = hw + W_EPS
    denom = jnp.where(jnp.abs(denom) < 1e-4, 1.0, denom)
    inv_w = 1.0 / denom
    return hx * inv_w, hy * inv_w, hz * inv_w


def quat_to_rotmat_cols(qr, qx, qy, qz):
    """Raw-quaternion rotation entries as nine 1-D arrays (row-major
    r00..r22); matches ``quat_to_rotmat_raw`` exactly."""
    r, x, y, z = qr, qx, qy, qz
    return (1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
            2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
            2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y))


def build_cov3d_cols(sx, sy, sz, mod, qr, qx, qy, qz):
    """Column version of ``build_cov3d`` -> (xx, xy, xz, yy, yz, zz).

    Same math and summation order as the stacked version: M = R diag(s),
    sigma_ij = sum_k M_ik M_jk (forward.cu:118-152)."""
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = quat_to_rotmat_cols(
        qr, qx, qy, qz)
    sx = mod * sx
    sy = mod * sy
    sz = mod * sz
    m00, m01, m02 = r00 * sx, r01 * sy, r02 * sz
    m10, m11, m12 = r10 * sx, r11 * sy, r12 * sz
    m20, m21, m22 = r20 * sx, r21 * sy, r22 * sz
    xx = m00 * m00 + m01 * m01 + m02 * m02
    xy = m00 * m10 + m01 * m11 + m02 * m12
    xz = m00 * m20 + m01 * m21 + m02 * m22
    yy = m10 * m10 + m11 * m11 + m12 * m12
    yz = m10 * m20 + m11 * m21 + m12 * m22
    zz = m20 * m20 + m21 * m21 + m22 * m22
    return xx, xy, xz, yy, yz, zz


def compute_cov2d_cols(px, py, pz, focal_x, focal_y, tan_fovx, tan_fovy,
                       cov6, viewmat):
    """Column version of ``compute_cov2d``: world-position columns + packed
    cov3d columns -> (a, b, c) of the 2D covariance [[a, b], [b, c]].

    Exact reference math (forward.cu:74-113): view clamp at 1.3*tanfov,
    +0.3 low-pass on the diagonal.  cov = T^T V T with T = W J unrolled to
    scalar arithmetic (J's last column is zero, so only T[:, 0] and T[:, 1]
    are needed)."""
    xx, xy, xz, yy, yz, zz = cov6
    tx_, ty_, tz = transform_point_4x3_cols(px, py, pz, viewmat)
    # near-plane-culled points (z <= NEAR_CULL_Z, masked by the caller)
    # must not put 1/~0 infs in the primal graph: their zero cotangent
    # times an inf partial is NaN, which poisons the whole gradient
    # (see project_points_cols).  tz > NEAR_CULL_Z is exactly the
    # caller's in_front predicate, so every surviving value is
    # bit-identical to the reference math (forward.cu:74-113).
    tz = jnp.where(tz > NEAR_CULL_Z, tz, 1.0)
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    txtz = tx_ / tz
    tytz = ty_ / tz
    tx = jnp.clip(txtz, -limx, limx) * tz
    ty = jnp.clip(tytz, -limy, limy) * tz

    fxtz = focal_x / tz
    fytz = focal_y / tz
    jx = -(focal_x * tx) / (tz * tz)
    jy = -(focal_y * ty) / (tz * tz)
    w = viewmat[:3, :3]
    # T = W @ J; J = [[fx/tz,0,0],[0,fy/tz,0],[jx,jy,0]]
    u0 = w[0, 0] * fxtz + w[0, 2] * jx
    u1 = w[1, 0] * fxtz + w[1, 2] * jx
    u2 = w[2, 0] * fxtz + w[2, 2] * jx
    v0 = w[0, 1] * fytz + w[0, 2] * jy
    v1 = w[1, 1] * fytz + w[1, 2] * jy
    v2 = w[2, 1] * fytz + w[2, 2] * jy
    a = (xx * u0 * u0 + yy * u1 * u1 + zz * u2 * u2
         + 2.0 * (xy * u0 * u1 + xz * u0 * u2 + yz * u1 * u2))
    b = (xx * u0 * v0 + yy * u1 * v1 + zz * u2 * v2
         + xy * (u0 * v1 + u1 * v0) + xz * (u0 * v2 + u2 * v0)
         + yz * (u1 * v2 + u2 * v1))
    c = (yy * v1 * v1 + xx * v0 * v0 + zz * v2 * v2
         + 2.0 * (xy * v0 * v1 + xz * v0 * v2 + yz * v1 * v2))
    return a + COV2D_LOWPASS, b, c + COV2D_LOWPASS


def ndc2pix(v: jnp.ndarray, size) -> jnp.ndarray:
    """NDC [-1, 1] -> pixel centers, exact reference formula
    (auxiliary.h:41-44)."""
    return ((v + 1.0) * size - 1.0) * 0.5


# ---------------------------------------------------------------------------
# Rotation / covariance.
# ---------------------------------------------------------------------------

def quat_to_rotmat_raw(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion [..., 4] (r,x,y,z) -> rotation matrix [..., 3, 3].

    The quaternion is used UN-normalized, matching the rasterizer
    (forward.cu:127).  Row-major math matrix: ``v_rot = R @ v``.
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z),
                      2 * (x * z + r * y)], axis=-1)
    row1 = jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z),
                      2 * (y * z - r * x)], axis=-1)
    row2 = jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x),
                      1 - 2 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize quaternions (torch.nn.functional.normalize semantics,
    saro_gaussian.py:47).

    Uses sqrt(|q|^2 + eps^2) instead of max(|q|, eps): identical values at
    f32 precision for unit-ish quats, but the VJP stays finite at q = 0
    (dead capacity-padding rows would otherwise produce NaN gradients)."""
    n2 = jnp.sum(q * q, axis=-1, keepdims=True)
    return q / jnp.sqrt(n2 + eps * eps)


def build_cov3d(scale: jnp.ndarray, mod, quat: jnp.ndarray) -> jnp.ndarray:
    """Scale [..., 3] (+ scalar modifier) and raw quaternion [..., 4] ->
    packed world covariance [..., 6] = [xx, xy, xz, yy, yz, zz].

    forward.cu:118-152 computes ``Sigma = transpose(M) * M`` with glm's
    column-major ``M = S * R``; unfolding the storage convention this is the
    standard 3DGS covariance ``Sigma = R S^2 R^T`` with the Hamilton rotation
    matrix (consistent with the Python-side ``build_scaling_rotation``,
    general_utils.py:191-200, where cov = (R S)(R S)^T).
    """
    cols = build_cov3d_cols(scale[..., 0], scale[..., 1], scale[..., 2], mod,
                            quat[..., 0], quat[..., 1], quat[..., 2],
                            quat[..., 3])
    return jnp.stack(cols, axis=-1)


def unpack_sym3(c6: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] packed -> [..., 3, 3] symmetric."""
    xx, xy, xz, yy, yz, zz = (c6[..., i] for i in range(6))
    return jnp.stack([
        jnp.stack([xx, xy, xz], axis=-1),
        jnp.stack([xy, yy, yz], axis=-1),
        jnp.stack([xz, yz, zz], axis=-1)], axis=-2)


def compute_cov2d(mean: jnp.ndarray, focal_x, focal_y, tan_fovx, tan_fovy,
                  cov3d6: jnp.ndarray, viewmat: jnp.ndarray) -> jnp.ndarray:
    """EWA-splat 2D covariance [..., 3] = (a, b, c) of [[a, b], [b, c]].

    Exact reference math (forward.cu:74-113): view-space position clamped to
    1.3*tanfov before building the projective Jacobian, and a +0.3 low-pass on
    the output diagonal.
    """
    cov6 = tuple(cov3d6[..., i] for i in range(6))
    a, b, c = compute_cov2d_cols(mean[..., 0], mean[..., 1], mean[..., 2],
                                 focal_x, focal_y, tan_fovx, tan_fovy,
                                 cov6, viewmat)
    return jnp.stack([a, b, c], axis=-1)


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))
