"""Slow NumPy oracle of the reference rasterizer semantics.

A literal sequential re-statement of the math in
/root/reference/submodules/gaussian_rasterization_ch3/cuda_rasterizer/
{forward.cu,backward.cu,auxiliary.h} used as the golden reference for the
JAX/Pallas implementation.  Per-pixel Python loops: only for tiny scenes.
"""
from __future__ import annotations

import numpy as np

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = np.array([1.0925484305920792, -1.0925484305920792,
                  0.31539156525252005, -1.0925484305920792,
                  0.5462742152960396])
SH_C3 = np.array([-0.5900435899266435, 2.890611442640554,
                  -0.4570457994644658, 0.3731763325901154,
                  -0.4570457994644658, 1.445305721320277,
                  -0.5900435899266435])


def _transform_4x3(p, m):
    return p @ m[:3, :3] + m[3, :3]


def _transform_4x4(p, m):
    return p @ m[:3, :4] + m[3, :4]


def _sh_basis(deg, d):
    x, y, z = d
    b = np.zeros(16)
    b[0] = SH_C0
    if deg > 0:
        b[1], b[2], b[3] = -SH_C1 * y, SH_C1 * z, -SH_C1 * x
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            b[4] = SH_C2[0] * xy
            b[5] = SH_C2[1] * yz
            b[6] = SH_C2[2] * (2 * zz - xx - yy)
            b[7] = SH_C2[3] * xz
            b[8] = SH_C2[4] * (xx - yy)
            if deg > 2:
                b[9] = SH_C3[0] * y * (3 * xx - yy)
                b[10] = SH_C3[1] * xy * z
                b[11] = SH_C3[2] * y * (4 * zz - xx - yy)
                b[12] = SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy)
                b[13] = SH_C3[4] * x * (4 * zz - xx - yy)
                b[14] = SH_C3[5] * z * (xx - yy)
                b[15] = SH_C3[6] * x * (xx - 3 * yy)
    return b


def _cov3d(scale, mod, q):
    r, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)]])
    M = R @ np.diag(mod * scale)
    S = M @ M.T
    return np.array([S[0, 0], S[0, 1], S[0, 2], S[1, 1], S[1, 2], S[2, 2]])


def _cov2d(mean, fx, fy, tanx, tany, c6, viewmat):
    t = _transform_4x3(mean, viewmat)
    limx, limy = 1.3 * tanx, 1.3 * tany
    txtz, tytz = t[0] / t[2], t[1] / t[2]
    tx = min(limx, max(-limx, txtz)) * t[2]
    ty = min(limy, max(-limy, tytz)) * t[2]
    tz = t[2]
    J = np.array([[fx / tz, 0, 0],
                  [0, fy / tz, 0],
                  [-(fx * tx) / tz ** 2, -(fy * ty) / tz ** 2, 0]])
    W = viewmat[:3, :3]
    T = W @ J
    V = np.array([[c6[0], c6[1], c6[2]],
                  [c6[1], c6[3], c6[4]],
                  [c6[2], c6[4], c6[5]]])
    cov = T.T @ V @ T
    return np.array([cov[0, 0] + 0.3, cov[0, 1], cov[1, 1] + 0.3])


def oracle_render(means3d, scales, quats, opacities, viewmat, projmat, campos,
                  width, height, tanfovx, tanfovy, bg, sh_degree=0, shs=None,
                  colors_precomp=None, tile=16):
    """Forward render. Returns dict with image + every intermediate needed by
    the backward oracle."""
    n = means3d.shape[0]
    fx = width / (2 * tanfovx)
    fy = height / (2 * tanfovy)
    grid_x = (width + tile - 1) // tile
    grid_y = (height + tile - 1) // tile

    depth = np.zeros(n)
    radii = np.zeros(n, np.int32)
    mean2d = np.zeros((n, 2))
    conic = np.zeros((n, 3))
    rgb = np.zeros((n, 3))
    clamped = np.zeros((n, 3), bool)
    cov3d6 = np.zeros((n, 6))
    cov2d3 = np.zeros((n, 3))
    rects = np.zeros((n, 4), np.int32)
    tiles_touched = np.zeros(n, np.int64)

    for i in range(n):
        p_view = _transform_4x3(means3d[i], viewmat)
        if p_view[2] <= 0.2:
            continue
        hom = _transform_4x4(means3d[i], projmat)
        p_w = 1.0 / (hom[3] + 1e-7)
        p_proj = hom[:3] * p_w
        c6 = _cov3d(scales[i], 1.0, quats[i])
        cov = _cov2d(means3d[i], fx, fy, tanfovx, tanfovy, c6, viewmat)
        det = cov[0] * cov[2] - cov[1] ** 2
        if det == 0.0:
            continue
        con = np.array([cov[2], -cov[1], cov[0]]) / det
        mid = 0.5 * (cov[0] + cov[2])
        l1 = mid + np.sqrt(max(0.1, mid * mid - det))
        l2 = mid - np.sqrt(max(0.1, mid * mid - det))
        radius = np.ceil(3.0 * np.sqrt(max(l1, l2)))
        pix = np.array([((p_proj[0] + 1) * width - 1) * 0.5,
                        ((p_proj[1] + 1) * height - 1) * 0.5])
        rmin_x = min(grid_x, max(0, int((pix[0] - radius) / tile)))
        rmin_y = min(grid_y, max(0, int((pix[1] - radius) / tile)))
        rmax_x = min(grid_x, max(0, int((pix[0] + radius + tile - 1) / tile)))
        rmax_y = min(grid_y, max(0, int((pix[1] + radius + tile - 1) / tile)))
        if (rmax_x - rmin_x) * (rmax_y - rmin_y) == 0:
            continue
        if colors_precomp is None:
            d = means3d[i] - campos
            d = d / np.linalg.norm(d)
            raw = _sh_basis(sh_degree, d) @ shs[i] + 0.5
            clamped[i] = raw < 0
            rgb[i] = np.maximum(raw, 0.0)
        else:
            rgb[i] = colors_precomp[i]
        depth[i] = p_view[2]
        radii[i] = int(radius)
        mean2d[i] = pix
        conic[i] = con
        cov3d6[i] = c6
        cov2d3[i] = cov
        rects[i] = (rmin_x, rmin_y, rmax_x, rmax_y)
        tiles_touched[i] = (rmax_x - rmin_x) * (rmax_y - rmin_y)

    # binning: emit (tile, depth, emission order) keys; stable sort
    keys = []
    for i in range(n):
        if radii[i] <= 0:
            continue
        for ty in range(rects[i, 1], rects[i, 3]):
            for tx in range(rects[i, 0], rects[i, 2]):
                keys.append((ty * grid_x + tx, depth[i], i))
    keys.sort(key=lambda k: (k[0], k[1]))   # python sort is stable
    per_tile = {}
    for t, _, i in keys:
        per_tile.setdefault(t, []).append(i)

    color = np.zeros((3, height, width))
    out_depth = np.full((height, width), 15.0)
    final_t = np.ones((height, width))
    n_contrib = np.zeros((height, width), np.int64)

    for t, ids in per_tile.items():
        ty, tx = divmod(t, grid_x)
        for py in range(ty * tile, min((ty + 1) * tile, height)):
            for px in range(tx * tile, min((tx + 1) * tile, width)):
                T = 1.0
                C = np.zeros(3)
                D = 15.0
                last = 0
                for j, i in enumerate(ids):
                    dx = mean2d[i, 0] - px
                    dy = mean2d[i, 1] - py
                    power = (-0.5 * (conic[i, 0] * dx * dx +
                                     conic[i, 2] * dy * dy)
                             - conic[i, 1] * dx * dy)
                    if power > 0:
                        continue
                    alpha = min(0.99, opacities[i] * np.exp(power))
                    if alpha < 1 / 255:
                        continue
                    test_t = T * (1 - alpha)
                    if test_t < 1e-4:
                        break
                    C += rgb[i] * alpha * T
                    if T > 0.5 and test_t < 0.5:
                        D = depth[i]
                    T = test_t
                    last = j + 1
                color[:, py, px] = C + T * bg
                out_depth[py, px] = D
                final_t[py, px] = T
                n_contrib[py, px] = last

    return dict(color=color, depth=out_depth, final_t=final_t,
                n_contrib=n_contrib, radii=radii, mean2d=mean2d, conic=conic,
                rgb=rgb, clamped=clamped, cov3d=cov3d6, cov2d=cov2d3,
                gdepth=depth, per_tile=per_tile, grid=(grid_x, grid_y),
                tile=tile)


def oracle_backward(saved, means3d, scales, quats, opacities, viewmat,
                    projmat, campos, width, height, tanfovx, tanfovy, bg,
                    d_color, sh_degree=0, shs=None, colors_precomp=None):
    """Backward per backward.cu; returns dict of grads.

    d_mean2d follows the reference convention: NDC-space gradients
    (per-pixel-space grads scaled by 0.5*W / 0.5*H)."""
    n = means3d.shape[0]
    fx = width / (2 * tanfovx)
    fy = height / (2 * tanfovy)
    mean2d, conic, rgb = saved['mean2d'], saved['conic'], saved['rgb']
    radii, gdepth = saved['radii'], saved['gdepth']
    final_t, n_contrib = saved['final_t'], saved['n_contrib']
    tile = saved['tile']
    grid_x, _ = saved['grid']

    d_rgb = np.zeros((n, 3))
    d_m2d = np.zeros((n, 2))
    d_conic = np.zeros((n, 3))   # TRUE grads for (a, b, c)
    d_op = np.zeros(n)

    for t, ids in saved['per_tile'].items():
        ty, tx = divmod(t, grid_x)
        for py in range(ty * tile, min((ty + 1) * tile, height)):
            for px in range(tx * tile, min((tx + 1) * tile, width)):
                T_final = final_t[py, px]
                last = n_contrib[py, px]
                dpix = d_color[:, py, px]
                bg_dot = float(bg @ dpix)
                T = T_final
                accum = np.zeros(3)
                last_alpha = 0.0
                last_color = np.zeros(3)
                for j in range(len(ids) - 1, -1, -1):
                    if j + 1 > last:
                        continue
                    i = ids[j]
                    dx = mean2d[i, 0] - px
                    dy = mean2d[i, 1] - py
                    power = (-0.5 * (conic[i, 0] * dx * dx +
                                     conic[i, 2] * dy * dy)
                             - conic[i, 1] * dx * dy)
                    if power > 0:
                        continue
                    G = np.exp(power)
                    alpha = min(0.99, opacities[i] * G)
                    if alpha < 1 / 255:
                        continue
                    T = T / (1 - alpha)
                    d_alpha = 0.0
                    for ch in range(3):
                        accum[ch] = (last_alpha * last_color[ch]
                                     + (1 - last_alpha) * accum[ch])
                        d_alpha += (rgb[i, ch] - accum[ch]) * dpix[ch]
                        d_rgb[i, ch] += alpha * T * dpix[ch]
                    last_color = rgb[i].copy()
                    d_alpha *= T
                    last_alpha = alpha
                    d_alpha += (-T_final / (1 - alpha)) * bg_dot
                    d_g = opacities[i] * d_alpha
                    gdx, gdy = G * dx, G * dy
                    d_delx = -gdx * conic[i, 0] - gdy * conic[i, 1]
                    d_dely = -gdy * conic[i, 2] - gdx * conic[i, 1]
                    d_m2d[i, 0] += d_g * d_delx * (0.5 * width)
                    d_m2d[i, 1] += d_g * d_dely * (0.5 * height)
                    d_conic[i, 0] += -0.5 * gdx * dx * d_g
                    d_conic[i, 1] += -gdx * dy * d_g      # full b-grad
                    d_conic[i, 2] += -0.5 * gdy * dy * d_g
                    d_op[i] += G * d_alpha

    # preprocess backward
    d_means = np.zeros((n, 3))
    d_scales = np.zeros((n, 3))
    d_quats = np.zeros((n, 4))
    d_shs = np.zeros((n, 16, 3)) if shs is not None else None
    for i in range(n):
        if radii[i] <= 0:
            continue
        a, b, c = saved['cov2d'][i]
        ga, gb, gc = d_conic[i]
        denom = a * c - b * b
        denom2inv = 1.0 / (denom * denom + 1e-7)
        dL_da = denom2inv * (-c * c * ga + b * c * gb + (denom - a * c) * gc)
        dL_dc = denom2inv * (-a * a * gc + a * b * gb + (denom - a * c) * ga)
        dL_db = denom2inv * (2 * b * c * ga - (denom + 2 * b * b) * gb
                             + 2 * a * b * gc)

        # cov2d -> (T, Vrk) -> (J -> t -> mean, cov3d)
        t = _transform_4x3(means3d[i], viewmat)
        limx, limy = 1.3 * tanfovx, 1.3 * tanfovy
        txtz, tytz = t[0] / t[2], t[1] / t[2]
        x_grad_mul = 0.0 if (txtz < -limx or txtz > limx) else 1.0
        y_grad_mul = 0.0 if (tytz < -limy or tytz > limy) else 1.0
        tx = min(limx, max(-limx, txtz)) * t[2]
        ty = min(limy, max(-limy, tytz)) * t[2]
        tz = t[2]
        J = np.array([[fx / tz, 0, 0],
                      [0, fy / tz, 0],
                      [-(fx * tx) / tz ** 2, -(fy * ty) / tz ** 2, 0]])
        W = viewmat[:3, :3]
        Tm = W @ J
        c6 = saved['cov3d'][i]
        V = np.array([[c6[0], c6[1], c6[2]],
                      [c6[1], c6[3], c6[4]],
                      [c6[2], c6[4], c6[5]]])
        dC = np.array([[dL_da, 0.5 * dL_db], [0.5 * dL_db, dL_dc]])
        # cov2x2 = (T^T V T)[:2,:2]: dL/dV = T[:, :2] dC T[:, :2]^T (sym)
        dV = Tm[:, :2] @ dC @ Tm[:, :2].T
        d_cov3d = np.array([dV[0, 0], 2 * dV[0, 1], 2 * dV[0, 2],
                            dV[1, 1], 2 * dV[1, 2], dV[2, 2]])
        # dL/dT = 2 V T[:, :2] dC (cols 0,1), col 2 unused
        dT = 2 * V @ Tm[:, :2] @ dC
        dJ = W.T @ np.concatenate([dT, np.zeros((3, 1))], axis=1)
        dL_dJ00, dL_dJ02 = dJ[0, 0], dJ[2, 0]
        dL_dJ11, dL_dJ12 = dJ[1, 1], dJ[2, 1]
        tz2, tz3 = 1 / tz ** 2, 1 / tz ** 3
        d_tx = x_grad_mul * -fx * tz2 * dL_dJ02
        d_ty = y_grad_mul * -fy * tz2 * dL_dJ12
        d_tz = (-fx * tz2 * dL_dJ00 - fy * tz2 * dL_dJ11
                + (2 * fx * tx) * tz3 * dL_dJ02
                + (2 * fy * ty) * tz3 * dL_dJ12)
        d_means[i] += viewmat[:3, :3] @ np.array([d_tx, d_ty, d_tz])

        # cov3d -> scale, quat (raw quaternion, no normalization).
        # Central finite differences against the doubled-off-diagonal packed
        # cotangent (exact for this smooth polynomial map at fd precision).
        eps = 1e-5

        def c6_of(sc, qt):
            return _cov3d(np.asarray(sc, float), 1.0, np.asarray(qt, float))

        for ax in range(3):
            sp = scales[i].astype(float).copy()
            sm = scales[i].astype(float).copy()
            sp[ax] += eps
            sm[ax] -= eps
            d_scales[i, ax] = d_cov3d @ (
                (c6_of(sp, quats[i]) - c6_of(sm, quats[i])) / (2 * eps))
        for ax in range(4):
            qp = quats[i].astype(float).copy()
            qm = quats[i].astype(float).copy()
            qp[ax] += eps
            qm[ax] -= eps
            d_quats[i, ax] = d_cov3d @ (
                (c6_of(scales[i], qp) - c6_of(scales[i], qm)) / (2 * eps))

        # mean2d (NDC) -> mean3d through projection
        m = means3d[i]
        hom = _transform_4x4(m, projmat)
        m_w = 1.0 / (hom[3] + 1e-7)
        # row-vector projmat: hom_j = sum_i m_i projmat[i, j]
        P = projmat
        mul1 = (P[0, 0] * m[0] + P[1, 0] * m[1] + P[2, 0] * m[2]
                + P[3, 0]) * m_w * m_w
        mul2 = (P[0, 1] * m[0] + P[1, 1] * m[1] + P[2, 1] * m[2]
                + P[3, 1]) * m_w * m_w
        gx, gy = d_m2d[i]
        d_means[i, 0] += (P[0, 0] * m_w - P[0, 3] * mul1) * gx + \
                         (P[0, 1] * m_w - P[0, 3] * mul2) * gy
        d_means[i, 1] += (P[1, 0] * m_w - P[1, 3] * mul1) * gx + \
                         (P[1, 1] * m_w - P[1, 3] * mul2) * gy
        d_means[i, 2] += (P[2, 0] * m_w - P[2, 3] * mul1) * gx + \
                         (P[2, 1] * m_w - P[2, 3] * mul2) * gy

        # rgb -> shs and mean (view-direction path)
        if shs is not None:
            dL_dRGB = d_rgb[i] * (~saved['clamped'][i])
            dir_orig = m - campos
            norm = np.linalg.norm(dir_orig)
            d = dir_orig / norm
            basis = _sh_basis(sh_degree, d)
            d_shs[i] = np.outer(basis, dL_dRGB)
            # d(basis)/d(dir) via finite-difference-free analytic chain:
            eps = 1e-6
            dRGB_dd = np.zeros(3)
            for ax in range(3):
                dp = d.copy()
                dp[ax] += eps
                dm_ = d.copy()
                dm_[ax] -= eps
                diff = (_sh_basis(sh_degree, dp) - _sh_basis(sh_degree, dm_)) \
                    / (2 * eps)
                dRGB_dd[ax] = (diff @ shs[i]) @ dL_dRGB
            # normalize backward (dnormvdv)
            sum2 = norm ** 2
            invsum32 = 1.0 / np.sqrt(sum2 ** 3)
            v = dir_orig
            dv = dRGB_dd
            d_dir = np.array([
                (sum2 - v[0] * v[0]) * dv[0] - v[1] * v[0] * dv[1]
                - v[2] * v[0] * dv[2],
                -v[0] * v[1] * dv[0] + (sum2 - v[1] * v[1]) * dv[1]
                - v[2] * v[1] * dv[2],
                -v[0] * v[2] * dv[0] - v[1] * v[2] * dv[1]
                + (sum2 - v[2] * v[2]) * dv[2]]) * invsum32
            d_means[i] += d_dir

    return dict(d_rgb=d_rgb, d_mean2d=d_m2d, d_conic=d_conic,
                d_opacity=d_op, d_means=d_means, d_scales=d_scales,
                d_quats=d_quats, d_shs=d_shs)
