import numpy as np
import jax.numpy as jnp

from saro_gs_tpu.ops import math3d, sh
from tests.oracle import raster_oracle as oracle
from tests.scene_fixtures import make_camera, make_gaussians


def test_world_to_view_roundtrip():
    R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=float)
    t = np.array([0.3, -0.2, 2.0])
    m = math3d.world_to_view_matrix(R, t)
    # camera center maps to origin
    c2w = np.linalg.inv(m.astype(np.float64))
    center = c2w[3, :3]
    out = math3d.transform_point_4x3(jnp.asarray(center), jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)


def test_cov3d_matches_oracle(rng):
    _, scales, quats, _, _ = make_gaussians(rng, n=16)
    ours = np.asarray(math3d.build_cov3d(jnp.asarray(scales), 1.0,
                                         jnp.asarray(quats)))
    for i in range(16):
        ref = oracle._cov3d(scales[i].astype(float), 1.0,
                            quats[i].astype(float))
        # ops run in f32; the oracle in f64 — allow f32 rounding headroom
        np.testing.assert_allclose(ours[i], ref, rtol=5e-3, atol=5e-4)


def test_cov2d_matches_oracle(rng):
    cam, meta = make_camera()
    means, scales, quats, _, _ = make_gaussians(rng, n=16)
    c6 = math3d.build_cov3d(jnp.asarray(scales), 1.0, jnp.asarray(quats))
    fx = meta["width"] / (2 * meta["tanfovx"])
    fy = meta["height"] / (2 * meta["tanfovy"])
    ours = np.asarray(math3d.compute_cov2d(
        jnp.asarray(means), fx, fy, meta["tanfovx"], meta["tanfovy"], c6,
        jnp.asarray(cam.viewmat)))
    for i in range(16):
        ref = oracle._cov2d(means[i].astype(float), fx, fy, meta["tanfovx"],
                            meta["tanfovy"], np.asarray(c6)[i].astype(float),
                            cam.viewmat.astype(float))
        # f32 vs f64 oracle: verified exact in f64; f32 cancellation in
        # T^T V T leaves ~4e-3 relative noise (the CUDA kernel is f32 too)
        np.testing.assert_allclose(ours[i], ref, rtol=1e-2, atol=5e-3)


def test_sh_basis_matches_oracle(rng):
    dirs = rng.normal(0, 1, (32, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    for deg in range(4):
        ours = np.asarray(sh.sh_basis(deg, jnp.asarray(dirs)))
        for i in range(8):
            ref = oracle._sh_basis(deg, dirs[i])
            np.testing.assert_allclose(ours[i], ref, rtol=1e-5, atol=1e-6)


def test_sh_color_clamp(rng):
    cam, _ = make_camera()
    means, _, _, _, shs = make_gaussians(rng, n=32)
    shs[:, 0] -= 1.5  # force some clamping
    rgb, clamped = sh.eval_sh_color(3, jnp.asarray(shs), jnp.asarray(means),
                                    jnp.asarray(cam.campos))
    rgb = np.asarray(rgb)
    clamped = np.asarray(clamped)
    assert clamped.any() and (~clamped).any()
    assert (rgb[clamped] == 0).all()
    assert (rgb >= 0).all()


def test_projection_matrix_against_reference_form():
    import math
    fovx, fovy = math.radians(70), math.radians(50)
    P = math3d.projection_matrix(0.01, 100.0, fovx, fovy).astype(np.float64)
    # row-vector: [x,y,z,1] @ P; a point on the optical axis at znear maps to
    # NDC z = computed by the reference's (zfar+znear)/(zfar-znear) variant
    p = np.array([0.0, 0.0, 0.01, 1.0]) @ P
    assert abs(p[3] - 0.01) < 1e-9
    z_ndc = p[2] / p[3]
    # z(znear) = (f+n)/(f-n) - fn/((f-n) n) = (f+n)/(f-n) - f/(f-n) = n/(f-n)
    # (matrix entries are f32; cancellation leaves ~1e-8 noise)
    np.testing.assert_allclose(z_ndc, 0.01 / 99.99, atol=1e-7)
