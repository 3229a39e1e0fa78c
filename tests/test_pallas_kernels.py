"""Pallas fast-path vs pure-JAX reference path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from saro_gs_tpu.ops.rasterize import RasterConfig, rasterize
from tests.scene_fixtures import make_camera, make_gaussians

CFG_JAX = RasterConfig(tile_x=16, tile_y=16, chunk=128, max_instances=4096,
                       max_slots=256, backend="jax", tight_rect=False)
CFG_PALLAS = CFG_JAX._replace(backend="pallas")


def _render(cfg, cam, meta, means, scales, quats, opac, shs, bg):
    w, h = meta["width"], meta["height"]
    return rasterize(jnp.asarray(means), jnp.asarray(scales),
                     jnp.asarray(quats), jnp.asarray(opac), cam,
                     jnp.asarray(bg), width=w, height=h, sh_degree=3,
                     config=cfg, shs=jnp.asarray(shs))


def test_pallas_forward_matches_jax(rng):
    cam, meta = make_camera()
    means, scales, quats, opac, shs = make_gaussians(rng, n=40)
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    a = _render(CFG_JAX, cam, meta, means, scales, quats, opac, shs, bg)
    b = _render(CFG_PALLAS, cam, meta, means, scales, quats, opac, shs, bg)
    # prefix-product reassociation causes ~1e-6 fp drift vs sequential scan
    np.testing.assert_allclose(np.asarray(b.color), np.asarray(a.color),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.final_t), np.asarray(a.final_t),
                               rtol=1e-4, atol=1e-6)
    assert (np.asarray(b.n_contrib) == np.asarray(a.n_contrib)).mean() > 0.999
    assert np.isclose(np.asarray(b.depth), np.asarray(a.depth)).mean() > 0.999


def test_pallas_backward_matches_jax(rng):
    cam, meta = make_camera()
    means, scales, quats, opac, shs = make_gaussians(rng, n=40)
    bg = np.array([0.3, 0.1, 0.0], np.float32)
    w, h = meta["width"], meta["height"]
    d_color = jnp.asarray(rng.normal(0, 1, (3, h, w)).astype(np.float32))

    def make_loss(cfg):
        def loss(m, s, q, o, sh_, dummy):
            out = rasterize(m, s, q, o, cam, jnp.asarray(bg), width=w,
                            height=h, sh_degree=3, config=cfg, shs=sh_,
                            mean2d_dummy=dummy)
            return jnp.sum(out.color * d_color)
        return loss

    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs),
            jnp.zeros((means.shape[0], 2), jnp.float32))
    ga = jax.grad(make_loss(CFG_JAX), argnums=tuple(range(6)))(*args)
    gb = jax.grad(make_loss(CFG_PALLAS), argnums=tuple(range(6)))(*args)
    names = ["means", "scales", "quats", "opac", "shs", "mean2d"]
    for x, y, name in zip(ga, gb, names):
        x, y = np.asarray(x), np.asarray(y)
        scale = np.abs(x).max() + 1e-6
        err = np.abs(x - y).max() / scale
        assert err < 1e-3, f"{name}: rel err {err}"


def test_tight_rect_color_exact_grads_reassoc(rng):
    """Opacity-aware per-axis rects + corner culling drop only
    zero-contribution instances: rendered COLOR/depth/final_t are
    identical (atol 1e-6) to the reference 3-sigma-circle rects.
    GRADIENTS are only reassociation-level equal (rtol 1e-4/atol 1e-5):
    tight changes per-tile instance counts, so chunk-boundary prefix
    carries and moment recombination round differently — culled
    instances still contribute exactly zero."""
    cam, meta = make_camera()
    means, scales, quats, opac, shs = make_gaussians(rng, n=40)
    # include low-opacity splats where the tight rect shrinks hard
    opac = opac.copy()
    opac[::3] = 0.02
    opac[::7] = 0.003  # below 1/255: culled entirely, contributes nothing
    bg = np.array([0.2, 0.1, 0.4], np.float32)
    loose = CFG_PALLAS
    tight = CFG_PALLAS._replace(tight_rect=True)
    a = _render(loose, cam, meta, means, scales, quats, opac, shs, bg)
    b = _render(tight, cam, meta, means, scales, quats, opac, shs, bg)
    np.testing.assert_allclose(np.asarray(b.color), np.asarray(a.color),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.depth), np.asarray(a.depth),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.final_t), np.asarray(a.final_t),
                               atol=1e-6)
    assert int(b.num_instances) < int(a.num_instances)

    w, h = meta["width"], meta["height"]
    d_color = jnp.asarray(rng.normal(0, 1, (3, h, w)).astype(np.float32))

    def make_loss(cfg):
        def loss(m, s, q, o, sh_):
            out = rasterize(m, s, q, o, cam, jnp.asarray(bg), width=w,
                            height=h, sh_degree=3, config=cfg, shs=sh_)
            return jnp.sum(out.color * d_color)
        return loss

    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs))
    ga = jax.grad(make_loss(loose), argnums=tuple(range(5)))(*args)
    gb = jax.grad(make_loss(tight), argnums=tuple(range(5)))(*args)
    # grads are reassociation-level only: culled instances contribute
    # exactly zero, but tight changes per-tile instance COUNTS, so chunk
    # boundaries (prefix carry cuts, moment recombination) round
    # differently — ~1e-6 absolute, far under the 1e-3 oracle gate
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=1e-4, atol=1e-5)


def test_packed_payloads_visually_lossless(rng):
    """packed=True quantizes conic/opacity/rg to bf16 in the sort payloads
    (depth key stays f32 -> identical composite order): the render must
    stay visually indistinguishable from the exact path."""
    cam, meta = make_camera()
    means, scales, quats, opac, shs = make_gaussians(rng, n=40)
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    exact = CFG_PALLAS._replace(tight_rect=True)
    packed = exact._replace(packed=True)
    a = _render(exact, cam, meta, means, scales, quats, opac, shs, bg)
    b = _render(packed, cam, meta, means, scales, quats, opac, shs, bg)
    ca, cb = np.asarray(a.color), np.asarray(b.color)
    assert np.abs(ca - cb).max() < 0.02, np.abs(ca - cb).max()
    mse = float(np.mean((ca - cb) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 45.0, psnr


def test_packed_payload_gradients_bounded(rng):
    """packed=True must not just render close — its *gradients* (what
    training actually consumes; the shipped config trains packed) must
    track the exact path within bf16 quantization error.  Bounds the
    convergence risk of training with packed sort payloads."""
    cam, meta = make_camera()
    means, scales, quats, opac, shs = make_gaussians(rng, n=40)
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    w, h = meta["width"], meta["height"]
    d_color = jnp.asarray(rng.normal(0, 1, (3, h, w)).astype(np.float32))

    def make_loss(cfg):
        def loss(m, s, q, o, sh_):
            out = rasterize(m, s, q, o, cam, jnp.asarray(bg), width=w,
                            height=h, sh_degree=3, config=cfg, shs=sh_)
            return jnp.sum(out.color * d_color)
        return loss

    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs))
    exact = CFG_PALLAS._replace(tight_rect=True)
    ga = jax.grad(make_loss(exact), argnums=tuple(range(5)))(*args)
    gb = jax.grad(make_loss(exact._replace(packed=True)),
                  argnums=tuple(range(5)))(*args)
    names = ["means", "scales", "quats", "opac", "shs"]
    for x, y, name in zip(ga, gb, names):
        x, y = np.asarray(x), np.asarray(y)
        scale = np.abs(x).max() + 1e-6
        err = np.abs(x - y).max() / scale
        # bf16 mantissa is 8 bits (~2-3 decimal digits); attribute
        # quantization perturbs alpha/color products roughly linearly
        assert err < 3e-2, f"{name}: rel err {err}"
        # direction must agree: cosine similarity of the flattened grads
        cos = float((x * y).sum() /
                    (np.linalg.norm(x) * np.linalg.norm(y) + 1e-12))
        assert cos > 0.999, f"{name}: cosine {cos}"


def test_pallas_expander_bit_identical(rng):
    """The windowed one-hot-matmul expansion kernel must reproduce the
    merge-spread sort expansion bit-for-bit (same instances, same order,
    same attribute bits) — for both exact and packed payloads."""
    cam, meta = make_camera()
    means, scales, quats, opac, shs = make_gaussians(rng, n=40)
    bg = np.array([0.2, 0.0, 0.5], np.float32)
    for pk in (False, True):
        a = _render(CFG_PALLAS._replace(tight_rect=True, packed=pk),
                    cam, meta, means, scales, quats, opac, shs, bg)
        b = _render(CFG_PALLAS._replace(tight_rect=True, packed=pk,
                                        expander="pallas"),
                    cam, meta, means, scales, quats, opac, shs, bg)
        np.testing.assert_array_equal(np.asarray(a.color),
                                      np.asarray(b.color))
        np.testing.assert_array_equal(np.asarray(a.depth),
                                      np.asarray(b.depth))
        np.testing.assert_array_equal(np.asarray(a.n_contrib),
                                      np.asarray(b.n_contrib))


def test_pallas_expander_grads_match(rng):
    """Backward through the pallas-expanded path equals the sort path."""
    cam, meta = make_camera()
    means, scales, quats, opac, shs = make_gaussians(rng, n=40)
    bg = np.zeros(3, np.float32)
    w, h = meta["width"], meta["height"]
    d_color = jnp.asarray(rng.normal(0, 1, (3, h, w)).astype(np.float32))

    def make_loss(cfg):
        def loss(m, s, q, o, sh_):
            out = rasterize(m, s, q, o, cam, jnp.asarray(bg), width=w,
                            height=h, sh_degree=3, config=cfg, shs=sh_)
            return jnp.sum(out.color * d_color)
        return loss

    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs))
    ga = jax.grad(make_loss(CFG_PALLAS), argnums=tuple(range(5)))(*args)
    gb = jax.grad(make_loss(CFG_PALLAS._replace(expander="pallas")),
                  argnums=tuple(range(5)))(*args)
    for x, y in zip(ga, gb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_need_aux_false_forward_only(rng):
    """need_aux=False skips n_contrib bookkeeping: color/depth/final_t
    identical to the default config; gradients raise at trace time."""
    import pytest
    cam, meta = make_camera()
    means, scales, quats, opac, shs = make_gaussians(rng, n=40)
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    a = _render(CFG_PALLAS, cam, meta, means, scales, quats, opac, shs, bg)
    cfg = CFG_PALLAS._replace(need_aux=False)
    b = _render(cfg, cam, meta, means, scales, quats, opac, shs, bg)
    np.testing.assert_array_equal(np.asarray(b.color), np.asarray(a.color))
    np.testing.assert_array_equal(np.asarray(b.depth), np.asarray(a.depth))
    np.testing.assert_array_equal(np.asarray(b.final_t),
                                  np.asarray(a.final_t))
    assert int(np.asarray(b.n_contrib).max()) == 0

    w, h = meta["width"], meta["height"]

    def loss(m):
        out = rasterize(m, jnp.asarray(scales), jnp.asarray(quats),
                        jnp.asarray(opac), cam, jnp.asarray(bg), width=w,
                        height=h, sh_degree=3, config=cfg,
                        shs=jnp.asarray(shs))
        return jnp.sum(out.color)

    with pytest.raises(ValueError, match="forward-only"):
        jax.grad(loss)(jnp.asarray(means))


def test_alpha_matmul_forward_and_grads(rng):
    """alpha_matmul: the [K,6]@[6,P] quadratic contraction vs the exact
    dx/dy arithmetic (tile_kernels._chunk_alpha_mm).  Tile-local
    coordinates keep the expansion well-conditioned; only inclusion
    thresholds (power<=eps, alpha>=1/255) can tie-flip."""
    cam, meta = make_camera()
    means, scales, quats, opac, shs = make_gaussians(rng, n=60)
    bg = np.array([0.2, 0.1, 0.4], np.float32)
    w, h = meta["width"], meta["height"]
    cfg0 = CFG_PALLAS._replace(tile_x=32, tile_y=32, tight_rect=True)
    cfg1 = cfg0._replace(alpha_matmul=True)
    a = _render(cfg0, cam, meta, means, scales, quats, opac, shs, bg)
    b = _render(cfg1, cam, meta, means, scales, quats, opac, shs, bg)
    assert np.abs(np.asarray(b.color) - np.asarray(a.color)).max() < 2e-3
    assert np.isclose(np.asarray(b.depth), np.asarray(a.depth)).mean() > 0.995

    d_color = jnp.asarray(rng.normal(0, 1, (3, h, w)).astype(np.float32))

    def make_loss(cfg):
        def loss(m, s, q, o, sh_):
            out = rasterize(m, s, q, o, cam, jnp.asarray(bg), width=w,
                            height=h, sh_degree=3, config=cfg, shs=sh_)
            return jnp.sum(out.color * d_color)
        return loss

    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs))
    ga = jax.grad(make_loss(cfg0), argnums=tuple(range(5)))(*args)
    gb = jax.grad(make_loss(cfg1), argnums=tuple(range(5)))(*args)
    for x, y, name in zip(ga, gb, ["means", "scales", "quats", "opac",
                                   "shs"]):
        x, y = np.asarray(x), np.asarray(y)
        err = np.abs(x - y).max() / (np.abs(x).max() + 1e-6)
        assert err < 2e-2, f"{name}: rel err {err}"


def test_needle_splat_packed_grads_finite(rng):
    """Regression: a near-singular needle splat's conic can go INDEFINITE
    under bf16 payload packing (det < 0 observed on a real checkpoint);
    without the reference's power>0 skip guard (forward.cu:310) the
    backward replay overflows exp(power) into NaN geometry gradients
    while color gradients stay finite.  All grads must be finite and the
    forward must stay finite in every prefix/packing combination."""
    cam, meta = make_camera()
    means, scales, quats, opac, shs = make_gaussians(rng, n=24)
    scales = scales.copy()
    # extreme needles: one huge axis, two collapsed (vary orientation)
    scales[::3] = np.array([2.0, 1e-6, 1e-6], np.float32)
    scales[1::3] = np.array([1e-6, 3.0, 1e-7], np.float32)
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    w, h = meta["width"], meta["height"]
    d_color = jnp.asarray(rng.uniform(-1, 1, (3, h, w)).astype(np.float32))
    for prefix, packed in (("matmul", True), ("matmul", False),
                           ("roll", True)):
        cfg = CFG_PALLAS._replace(prefix=prefix, packed=packed,
                                  tight_rect=True, expander="pallas")

        def loss(means, scales, quats, opac, shs, cfg=cfg):
            out = rasterize(means, scales, quats, opac, cam,
                            jnp.asarray(bg), width=w, height=h,
                            sh_degree=3, config=cfg, shs=shs)
            return jnp.sum(out.color * d_color), out.color

        (val, color), grads = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3, 4), has_aux=True)(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs))
        assert np.isfinite(np.asarray(color)).all(), (prefix, packed)
        for g in grads:
            assert np.isfinite(np.asarray(g)).all(), (prefix, packed)
