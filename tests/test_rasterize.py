"""Golden-value tests of the JAX rasterizer against the NumPy oracle.

Strict parity runs in float64 (where the implementation matches the oracle to
~1e-8); float32 smoke tests bound the production-precision drift.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saro_gs_tpu.ops import binning, projection
from saro_gs_tpu.ops.projection import CameraParams
from saro_gs_tpu.ops.rasterize import RasterConfig, rasterize
from tests.oracle import raster_oracle as oracle
from tests.scene_fixtures import make_camera, make_gaussians

CFG = RasterConfig(tile_x=16, tile_y=16, chunk=8, max_instances=4096, tight_rect=False,
                   max_slots=128)


def _oracle_render(cam, meta, means, scales, quats, opac, shs, bg,
                   use_sh=True, sh_degree=3):
    w, h = meta["width"], meta["height"]
    return oracle.oracle_render(
        means.astype(float), scales.astype(float), quats.astype(float),
        opac.astype(float), np.asarray(cam.viewmat, float),
        np.asarray(cam.projmat, float), np.asarray(cam.campos, float), w, h,
        meta["tanfovx"], meta["tanfovy"], np.asarray(bg, float),
        sh_degree=sh_degree, shs=shs.astype(float) if use_sh else None,
        colors_precomp=None if use_sh else np.abs(shs[:, 0]).astype(float))


def _as64(cam):
    return CameraParams(*[jnp.asarray(np.asarray(x), jnp.float64)
                          for x in cam])


def _render64(cam, meta, means, scales, quats, opac, shs, bg, use_sh=True,
              sh_degree=3, cfg=CFG):
    w, h = meta["width"], meta["height"]
    f = jnp.float64
    return rasterize(
        jnp.asarray(means, f), jnp.asarray(scales, f), jnp.asarray(quats, f),
        jnp.asarray(opac, f), _as64(cam), jnp.asarray(bg, f), width=w,
        height=h, sh_degree=sh_degree, config=cfg,
        shs=jnp.asarray(shs, f) if use_sh else None,
        colors_precomp=None if use_sh else jnp.abs(jnp.asarray(shs[:, 0], f)))


def test_forward_matches_oracle_x64(rng):
    cam, meta = make_camera()
    means, scales, quats, opac, shs = make_gaussians(rng, n=40)
    bg = np.zeros(3)
    ref = _oracle_render(cam, meta, means, scales, quats, opac, shs, bg)
    with jax.enable_x64():
        out = _render64(cam, meta, means, scales, quats, opac, shs, bg)
        np.testing.assert_allclose(np.asarray(out.color), ref["color"],
                                   atol=1e-7)
        np.testing.assert_array_equal(np.asarray(out.radii), ref["radii"])
        np.testing.assert_allclose(np.asarray(out.final_t), ref["final_t"],
                                   atol=1e-7)
        np.testing.assert_array_equal(np.asarray(out.n_contrib),
                                      ref["n_contrib"])
        np.testing.assert_allclose(np.asarray(out.depth), ref["depth"],
                                   atol=1e-7)


def test_forward_colors_precomp_x64(rng):
    cam, meta = make_camera()
    means, scales, quats, opac, shs = make_gaussians(rng, n=40)
    bg = np.array([1.0, 0.5, 0.25])
    ref = _oracle_render(cam, meta, means, scales, quats, opac, shs, bg,
                         use_sh=False)
    with jax.enable_x64():
        out = _render64(cam, meta, means, scales, quats, opac, shs, bg,
                        use_sh=False)
        np.testing.assert_allclose(np.asarray(out.color), ref["color"],
                                   atol=1e-7)


def test_forward_f32_drift(rng):
    """Production dtype: drift vs the f64 oracle stays visually negligible."""
    cam, meta = make_camera()
    means, scales, quats, opac, shs = make_gaussians(rng, n=40)
    bg = np.zeros(3, np.float32)
    ref = _oracle_render(cam, meta, means, scales, quats, opac, shs, bg)
    w, h = meta["width"], meta["height"]
    out = rasterize(jnp.asarray(means), jnp.asarray(scales),
                    jnp.asarray(quats), jnp.asarray(opac), cam,
                    jnp.asarray(bg), width=w, height=h, sh_degree=3,
                    config=CFG, shs=jnp.asarray(shs))
    err = np.abs(np.asarray(out.color) - ref["color"]).max()
    assert err < 0.05, err  # ~1e-2 typical: f32 conic/alpha rounding
    assert (np.asarray(out.radii) == ref["radii"]).all()


def test_binning_layout(rng):
    cam, meta = make_camera()
    means, scales, quats, opac, shs = make_gaussians(rng, n=40)
    w, h = meta["width"], meta["height"]
    pre = projection.preprocess(jnp.asarray(means), jnp.asarray(scales),
                                jnp.asarray(quats), jnp.asarray(opac), cam,
                                w, h, 16, 16, sh_degree=3,
                                shs=jnp.asarray(shs))
    gx, gy = (w + 15) // 16, (h + 15) // 16
    bins = binning.bin_gaussians(pre, gx, gy, 4096, 8)
    pl = np.asarray(bins.point_list)
    start = np.asarray(bins.tile_start)
    count = np.asarray(bins.tile_count)
    depth = np.asarray(pre.depth)
    assert int(bins.num_dropped) == 0

    ref = _oracle_render(cam, meta, means, scales, quats, opac, shs,
                         np.zeros(3))
    for t in range(gx * gy):
        ids = pl[start[t]:start[t] + count[t]]
        assert (ids >= 0).all()
        ref_ids = ref["per_tile"].get(t, [])
        assert sorted(ids.tolist()) == sorted(ref_ids)
        d = depth[ids]
        assert (np.diff(d) >= 0).all()
        # padding slots after the range are -1 up to the chunk boundary
        pad_end = start[t] + ((count[t] + 7) // 8) * 8
        assert (pl[start[t] + count[t]:pad_end] == -1).all()


def test_backward_matches_oracle_x64(rng):
    cam, meta = make_camera()
    means, scales, quats, opac, shs = make_gaussians(rng, n=40)
    bg = np.zeros(3)
    w, h = meta["width"], meta["height"]
    ref = _oracle_render(cam, meta, means, scales, quats, opac, shs, bg)
    d_color = rng.normal(0, 1, (3, h, w))

    gref = oracle.oracle_backward(
        ref, means.astype(float), scales.astype(float), quats.astype(float),
        opac.astype(float), np.asarray(cam.viewmat, float),
        np.asarray(cam.projmat, float), np.asarray(cam.campos, float), w, h,
        meta["tanfovx"], meta["tanfovy"], np.asarray(bg, float),
        d_color.astype(float), sh_degree=3, shs=shs.astype(float))

    with jax.enable_x64():
        cam64 = _as64(cam)
        dcol = jnp.asarray(d_color, jnp.float64)

        def loss_fn(means_, scales_, quats_, opac_, shs_, dummy):
            o = rasterize(means_, scales_, quats_, opac_, cam64,
                          jnp.asarray(bg, jnp.float64), width=w, height=h,
                          sh_degree=3, config=CFG, shs=shs_,
                          mean2d_dummy=dummy)
            return jnp.sum(o.color * dcol)

        f = jnp.float64
        grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5))(
            jnp.asarray(means, f), jnp.asarray(scales, f),
            jnp.asarray(quats, f), jnp.asarray(opac, f), jnp.asarray(shs, f),
            jnp.zeros((means.shape[0], 2), f))

    names = ["d_means", "d_scales", "d_quats", "d_opacity", "d_shs",
             "d_mean2d"]
    for g, name in zip(grads, names):
        r = gref[name]
        g = np.asarray(g).reshape(r.shape)
        scale = np.abs(r).max() + 1e-8
        err = np.abs(g - r).max() / scale
        # oracle uses fd for quat/scale/sh-dir chains -> ~1e-6 fd noise
        assert err < 1e-4, f"{name}: rel err {err}"


def test_finite_difference_grads_x64(rng):
    """Independent check: directional FD of the full rasterize loss."""
    cam, meta = make_camera(width=32, height=32)
    means, scales, quats, opac, shs = make_gaussians(rng, n=12)
    w, h = meta["width"], meta["height"]
    key = np.random.RandomState(0)
    wgt = key.normal(0, 1, (3, h, w))

    with jax.enable_x64():
        f = jnp.float64
        cam64 = _as64(cam)
        wgt64 = jnp.asarray(wgt, f)
        bg = jnp.zeros(3, f)

        def loss(means_):
            o = rasterize(means_, jnp.asarray(scales, f),
                          jnp.asarray(quats, f), jnp.asarray(opac, f), cam64,
                          bg, width=w, height=h, sh_degree=3, config=CFG,
                          shs=jnp.asarray(shs, f))
            return jnp.sum(o.color * wgt64)

        g = np.asarray(jax.grad(loss)(jnp.asarray(means, f)))
        v = key.normal(0, 1, means.shape)
        v /= np.linalg.norm(v)
        eps = 1e-5
        fd = (float(loss(jnp.asarray(means + eps * v, f)))
              - float(loss(jnp.asarray(means - eps * v, f)))) / (2 * eps)
        an = float((g * v).sum())
    assert abs(fd - an) / (abs(fd) + abs(an) + 1e-8) < 1e-5, (fd, an)


def test_overflow_detection(rng):
    cam, meta = make_camera()
    means, scales, quats, opac, shs = make_gaussians(rng, n=40)
    cfg = RasterConfig(tile_x=16, tile_y=16, chunk=8, max_instances=16,
                       max_slots=32)
    out = rasterize(jnp.asarray(means), jnp.asarray(scales),
                    jnp.asarray(quats), jnp.asarray(opac), cam,
                    jnp.zeros(3), width=meta["width"], height=meta["height"],
                    sh_degree=3, config=cfg, shs=jnp.asarray(shs))
    assert int(out.num_dropped) > 0


def test_active_mask(rng):
    cam, meta = make_camera()
    means, scales, quats, opac, shs = make_gaussians(rng, n=40)
    w, h = meta["width"], meta["height"]
    active = np.ones(40, np.float32)
    active[20:] = 0.0
    out_masked = rasterize(jnp.asarray(means), jnp.asarray(scales),
                           jnp.asarray(quats), jnp.asarray(opac), cam,
                           jnp.zeros(3), width=w, height=h, sh_degree=3,
                           config=CFG, shs=jnp.asarray(shs),
                           active=jnp.asarray(active))
    out_sub = rasterize(jnp.asarray(means[:20]), jnp.asarray(scales[:20]),
                        jnp.asarray(quats[:20]), jnp.asarray(opac[:20]), cam,
                        jnp.zeros(3), width=w, height=h, sh_degree=3,
                        config=CFG, shs=jnp.asarray(shs[:20]))
    np.testing.assert_allclose(np.asarray(out_masked.color),
                               np.asarray(out_sub.color), atol=1e-6)
    assert (np.asarray(out_masked.radii)[20:] == 0).all()


def test_jit_and_grad_compile(rng):
    """The full rasterize (fwd+bwd) is jit-compilable with static config."""
    cam, meta = make_camera(width=32, height=32)
    means, scales, quats, opac, shs = make_gaussians(rng, n=16)
    w, h = meta["width"], meta["height"]

    @jax.jit
    def step(m, s, q, o, sh_):
        def loss(m, s, q, o, sh_):
            out = rasterize(m, s, q, o, cam, jnp.zeros(3), width=w, height=h,
                            sh_degree=3, config=CFG, shs=sh_)
            return jnp.mean(out.color ** 2)
        return jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
            m, s, q, o, sh_)

    val, grads = step(jnp.asarray(means), jnp.asarray(scales),
                      jnp.asarray(quats), jnp.asarray(opac),
                      jnp.asarray(shs))
    assert np.isfinite(float(val))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
