"""pack_small packed-step fast path vs the per-tile pallas pipeline.

The packed step (tile_kernels._packed_step) claims BIT-IDENTICAL output
to the per-tile path: per-row integer origins reproduce dx = gx - px
rounding, the segmented prefix places the same contraction terms at the
same positions, and group-masked output matmuls keep accumulation order.
These tests pin that equivalence (forward, aux, gradients) on a scene
mixing empty regions, small tiles, and dense tiles so BOTH kernel
branches execute, plus the all-empty-step constant shortcut.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saro_gs_tpu.ops.rasterize import RasterConfig, rasterize
from tests.scene_fixtures import make_camera, make_gaussians

BASE = RasterConfig(tile_x=16, tile_y=16, chunk=128, max_instances=8192,
                    max_slots=256, backend="pallas", tight_rect=True,
                    prefix="matmul", expander="pallas")


@pytest.fixture
def rng():
    return np.random.RandomState(1234)


def _mixed_scene(rng, n=60):
    """Dense cluster in one corner + sparse dots elsewhere: some grid
    steps pack (small/empty tiles), some overflow one chunk window."""
    means, scales, quats, opac, shs = make_gaussians(rng, n=n)
    means = means.copy()
    # cram the first half into a tight cluster (dense tiles > 1 chunk)
    means[: n // 2, :2] = means[: n // 2, :2] * 0.08 - 0.55
    # push a few out of frustum entirely (empty-step shortcut coverage)
    means[-4:, 2] = -5.0
    return means, scales, quats, opac, shs


def _render(cfg, cam, meta, means, scales, quats, opac, shs, bg):
    w, h = meta["width"], meta["height"]
    return rasterize(jnp.asarray(means), jnp.asarray(scales),
                     jnp.asarray(quats), jnp.asarray(opac), cam,
                     jnp.asarray(bg), width=w, height=h, sh_degree=3,
                     config=cfg, shs=jnp.asarray(shs))


def test_pack_small_forward_bit_identical(rng):
    cam, meta = make_camera()
    args = _mixed_scene(rng)
    bg = np.array([0.25, 0.1, 0.6], np.float32)
    a = _render(BASE._replace(pack_small=False), cam, meta, *args, bg)
    b = _render(BASE._replace(pack_small=True), cam, meta, *args, bg)
    np.testing.assert_array_equal(np.asarray(b.color), np.asarray(a.color))
    np.testing.assert_array_equal(np.asarray(b.depth), np.asarray(a.depth))
    np.testing.assert_array_equal(np.asarray(b.final_t),
                                  np.asarray(a.final_t))
    np.testing.assert_array_equal(np.asarray(b.n_contrib),
                                  np.asarray(a.n_contrib))


def test_pack_small_grads_match(rng):
    cam, meta = make_camera()
    means, scales, quats, opac, shs = _mixed_scene(rng, n=48)
    bg = np.array([0.0, 0.0, 0.0], np.float32)
    w, h = meta["width"], meta["height"]
    d_color = jnp.asarray(
        rng.uniform(-1, 1, (3, h, w)).astype(np.float32))

    def make_loss(cfg):
        def loss(means, scales, quats, opac, shs):
            out = rasterize(means, scales, quats, opac, cam,
                            jnp.asarray(bg), width=w, height=h,
                            sh_degree=3, config=cfg, shs=shs)
            return jnp.sum(out.color * d_color)
        return loss

    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs))
    ga = jax.grad(make_loss(BASE._replace(pack_small=False)),
                  argnums=tuple(range(5)))(*args)
    gb = jax.grad(make_loss(BASE._replace(pack_small=True)),
                  argnums=tuple(range(5)))(*args)
    for x, y in zip(ga, gb):
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_pack_small_all_offscreen(rng):
    """Every step takes the all-empty shortcut: pure background frame."""
    cam, meta = make_camera()
    means, scales, quats, opac, shs = make_gaussians(rng, n=8)
    means = means.copy()
    means[:, 2] = -5.0  # behind the camera
    bg = np.array([0.3, 0.5, 0.7], np.float32)
    out = _render(BASE._replace(pack_small=True, need_aux=False), cam,
                  meta, means, scales, quats, opac, shs, bg)
    color = np.asarray(out.color)
    assert np.allclose(color, bg[:, None, None], atol=1e-7)
    assert np.allclose(np.asarray(out.final_t), 1.0)


def test_pack_small_roll_prefix_falls_back(rng):
    """prefix='roll' statically disables packing — must still render."""
    cam, meta = make_camera()
    args = _mixed_scene(rng, n=24)
    bg = np.zeros(3, np.float32)
    a = _render(BASE._replace(prefix="roll", pack_small=True), cam, meta,
                *args, bg)
    b = _render(BASE._replace(prefix="roll", pack_small=False), cam, meta,
                *args, bg)
    np.testing.assert_array_equal(np.asarray(b.color), np.asarray(a.color))
