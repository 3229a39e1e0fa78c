"""Strip (tile-row) rendering: strips assemble to the full frame, and
per-strip gradients sum to the full-frame gradients — the invariants the
tile-sharded training step relies on (parallel/shard.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saro_gs_tpu.ops.rasterize import RasterConfig, rasterize
from tests.scene_fixtures import make_camera, make_gaussians

W, H = 64, 64
TILE = 16
GRID_Y = H // TILE


def _cfg(backend, strip_rows=0):
    return RasterConfig(tile_x=TILE, tile_y=TILE, chunk=8,
                        max_instances=8192, max_slots=256, backend=backend,
                        tight_rect=False, strip_rows=strip_rows)


@pytest.mark.parametrize("backend", ["jax", "pallas"])
@pytest.mark.parametrize("n_strip", [2, 4])
def test_strips_assemble_to_full_frame(rng, backend, n_strip):
    cam, meta = make_camera(width=W, height=H)
    means, scales, quats, opac, shs = make_gaussians(rng, n=40)
    bg = jnp.asarray([0.1, 0.3, 0.2])
    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac))
    full = rasterize(*args, cam, bg, width=W, height=H, sh_degree=3,
                     config=_cfg(backend), shs=jnp.asarray(shs))
    rows = GRID_Y // n_strip
    strips = [rasterize(*args, cam, bg, width=W, height=H, sh_degree=3,
                        config=_cfg(backend, strip_rows=rows),
                        shs=jnp.asarray(shs), row0=s * rows)
              for s in range(n_strip)]
    color = jnp.concatenate([s.color for s in strips], axis=1)
    depth = jnp.concatenate([s.depth for s in strips], axis=0)
    final_t = jnp.concatenate([s.final_t for s in strips], axis=0)
    if backend == "jax":
        # sequential scan: bit-identical regardless of buffer layout
        np.testing.assert_array_equal(np.asarray(color),
                                      np.asarray(full.color))
        np.testing.assert_array_equal(np.asarray(depth),
                                      np.asarray(full.depth))
    else:
        # pallas chunk boundaries shift with the strip buffer layout, so
        # prefix products reassociate (~1e-7 drift)
        np.testing.assert_allclose(np.asarray(color),
                                   np.asarray(full.color), atol=1e-5)
        assert np.isclose(np.asarray(depth),
                          np.asarray(full.depth)).mean() > 0.999
    np.testing.assert_allclose(np.asarray(final_t),
                               np.asarray(full.final_t), atol=1e-5)


@pytest.mark.parametrize("backend", ["jax", "pallas"])
def test_strip_grads_sum_to_full(rng, backend):
    n_strip = 2
    cam, meta = make_camera(width=W, height=H)
    means, scales, quats, opac, shs = make_gaussians(rng, n=40)
    bg = jnp.asarray([0.0, 0.1, 0.0])
    d_color = jnp.asarray(rng.normal(0, 1, (3, H, W)).astype(np.float32))
    rows = GRID_Y // n_strip

    def full_loss(m, s, q, o, sh_):
        out = rasterize(m, s, q, o, cam, bg, width=W, height=H, sh_degree=3,
                        config=_cfg(backend), shs=sh_)
        return jnp.sum(out.color * d_color)

    def strip_loss(m, s, q, o, sh_, si):
        out = rasterize(m, s, q, o, cam, bg, width=W, height=H, sh_degree=3,
                        config=_cfg(backend, strip_rows=rows), shs=sh_,
                        row0=si * rows)
        dc = jax.lax.dynamic_slice_in_dim(d_color, si * rows * TILE,
                                          rows * TILE, axis=1)
        return jnp.sum(out.color * dc)

    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs))
    gfull = jax.grad(full_loss, argnums=tuple(range(5)))(*args)
    gsum = None
    for si in range(n_strip):
        g = jax.grad(strip_loss, argnums=tuple(range(5)))(*args, si)
        gsum = g if gsum is None else jax.tree_util.tree_map(
            jnp.add, gsum, g)
    for a, b in zip(gfull, gsum):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        assert np.abs(a - b).max() / scale < 1e-5


@pytest.mark.parametrize("backend", ["jax", "pallas"])
def test_strip_handles_partial_bottom(rng, backend):
    """Image height not a multiple of strip coverage: strips cover the
    padded grid; rows beyond H are background and cropped by the caller."""
    h = 56  # grid_y = 4 tiles (padded), last tile half outside
    cam, meta = make_camera(width=W, height=h)
    means, scales, quats, opac, shs = make_gaussians(rng, n=40)
    bg = jnp.asarray([0.5, 0.5, 0.5])
    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac))
    full = rasterize(*args, cam, bg, width=W, height=h, sh_degree=3,
                     config=_cfg(backend), shs=jnp.asarray(shs))
    rows = 2
    strips = [rasterize(*args, cam, bg, width=W, height=h, sh_degree=3,
                        config=_cfg(backend, strip_rows=rows),
                        shs=jnp.asarray(shs), row0=s * rows)
              for s in range(2)]
    color = jnp.concatenate([s.color for s in strips], axis=1)[:, :h, :]
    np.testing.assert_allclose(np.asarray(color), np.asarray(full.color),
                               atol=1e-5)
