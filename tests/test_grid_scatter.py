"""Sorted-window MXU scatter (ops/grid_scatter.py) vs the XLA scatter
oracle, and the sample_mip custom VJP vs plain autodiff."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saro_gs_tpu.ops import grid_scatter, mip


def _random_taps(rng, n, total, c, span=40):
    base = rng.randint(0, total - span - 1, n).astype(np.int32)
    offs = np.sort(rng.randint(0, span, (4, n)), axis=0).astype(np.int32)
    offs[0] = 0
    cells = base[None] + offs
    weights = rng.rand(4, n).astype(np.float32)
    dfeat = rng.randn(n, c).astype(np.float32)
    return (jnp.asarray(cells), jnp.asarray(weights), jnp.asarray(dfeat))


@pytest.mark.parametrize("n,total,c", [(1000, 2048, 8), (300, 513, 16),
                                       (4096, 4096, 32)])
def test_scatter_matches_xla(rng, n, total, c):
    cells, weights, dfeat = _random_taps(rng, n, total, c)
    a = np.asarray(grid_scatter.scatter_taps_xla(cells, weights, dfeat,
                                                 total))
    b = np.asarray(grid_scatter.scatter_taps_pallas(cells, weights, dfeat,
                                                    total))
    assert a.shape == b.shape == (c, total)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)


def test_scatter_hot_cell(rng):
    """Thousands of rows hitting one cell (dense cluster) stay exact."""
    n, total, c = 3000, 1024, 8
    cells = jnp.asarray(np.full((4, n), 37, np.int32))
    weights = jnp.asarray(rng.rand(4, n).astype(np.float32))
    dfeat = jnp.asarray(rng.randn(n, c).astype(np.float32))
    a = np.asarray(grid_scatter.scatter_taps_xla(cells, weights, dfeat,
                                                 total))
    b = np.asarray(grid_scatter.scatter_taps_pallas(cells, weights, dfeat,
                                                    total))
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
@pytest.mark.parametrize("max_level", [0, 3])
def test_sample_mip_vjp_matches_autodiff(rng, monkeypatch, backend,
                                         max_level):
    """The custom grid-VJP equals autodiff through the gather impl,
    including heterogeneous per-point mip levels and border clamps."""
    monkeypatch.setenv("SARO_GRID_SCATTER", backend)
    c, h, w, n = 6, 32, 32, 500
    grid = jnp.asarray(rng.randn(c, h, w).astype(np.float32))
    coords = jnp.asarray(rng.rand(n, 2).astype(np.float32))
    # include exact-border coords (clamped duplicate taps)
    coords = coords.at[:8].set(jnp.array([[0.0, 0.0], [1.0, 1.0],
                                          [0.0, 1.0], [1.0, 0.0],
                                          [0.999, 0.5], [0.5, 0.001],
                                          [0.015, 0.985], [0.5, 0.5]]))
    level = jnp.asarray((rng.rand(n) * max_level).astype(np.float32))
    d_out = jnp.asarray(rng.randn(n, c).astype(np.float32))

    def loss_custom(g):
        return jnp.sum(mip.sample_mip(g, coords, level, max_level) * d_out)

    def loss_auto(g):
        return jnp.sum(mip._sample_mip_impl(g, coords, level, max_level)
                       * d_out)

    gc = np.asarray(jax.grad(loss_custom)(grid))
    ga = np.asarray(jax.grad(loss_auto)(grid))
    scale = np.abs(ga).max() + 1e-6
    assert np.abs(gc - ga).max() / scale < 1e-5

    # forward unchanged
    np.testing.assert_array_equal(
        np.asarray(mip.sample_mip(grid, coords, level, max_level)),
        np.asarray(mip._sample_mip_impl(grid, coords, level, max_level)))

    # coords/level gradients are zero by design (reference detaches the
    # field inputs; models/gaussians.py:165 stop-gradients the same way)
    gcoords = jax.grad(lambda cds: jnp.sum(
        mip.sample_mip(grid, cds, level, max_level) * d_out))(coords)
    assert float(jnp.abs(gcoords).max()) == 0.0


def test_field_features_grad_end_to_end(rng, monkeypatch):
    """Full hexplane field gradient: custom VJP vs autodiff oracle."""
    from saro_gs_tpu.models import field as field_mod
    monkeypatch.setenv("SARO_GRID_SCATTER", "pallas")
    cfg = field_mod.FieldConfig(resolution=(16, 16, 16, 8), out_dim=4,
                                multires=(1,))
    static = field_mod.make_static([-1.0] * 3, [1.0] * 3, 8)
    key = jax.random.PRNGKey(0)
    grids = field_mod.init_field(cfg)
    grids = jax.tree_util.tree_map(
        lambda x: jax.random.normal(key, x.shape) * 0.1, grids)
    n = 200
    pts = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    t = jnp.asarray(rng.rand(n, 1).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.01, 1.0, (n, 3)).astype(np.float32))
    d_out = jnp.asarray(rng.randn(n, cfg.feat_dim).astype(np.float32))

    def loss(g, impl):
        orig = mip.sample_mip
        if impl == "auto":
            # monkeypatch at the call level: route through the raw impl
            monkey = lambda *a: mip._sample_mip_impl(*a)  # noqa: E731
            mip_sample, mip.sample_mip = mip.sample_mip, monkey
            try:
                out = field_mod.field_features(g, cfg, static, pts, t,
                                               scales)
            finally:
                mip.sample_mip = mip_sample
        else:
            out = field_mod.field_features(g, cfg, static, pts, t, scales)
        return jnp.sum(out * d_out)

    gc = jax.grad(lambda g: loss(g, "custom"))(grids)
    ga = jax.grad(lambda g: loss(g, "auto"))(grids)
    for pc, pa in zip(jax.tree_util.tree_leaves(gc),
                      jax.tree_util.tree_leaves(ga)):
        pc, pa = np.asarray(pc), np.asarray(pa)
        scale = np.abs(pa).max() + 1e-6
        assert np.abs(pc - pa).max() / scale < 1e-5
