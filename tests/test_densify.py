"""Tests for capacity-padded densification / pruning."""
import jax
import jax.numpy as jnp
import numpy as np

from saro_gs_tpu.models import densify, gaussians as gm
from saro_gs_tpu.ops import math3d


def _mk(rng, n=10, cap=32):
    cfg = gm.ModelConfig()
    pcd = gm.PointCloud(points=rng.uniform(-1, 1, (n, 3)),
                        colors=rng.uniform(0, 1, (n, 3)))
    params, alive = gm.create_from_pcd(jax.random.PRNGKey(0), pcd, cap, cfg)
    mu = jax.tree_util.tree_map(jnp.zeros_like, params)
    nu = jax.tree_util.tree_map(jnp.zeros_like, params)
    return cfg, params, alive, mu, nu


def test_add_stats(rng):
    aux = densify.init_aux(8)
    g = jnp.asarray(rng.uniform(0, 1, 8).astype(np.float32))
    vis = jnp.asarray([True, False] * 4)
    radii = jnp.asarray(rng.randint(0, 20, 8), jnp.int32)
    aux = densify.add_stats(aux, g, vis, radii)
    a = np.asarray(aux.xyz_grad_accum[:, 0])
    np.testing.assert_allclose(a, np.where(np.asarray(vis), np.asarray(g), 0))
    assert (np.asarray(aux.denom[:, 0]) == np.asarray(vis)).all()
    assert (np.asarray(aux.max_radii2d)[~np.asarray(vis)] == 0).all()


def test_reset_opacity(rng):
    _, params, alive, mu, nu = _mk(rng)
    mu = mu._replace(opacity=jnp.ones_like(mu.opacity))
    params2, mu2, nu2 = densify.reset_opacity(params, mu, nu)
    op = np.asarray(gm.get_opacity(params2))
    assert (op <= 0.01 + 1e-6).all()
    assert (np.asarray(mu2.opacity) == 0).all()
    # other moments untouched
    assert (np.asarray(mu2.xyz) == np.asarray(mu.xyz)).all()


def test_clone_and_split(rng):
    cfg, params, alive, mu, nu = _mk(rng, n=10, cap=64)
    cap = 64
    aux = densify.init_aux(cap)
    # force: point 0 clones (small scale), point 1 splits (large scale)
    grads = jnp.zeros((cap, 1)).at[0, 0].set(1.0).at[1, 0].set(1.0)
    denom = jnp.zeros((cap, 1)).at[0, 0].set(1.0).at[1, 0].set(1.0)
    aux = aux._replace(xyz_grad_accum=grads, denom=denom)
    params = params._replace(
        scaling=params.scaling.at[0].set(jnp.log(0.001)).at[1].set(
            jnp.log(1.0)))
    integral = jnp.ones((cap, 1))
    res = densify.densify_pruneclone(
        params, mu, nu, alive, aux, jax.random.PRNGKey(1),
        grad_threshold=0.5, min_opacity=0.005, extent=1.0,
        percent_dense=0.01, max_screen_size=None,
        inv_integral=jnp.ones((cap, 1)), integral=integral,
        min_intergral=0.0, prune_z=False, prune_big_ws=False)
    assert int(res.n_cloned) == 1
    assert int(res.n_split) == 1
    assert not bool(res.overflowed)
    n_before = int(np.asarray(alive).sum())
    n_after = int(np.asarray(res.alive).sum())
    # clone adds 1; split adds net 1 (parent replaced + 1 child slot)
    assert n_after == n_before + 2
    # clone slot is a copy of row 0
    dest = 10  # first dead slot
    np.testing.assert_allclose(np.asarray(res.params.xyz[dest]),
                               np.asarray(params.xyz[0]))
    # split scaling shrank by 1.6x
    np.testing.assert_allclose(np.asarray(res.params.scaling[1]),
                               np.asarray(params.scaling[1]) - np.log(1.6),
                               atol=1e-5)
    # stats reset
    assert (np.asarray(res.aux.denom) == 0).all()


def test_prune_by_opacity_and_integral(rng):
    cfg, params, alive, mu, nu = _mk(rng, n=10, cap=32)
    aux = densify.init_aux(32)
    params = params._replace(
        opacity=params.opacity.at[3].set(math3d.inverse_sigmoid(0.001)))
    integral = jnp.ones((32, 1)).at[5, 0].set(0.0001)
    res = densify.densify_pruneclone(
        params, mu, nu, alive, aux, jax.random.PRNGKey(1),
        grad_threshold=10.0, min_opacity=0.005, extent=1.0,
        percent_dense=0.01, max_screen_size=None,
        inv_integral=jnp.ones((32, 1)), integral=integral,
        min_intergral=0.01, prune_z=False, prune_big_ws=False)
    a = np.asarray(res.alive)
    assert a[3] == 0 and a[5] == 0
    assert int(a.sum()) == 8


def test_overflow_reported(rng):
    cfg, params, alive, mu, nu = _mk(rng, n=10, cap=11)
    aux = densify.init_aux(11)
    aux = aux._replace(xyz_grad_accum=jnp.ones((11, 1)),
                       denom=jnp.ones((11, 1)))
    res = densify.densify_pruneclone(
        params, mu, nu, alive, aux, jax.random.PRNGKey(1),
        grad_threshold=0.0, min_opacity=0.005, extent=1.0,
        percent_dense=10.0, max_screen_size=None,
        inv_integral=jnp.ones((11, 1)), integral=jnp.ones((11, 1)),
        min_intergral=0.0, prune_z=False, prune_big_ws=False)
    assert bool(res.overflowed)


def test_integral_prune_and_lr(rng):
    alive = jnp.ones(8).at[7].set(0.0)
    integral = jnp.asarray(
        [[0.5], [0.25], [0.05], [1.0], [0.5], [0.5], [0.005], [0.9]])
    alive2, inv = densify.integral_prune_and_lr(alive, integral, 0.01)
    a = np.asarray(alive2)
    assert a[6] == 0 and a[7] == 0 and a[0] == 1
    iv = np.asarray(inv[:, 0])
    np.testing.assert_allclose(iv[3], 1.0)        # max integral -> min inv
    np.testing.assert_allclose(iv[0], 2.0)
    np.testing.assert_allclose(iv[1], 4.0)
    np.testing.assert_allclose(iv[6], 1.0)        # pruned rows neutral
