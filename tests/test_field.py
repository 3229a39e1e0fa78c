"""Tests for mip sampling and the scale-aware residual field."""
import jax
import jax.numpy as jnp
import numpy as np

from saro_gs_tpu.models import field as field_mod
from saro_gs_tpu.models import gaussians as gm
from saro_gs_tpu.ops import mip


def _np_bilinear(grid, u, v):
    c, h, w = grid.shape
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = np.floor(x)
    y0 = np.floor(y)
    fx = np.clip(x - x0, 0, 1)
    fy = np.clip(y - y0, 0, 1)
    x0i = np.clip(x0.astype(int), 0, w - 1)
    x1i = np.clip(x0i + 1, 0, w - 1)
    y0i = np.clip(y0.astype(int), 0, h - 1)
    y1i = np.clip(y0i + 1, 0, h - 1)
    out = np.zeros((u.shape[0], c))
    for i in range(u.shape[0]):
        v00 = grid[:, y0i[i], x0i[i]]
        v01 = grid[:, y0i[i], x1i[i]]
        v10 = grid[:, y1i[i], x0i[i]]
        v11 = grid[:, y1i[i], x1i[i]]
        top = v00 * (1 - fx[i]) + v01 * fx[i]
        bot = v10 * (1 - fx[i]) + v11 * fx[i]
        out[i] = top * (1 - fy[i]) + bot * fy[i]
    return out


def test_bilinear_matches_numpy(rng):
    grid = rng.normal(0, 1, (4, 16, 32)).astype(np.float32)
    u = rng.uniform(0, 1, 50).astype(np.float32)
    v = rng.uniform(0, 1, 50).astype(np.float32)
    ours = np.asarray(mip._bilinear(jnp.asarray(grid), jnp.asarray(u),
                                    jnp.asarray(v)))
    ref = _np_bilinear(grid, u, v)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_mip_levels_interp(rng):
    grid = rng.normal(0, 1, (2, 32, 32)).astype(np.float32)
    coords = rng.uniform(0.1, 0.9, (20, 2)).astype(np.float32)
    # level 0 equals plain bilinear
    s0 = mip.sample_mip(jnp.asarray(grid), jnp.asarray(coords),
                        jnp.zeros(20), 7)
    b0 = mip._bilinear(jnp.asarray(grid), jnp.asarray(coords[:, 0]),
                       jnp.asarray(coords[:, 1]))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(b0), atol=1e-6)
    # integer level 1 equals bilinear on the 2x2-pooled grid
    pooled = grid.reshape(2, 16, 2, 16, 2).mean(axis=(2, 4))
    s1 = mip.sample_mip(jnp.asarray(grid), jnp.asarray(coords),
                        jnp.ones(20), 7)
    b1 = _np_bilinear(pooled, coords[:, 0], coords[:, 1])
    np.testing.assert_allclose(np.asarray(s1), b1, rtol=1e-5, atol=1e-5)
    # fractional level interpolates between the two
    sh = mip.sample_mip(jnp.asarray(grid), jnp.asarray(coords),
                        jnp.full(20, 0.25), 7)
    np.testing.assert_allclose(np.asarray(sh),
                               0.75 * np.asarray(s0) + 0.25 * np.asarray(s1),
                               rtol=1e-5, atol=1e-5)
    # max_mip_level=0 forces bilinear regardless of level
    st = mip.sample_mip(jnp.asarray(grid), jnp.asarray(coords),
                        jnp.full(20, 3.0), 0)
    np.testing.assert_allclose(np.asarray(st), np.asarray(b0), atol=1e-6)


def test_mip_grad_flows_to_base(rng):
    grid = jnp.asarray(rng.normal(0, 1, (2, 16, 16)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(0.2, 0.8, (10, 2)).astype(np.float32))
    lvl = jnp.full(10, 1.3)

    def f(g):
        return mip.sample_mip(g, coords, lvl, 7).sum()

    g = jax.grad(f)(grid)
    assert np.abs(np.asarray(g)).sum() > 0
    # fd check on one entry
    eps = 1e-3
    gp = grid.at[1, 7, 8].add(eps)
    gmn = grid.at[1, 7, 8].add(-eps)
    fd = (float(f(gp)) - float(f(gmn))) / (2 * eps)
    assert abs(fd - float(g[1, 7, 8])) < 1e-2, (fd, float(g[1, 7, 8]))


def _small_cfg():
    return field_mod.FieldConfig(resolution=(16, 16, 16, 8), out_dim=4,
                                 multires=(1, 2))


def test_field_zero_init_and_shapes(rng):
    cfg = _small_cfg()
    grids = field_mod.init_field(cfg)
    assert len(grids) == 2 and len(grids[0]) == 6
    assert grids[0][0].shape == (4, 16, 16)
    assert grids[1][0].shape == (4, 32, 32)   # spatial doubled
    assert grids[1][2].shape == (4, 8, 32)    # time res fixed
    st = field_mod.make_static([-1, -1, -1], [1, 1, 1], 10)
    pts = jnp.asarray(rng.uniform(-1, 1, (20, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 0.9, (20, 1)).astype(np.float32))
    sc = jnp.asarray(rng.uniform(0.01, 0.5, (20, 3)).astype(np.float32))
    feat = field_mod.field_features(grids, cfg, st, pts, t, sc)
    assert feat.shape == (20, 8)
    np.testing.assert_allclose(np.asarray(feat), 0.0)   # zero init

    # nonzero grids -> nonzero features + grads flow
    grids = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.normal(0, 1, x.shape).astype(np.float32)),
        grids)

    def f(g):
        return field_mod.field_features(g, cfg, st, pts, t, sc).sum()

    val, grad = jax.value_and_grad(f)(grids)
    assert abs(float(val)) > 0
    total = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grad))
    assert total > 0


def test_regularizers(rng):
    cfg = _small_cfg()
    grids = field_mod.init_field(cfg)
    assert float(field_mod.plane_tv(grids)) == 0.0
    assert float(field_mod.time_smoothness(grids)) == 0.0
    grids = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.normal(0, 1, x.shape).astype(np.float32)),
        grids)
    assert float(field_mod.plane_tv(grids)) > 0
    assert float(field_mod.time_smoothness(grids)) > 0


def test_time_embed():
    cfg = gm.ModelConfig()
    x = jnp.asarray([[0.25]])
    e = np.asarray(gm.time_embed(cfg, x))[0]
    assert e.shape == (9,)
    assert e[0] == 0.25
    np.testing.assert_allclose(e[1], np.sin(0.25), atol=1e-6)
    np.testing.assert_allclose(e[2], np.cos(0.25), atol=1e-6)
    np.testing.assert_allclose(e[7], np.sin(8 * 0.25), atol=1e-6)


def test_integral_matches_numeric(rng):
    """The logistic-Q closed form approximates the true integral of
    exp(-4 ((t - tc)/ls)^2) over [0, 1]."""
    cfg = gm.ModelConfig(field=_small_cfg(), min_interval=0.5)
    key = jax.random.PRNGKey(0)
    nets = gm.init_nets(key, cfg)
    n = 16
    pcd = gm.PointCloud(points=rng.uniform(-1, 1, (n, 3)),
                        colors=rng.uniform(0, 1, (n, 3)))
    params, alive = gm.create_from_pcd(key, pcd, 32, cfg)
    st = field_mod.make_static([-1.5] * 3, [1.5] * 3, 50)
    integ = np.asarray(gm.temporal_integral(params, nets, cfg, st))[:n, 0]

    feat = gm.field_feat(params, nets, cfg, st)
    ls = np.asarray(gm.compute_lifespan(nets, cfg, feat, 50.0))[:n, 0]
    tc = np.asarray(params.temporal_pos)[:n, 0]
    ts = np.linspace(0, 1, 2001)
    for i in range(n):
        numeric = np.trapezoid(np.exp(-4 * ((ts - tc[i]) / ls[i]) ** 2), ts)
        assert abs(integ[i] - numeric) < 5e-3, (i, integ[i], numeric)


def test_deform_shapes_and_static_equivalence(rng):
    cfg = gm.ModelConfig(field=_small_cfg(), min_interval=0.5)
    key = jax.random.PRNGKey(1)
    nets = gm.init_nets(key, cfg)
    n, cap = 24, 32
    pcd = gm.PointCloud(points=rng.uniform(-1, 1, (n, 3)),
                        colors=rng.uniform(0, 1, (n, 3)))
    params, alive = gm.create_from_pcd(key, pcd, cap, cfg)
    st = field_mod.make_static([-1.5] * 3, [1.5] * 3, 50)
    out = gm.deform(params, nets, cfg, st, 0.3)
    assert out.xyz.shape == (cap, 3)
    assert out.rotation.shape == (cap, 4)
    assert out.scaling.shape == (cap, 3)
    assert out.opacity.shape == (cap, 1)
    assert out.shs.shape == (cap, 16, 3)
    # zero-init field -> features zero -> lifespan = const, and with
    # zero-ish MLP outputs the deformation stays finite
    assert np.isfinite(np.asarray(out.xyz)).all()
    assert (np.asarray(out.opacity) >= 0).all()
    # rotation normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out.rotation), axis=1), 1.0, atol=1e-5)


def test_convert_coarse_to_fine(rng):
    """Resampling a coarse field onto a finer grid (hexplane.py:279-309):
    same aabb -> nearest upsample; identical reso -> exact copy."""
    coarse = field_mod.FieldConfig(resolution=(8, 8, 8, 5), out_dim=3,
                                   multires=(1,))
    fine = field_mod.FieldConfig(resolution=(16, 16, 16, 5), out_dim=3,
                                 multires=(1,))
    st = field_mod.make_static([-1.0] * 3, [1.0] * 3, 10)
    old = field_mod.init_field(coarse)
    old = [[jnp.asarray(rng.standard_normal(p.shape), jnp.float32)
            for p in planes] for planes in old]

    # identical config + aabb: nearest align_corners resample is the identity
    same = field_mod.convert_coarse_to_fine(coarse, st, old, st)
    for p_new, p_old in zip(same[0], old[0]):
        np.testing.assert_array_equal(np.asarray(p_new), np.asarray(p_old))

    new = field_mod.convert_coarse_to_fine(fine, st, old, st)
    for ci, (a, b) in enumerate(field_mod.COMBS):
        p = np.asarray(new[0][ci])
        o = np.asarray(old[0][ci])
        assert p.shape == (3, fine.reso(1)[b], fine.reso(1)[a])
        # corners agree under align_corners
        np.testing.assert_allclose(p[:, 0, 0], o[:, 0, 0])
        np.testing.assert_allclose(p[:, -1, -1], o[:, -1, -1])
        # every output value exists in the source plane (nearest sampling)
        assert np.isin(p.ravel(), o.ravel()).all()

    # shrunk-aabb fine field samples the matching sub-window of the old grid:
    # the new corner (0,0) sits at 25% of the old frame on spatial axes and
    # at 0 on the time axis
    st2 = field_mod.make_static([-0.5] * 3, [0.5] * 3, 10)
    sub = field_mod.convert_coarse_to_fine(coarse, st2, old, st)
    for ci, (a, b) in enumerate(field_mod.COMBS):
        p = np.asarray(sub[0][ci])
        o = np.asarray(old[0][ci])
        ho, wo = o.shape[1:]
        src_y = 0 if b == 3 else int(round(0.25 * (ho - 1)))
        src_x = 0 if a == 3 else int(round(0.25 * (wo - 1)))
        np.testing.assert_allclose(p[:, 0, 0], o[:, src_y, src_x], rtol=1e-6)


def test_integral_renorm_boosts_edge_centers(rng):
    """integral_renorm divides Eq. 22 by the in-[0,1] mass fraction
    (boost clipped at 4x): an edge-centered splat's integral rises to
    ~its unclipped mass, an interior splat's is unchanged, and a far-
    outside splat keeps the max clip (stays integral-prunable)."""
    cfg = gm.ModelConfig(field=_small_cfg(), min_interval=0.5)
    cfg_rn = cfg._replace(integral_renorm=True)
    key = jax.random.PRNGKey(0)
    nets = gm.init_nets(key, cfg)
    n = 8
    pcd = gm.PointCloud(points=rng.uniform(-1, 1, (n, 3)),
                        colors=rng.uniform(0, 1, (n, 3)))
    params, alive = gm.create_from_pcd(key, pcd, 8, cfg)
    tc = np.array([0.0, 0.5, 1.0, -3.0, 0.02, 0.98, 0.4, 0.6],
                  np.float32)[:, None]
    params = params._replace(temporal_pos=jnp.asarray(tc))
    st = field_mod.make_static([-1.5] * 3, [1.5] * 3, 50)
    base = np.asarray(gm.temporal_integral(params, nets, cfg, st))[:, 0]
    rn = np.asarray(gm.temporal_integral(params, nets, cfg_rn, st))[:, 0]
    # interior points (0.4-0.6): essentially unchanged
    np.testing.assert_allclose(rn[[1, 6, 7]], base[[1, 6, 7]], rtol=2e-2)
    # edge centers: boosted ~2x (half the mass was outside)
    assert 1.5 < rn[0] / base[0] < 2.5, (base[0], rn[0])
    assert 1.5 < rn[2] / base[2] < 2.5, (base[2], rn[2])
    # far outside [0,1]: boost capped at 4x, integral stays tiny
    assert rn[3] <= 4.0 * base[3] + 1e-8
    assert rn[3] < 1e-3
