"""Tests for the Adam optimizer, LR schedule, and loss library."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saro_gs_tpu.train import losses, optim


def test_adam_matches_torch_semantics(rng):
    """Step-for-step parity with torch.optim.Adam(eps=1e-15) on a toy
    problem, including a per-row LR tensor."""
    torch = pytest.importorskip("torch")
    n, d = 8, 3
    x0 = rng.normal(0, 1, (n, d)).astype(np.float32)
    lr_rows = rng.uniform(0.5, 2.0, (n, 1)).astype(np.float32)
    gseq = [rng.normal(0, 1, (n, d)).astype(np.float32) for _ in range(5)]

    # torch reference: one scalar-lr Adam per row emulates the reference's
    # fused tensor-lr Adam (cpu torch rejects tensor lrs)
    rows = []
    for i in range(n):
        xt = torch.nn.Parameter(torch.tensor(x0[i]))
        opt = torch.optim.Adam([xt], lr=float(lr_rows[i, 0]) * 1e-2,
                               eps=1e-15)
        for g in gseq:
            xt.grad = torch.tensor(g[i])
            opt.step()
        rows.append(xt.detach().numpy())
    xt_final = np.stack(rows)

    params = {"x": jnp.asarray(x0)}
    state = optim.init_adam(params)
    lr_tree = {"x": jnp.asarray(lr_rows) * 1e-2}
    wd_tree = {"x": 0.0}
    for g in gseq:
        params, state = optim.adam_step(state, params, {"x": jnp.asarray(g)},
                                        lr_tree, wd_tree)
    np.testing.assert_allclose(np.asarray(params["x"]), xt_final,
                               rtol=1e-5, atol=1e-6)


def test_adam_weight_decay_matches_torch(rng):
    torch = pytest.importorskip("torch")
    d = 16
    x0 = rng.normal(0, 1, (d,)).astype(np.float32)
    gseq = [rng.normal(0, 1, (d,)).astype(np.float32) for _ in range(4)]
    xt = torch.nn.Parameter(torch.tensor(x0))
    opt = torch.optim.Adam([xt], lr=1e-2, eps=1e-15, weight_decay=8e-7)
    for g in gseq:
        xt.grad = torch.tensor(g)
        opt.step()
    params = {"x": jnp.asarray(x0)}
    state = optim.init_adam(params)
    for g in gseq:
        params, state = optim.adam_step(state, params, {"x": jnp.asarray(g)},
                                        {"x": 1e-2}, {"x": 8e-7})
    np.testing.assert_allclose(np.asarray(params["x"]),
                               xt.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_expon_lr_endpoints():
    lr = optim.expon_lr(0, 1e-2, 1e-4, 1000)
    np.testing.assert_allclose(float(lr), 1e-2, rtol=1e-6)
    lr = optim.expon_lr(1000, 1e-2, 1e-4, 1000)
    np.testing.assert_allclose(float(lr), 1e-4, rtol=1e-6)
    lr = optim.expon_lr(500, 1e-2, 1e-4, 1000)
    np.testing.assert_allclose(float(lr), 1e-3, rtol=1e-5)
    # delay ramp (position_lr_delay_mult path)
    lr0 = optim.expon_lr(0, 1e-2, 1e-4, 1000, lr_delay_steps=100,
                         lr_delay_mult=0.01)
    np.testing.assert_allclose(float(lr0), 1e-4, rtol=1e-5)


def test_ssim_matches_torch_reference(rng):
    """Our SSIM vs a direct torch transcription of loss_utils.ssim."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from math import exp

    def t_ssim(img1, img2, window_size=11):
        channel = img1.size(-3)
        g = torch.Tensor([exp(-(x - window_size // 2) ** 2 / (2 * 1.5 ** 2))
                          for x in range(window_size)])
        g = (g / g.sum()).unsqueeze(1)
        w2 = g.mm(g.t()).float().unsqueeze(0).unsqueeze(0)
        w = w2.expand(channel, 1, window_size, window_size).contiguous()
        mu1 = F.conv2d(img1, w, padding=window_size // 2, groups=channel)
        mu2 = F.conv2d(img2, w, padding=window_size // 2, groups=channel)
        mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
        s1 = F.conv2d(img1 * img1, w, padding=5, groups=channel) - mu1_sq
        s2 = F.conv2d(img2 * img2, w, padding=5, groups=channel) - mu2_sq
        s12 = F.conv2d(img1 * img2, w, padding=5, groups=channel) - mu1_mu2
        C1, C2 = 0.01 ** 2, 0.03 ** 2
        m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / \
            ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
        return m.mean().item()

    a = rng.uniform(0, 1, (3, 40, 48)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    ours = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = t_ssim(torch.tensor(a), torch.tensor(b))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_msssim_close_to_torchmetrics(rng):
    tm = pytest.importorskip("torchmetrics")
    import torch
    ms = tm.MultiScaleStructuralSimilarityIndexMeasure(data_range=1.0)
    a = rng.uniform(0, 1, (3, 180, 200)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    ours = float(losses.msssim(jnp.asarray(a), jnp.asarray(b)))
    ref = float(ms(torch.tensor(a)[None], torch.tensor(b)[None]))
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_psnr():
    a = jnp.zeros((3, 8, 8))
    b = jnp.full((3, 8, 8), 0.1)
    np.testing.assert_allclose(float(losses.psnr(a, b)), 20.0, atol=1e-4)


def test_composite_loss(rng):
    img = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))
    w = losses.LossWeights(lambda_dssim=0.2, lambda_dtstd=1e-4,
                           lambda_dscale_reg=8e-6)
    t_centers = jnp.asarray(rng.uniform(0, 1, (10, 1)).astype(np.float32))
    sres = jnp.asarray(rng.normal(0, 0.1, (10, 3)).astype(np.float32))
    loss, logs = losses.composite_loss(w, img, gt, t_centers=t_centers,
                                       scale_residual=sres)
    assert np.isfinite(float(loss))
    assert "Ldssim" in logs and "Ldtstd" in logs and "Ldscale_reg" in logs
    ll1 = float(losses.l1_loss(img, gt))
    lssim = 1 - float(losses.ssim(img, gt))
    expect = (0.8 * ll1 + 0.2 * lssim
              + 1e-4 * (1 - float(jnp.std(t_centers)))
              + 8e-6 * float(jnp.linalg.norm(sres.reshape(-1))))
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)


def test_rel_loss_and_ssim_map(rng):
    import jax.numpy as jnp
    from saro_gs_tpu.train import losses
    x = jnp.asarray(rng.rand(3, 16, 16).astype(np.float32))
    y = jnp.asarray(rng.rand(3, 16, 16).astype(np.float32))
    ref = np.abs((np.asarray(x) - np.asarray(y))
                 / (np.asarray(y) + 0.001)).mean()
    assert float(losses.rel_loss(x, y)) == pytest.approx(float(ref), rel=1e-6)
    m = losses.ssim_map(x, y)
    assert m.shape == x.shape
    assert float(m.mean()) == pytest.approx(float(losses.ssim(x, y)),
                                            rel=1e-6)


def test_inv_lr_clip_caps_multiplier(rng):
    """inv_lr_clip caps the inverse-integral LR multiplier; clip=0 is the
    unbounded reference path (update_learning_rate ratios up to
    max_integral/min_intergral)."""
    import jax.numpy as jnp
    from saro_gs_tpu.models.densify import integral_prune_and_lr

    alive = jnp.ones(6)
    integral = jnp.asarray([[1.0], [0.5], [0.01], [0.002], [1e-5], [0.8]])
    a0, inv0 = integral_prune_and_lr(alive, integral, 1e-3)
    # row 4 pruned (below min_intergral), multiplier normalized to min 1
    assert float(a0[4]) == 0.0
    np.testing.assert_allclose(float(inv0[0, 0]), 1.0)
    np.testing.assert_allclose(float(inv0[3, 0]), 500.0, rtol=1e-5)
    a1, inv1 = integral_prune_and_lr(alive, integral, 1e-3, clip=20.0)
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
    assert float(np.asarray(inv1).max()) == 20.0
    np.testing.assert_allclose(float(inv1[1, 0]), float(inv0[1, 0]))
