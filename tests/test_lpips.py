"""LPIPS metric: architecture shapes, metric properties, weight IO."""
import numpy as np
import pytest

from saro_gs_tpu.train import lpips as L


@pytest.fixture(scope="module")
def alex_params():
    import jax
    return {k: np.asarray(v) for k, v in
            L.init_random_weights(jax.random.PRNGKey(0), "alex").items()}


class TestArchitecture:
    def test_alex_tap_shapes(self, alex_params):
        import jax.numpy as jnp
        x = jnp.zeros((1, 3, 64, 64))
        feats = L._alex_features(
            {k: jnp.asarray(v) for k, v in alex_params.items()}, x)
        assert [f.shape[1] for f in feats] == [64, 192, 384, 256, 256]
        # alexnet spatial pipeline on 64x64: 15 -> 7 -> 3 -> 3 -> 3
        assert [f.shape[-1] for f in feats] == [15, 7, 3, 3, 3]

    def test_vgg_tap_shapes(self):
        import jax
        import jax.numpy as jnp
        p = L.init_random_weights(jax.random.PRNGKey(1), "vgg")
        x = jnp.zeros((1, 3, 64, 64))
        feats = L._vgg_features({k: jnp.asarray(v) for k, v in p.items()}, x)
        assert [f.shape[1] for f in feats] == [64, 128, 256, 512, 512]
        assert [f.shape[-1] for f in feats] == [64, 32, 16, 8, 4]

    def test_conv_matches_numpy(self, alex_params):
        import jax.numpy as jnp
        # first conv (stride 4, pad 2) vs explicit numpy correlation
        rng = np.random.RandomState(0)
        x = rng.randn(1, 3, 16, 16).astype(np.float32)
        w = alex_params["conv0_w"][:2]
        b = alex_params["conv0_b"][:2]
        out = np.asarray(L._conv(jnp.asarray(x), jnp.asarray(w),
                                 jnp.asarray(b), 4, 2))
        xp = np.pad(x, ((0, 0), (0, 0), (2, 2), (2, 2)))
        for oy in range(out.shape[2]):
            for ox in range(out.shape[3]):
                patch = xp[0, :, oy * 4:oy * 4 + 11, ox * 4:ox * 4 + 11]
                ref = (patch[None] * w).sum(axis=(1, 2, 3)) + b
                np.testing.assert_allclose(out[0, :, oy, ox], ref,
                                           rtol=1e-4, atol=1e-4)


class TestMetric:
    def test_identity_zero(self, alex_params):
        rng = np.random.RandomState(0)
        x = rng.rand(3, 64, 64).astype(np.float32)
        d = L.lpips_from_params(alex_params, x, x, "alex")
        assert float(d) == pytest.approx(0.0, abs=1e-6)

    def test_positive_and_monotone(self, alex_params):
        rng = np.random.RandomState(0)
        x = rng.rand(3, 64, 64).astype(np.float32)
        y1 = np.clip(x + rng.randn(*x.shape) * 0.02, 0, 1).astype(np.float32)
        y2 = rng.rand(3, 64, 64).astype(np.float32)
        d1 = float(L.lpips_from_params(alex_params, x, y1, "alex"))
        d2 = float(L.lpips_from_params(alex_params, x, y2, "alex"))
        assert 0 < d1 < d2

    def test_symmetric(self, alex_params):
        rng = np.random.RandomState(1)
        x = rng.rand(3, 32, 32).astype(np.float32)
        y = rng.rand(3, 32, 32).astype(np.float32)
        dxy = float(L.lpips_from_params(alex_params, x, y, "alex"))
        dyx = float(L.lpips_from_params(alex_params, y, x, "alex"))
        assert dxy == pytest.approx(dyx, rel=1e-5)


class TestWeightsIO:
    def test_npz_roundtrip_and_entrypoint(self, alex_params, tmp_path,
                                          monkeypatch):
        monkeypatch.setenv("SARO_LPIPS_WEIGHTS", str(tmp_path))
        monkeypatch.setenv("SARO_LPIPS_FIXTURE", "0")
        L._CACHE.clear()
        assert not L.lpips_available("alex")
        with pytest.raises(FileNotFoundError):
            L.lpips(np.zeros((3, 16, 16)), np.zeros((3, 16, 16)))
        L.save_weights_npz(alex_params, "alex")
        assert L.lpips_available("alex")
        assert L.weights_source("alex") == "lpips_alex.npz"
        d = L.lpips(np.zeros((3, 32, 32), np.float32),
                    np.ones((3, 32, 32), np.float32))
        assert float(d) > 0
        L._CACHE.clear()

    def test_fixture_fallback_is_deterministic(self, tmp_path, monkeypatch):
        """Without an npz the deterministic fixture set loads and reports
        provenance, so eval always carries an LPIPS column (VERDICT r1
        task 9); values are a relative metric only."""
        monkeypatch.setenv("SARO_LPIPS_WEIGHTS", str(tmp_path / "none"))
        monkeypatch.setenv("SARO_LPIPS_FIXTURE", "1")
        L._CACHE.clear()
        L._SOURCE.clear()
        assert L.lpips_available("alex")
        assert L.weights_source("alex") == "fixture-random-seed0"
        rng = np.random.RandomState(3)
        x = rng.rand(3, 32, 32).astype(np.float32)
        y = rng.rand(3, 32, 32).astype(np.float32)
        d1 = float(L.lpips(x, y))
        L._CACHE.clear()
        d2 = float(L.lpips(x, y))
        assert d1 == pytest.approx(d2, rel=1e-6)
        assert d1 > 0 and float(L.lpips(x, x)) == pytest.approx(0, abs=1e-6)
        L._CACHE.clear()
        L._SOURCE.clear()

    def test_convert_torch_state_layout(self, alex_params):
        # fabricate a torchvision-style alexnet.features state dict
        trunk = {}
        conv_idx = [0, 3, 6, 8, 10]
        for i, k in enumerate(conv_idx):
            trunk[f"{k}.weight"] = alex_params[f"conv{i}_w"]
            trunk[f"{k}.bias"] = alex_params[f"conv{i}_b"]
        lin = {f"lin{i}.model.1.weight":
               alex_params[f"lin{i}_w"].reshape(-1, 1, 1, 1)
               for i in range(5)}
        out = L.convert_torch_state(trunk, lin, "alex")
        for i in range(5):
            np.testing.assert_array_equal(out[f"conv{i}_w"],
                                          alex_params[f"conv{i}_w"])
            np.testing.assert_array_equal(out[f"lin{i}_w"],
                                          alex_params[f"lin{i}_w"])
