"""Native C++ runtime (native/libsaro_native.so) vs the pure-Python paths.

Covers the three subsystems: COLMAP binary parsing, grid-hash KNN, and
image decode + Lanczos resize (PIL-parity).  Skipped wholesale when the
library can't be built/loaded.
"""
import os

import numpy as np
import pytest

from saro_gs_tpu import native
from saro_gs_tpu.data import colmap

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


@pytest.fixture
def no_native(monkeypatch):
    """Force the pure-Python fallbacks inside the block."""
    monkeypatch.setenv("SARO_NATIVE", "0")


class TestColmap:
    def _write_fixture(self, tmp_path, rng):
        n = 50
        xyz = rng.randn(n, 3)
        rgb = rng.randint(0, 255, (n, 3)).astype(np.uint8)
        colmap.write_points3d_binary(xyz, rgb, tmp_path / "points3D.bin")

        cams = {1: colmap.ColmapCamera(1, "PINHOLE", 640, 480,
                                       np.array([500.0, 510.0, 320.0,
                                                 240.0]))}
        colmap.write_cameras_binary(cams, tmp_path / "cameras.bin")

        images = {}
        for i in range(1, 4):
            q = rng.randn(4)
            q /= np.linalg.norm(q)
            images[i] = colmap.ColmapImage(i, q, rng.randn(3), 1,
                                           f"cam{i:02d}.png", None, None)
        colmap.write_images_binary(images, tmp_path / "images.bin")
        return xyz, rgb, cams, images

    def test_parity_with_python(self, tmp_path, rng, monkeypatch):
        xyz, rgb, cams, images = self._write_fixture(tmp_path, rng)

        # native reads
        nx, nr, ne = colmap.read_points3d_binary(tmp_path / "points3D.bin")
        ncams = colmap.read_cameras_binary(tmp_path / "cameras.bin")
        nimgs = colmap.read_images_binary(tmp_path / "images.bin")

        # python reads
        monkeypatch.setenv("SARO_NATIVE", "0")
        px, pr, pe = colmap.read_points3d_binary(tmp_path / "points3D.bin")
        pcams = colmap.read_cameras_binary(tmp_path / "cameras.bin")
        pimgs = colmap.read_images_binary(tmp_path / "images.bin")

        np.testing.assert_array_equal(nx, px)
        np.testing.assert_array_equal(nr, pr)
        np.testing.assert_array_equal(ne, pe)
        assert ncams.keys() == pcams.keys()
        for cid in ncams:
            assert ncams[cid].model == pcams[cid].model
            assert ncams[cid].width == pcams[cid].width
            np.testing.assert_array_equal(ncams[cid].params,
                                          pcams[cid].params)
        assert nimgs.keys() == pimgs.keys()
        for iid in nimgs:
            np.testing.assert_array_equal(nimgs[iid].qvec, pimgs[iid].qvec)
            np.testing.assert_array_equal(nimgs[iid].tvec, pimgs[iid].tvec)
            assert nimgs[iid].name == pimgs[iid].name
            assert nimgs[iid].camera_id == pimgs[iid].camera_id


class TestKnn:
    def test_nn_distance_exact(self, rng):
        pts = rng.randn(2000, 3).astype(np.float32)
        d = native.nn_distance(pts)
        from scipy.spatial import cKDTree
        ref, _ = cKDTree(pts).query(pts, k=2)
        np.testing.assert_allclose(d, ref[:, 1], rtol=1e-5, atol=1e-6)

    def test_nn_distance_clustered(self, rng):
        # clusters + far outliers stress the expanding-ring termination
        a = rng.randn(500, 3).astype(np.float32) * 0.01
        b = rng.randn(500, 3).astype(np.float32) * 0.01 + 50.0
        c = rng.randn(20, 3).astype(np.float32) * 300.0
        pts = np.concatenate([a, b, c])
        d = native.nn_distance(pts)
        from scipy.spatial import cKDTree
        ref, _ = cKDTree(pts).query(pts, k=2)
        np.testing.assert_allclose(d, ref[:, 1], rtol=1e-4, atol=1e-5)

    def test_mean_sq_dist_3nn(self, rng):
        pts = rng.randn(800, 3).astype(np.float32)
        out = native.knn_mean_sq_dist(pts, 3)
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        ref = np.sort(d2, axis=1)[:, :3].mean(axis=1)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-6)

    def test_tiny_inputs(self):
        assert native.nn_distance(np.zeros((1, 3), np.float32))[0] == 0.0
        out = native.knn_mean_sq_dist(
            np.array([[0, 0, 0], [1, 0, 0]], np.float32), 3)
        np.testing.assert_allclose(out, [1.0, 1.0])


class TestImages:
    def _png(self, tmp_path, rng, size=(64, 48), alpha=False):
        from PIL import Image
        c = 4 if alpha else 3
        arr = rng.randint(0, 255, (size[1], size[0], c)).astype(np.uint8)
        path = str(tmp_path / f"img{c}.png")
        Image.fromarray(arr, "RGBA" if alpha else "RGB").save(path)
        return path, arr

    def test_png_same_size(self, tmp_path, rng):
        path, arr = self._png(tmp_path, rng)
        out = native.load_image(path, 64, 48)
        np.testing.assert_allclose(
            out, np.moveaxis(arr, -1, 0) / 255.0, atol=1e-6)

    def test_png_alpha_composite(self, tmp_path, rng):
        path, arr = self._png(tmp_path, rng, alpha=True)
        out = native.load_image(path, 64, 48, bg=(1.0, 1.0, 1.0))
        a = arr[..., 3:] / 255.0
        ref = arr[..., :3] / 255.0 * a + 1.0 * (1 - a)
        np.testing.assert_allclose(out, np.moveaxis(ref, -1, 0), atol=1e-6)

    def test_resize_matches_pil_lanczos(self, tmp_path, rng):
        from PIL import Image
        path, arr = self._png(tmp_path, rng, size=(128, 96))
        out = native.load_image(path, 40, 30)
        ref = np.asarray(Image.open(path).resize(
            (40, 30), Image.LANCZOS)).astype(np.float32) / 255.0
        # PIL uses 8-bit fixed-point intermediates; allow ~1.5/255
        assert np.abs(out - np.moveaxis(ref, -1, 0)).max() < 0.008

    def test_jpeg_decode(self, tmp_path, rng):
        from PIL import Image
        # smooth gradient: JPEG lossy, compare against PIL's own decode
        g = np.linspace(0, 255, 64, dtype=np.uint8)
        arr = np.stack([np.tile(g, (48, 1))] * 3, axis=-1)
        path = str(tmp_path / "img.jpg")
        Image.fromarray(arr, "RGB").save(path, quality=95)
        out = native.load_image(path, 64, 48)
        ref = np.asarray(Image.open(path)).astype(np.float32) / 255.0
        assert np.abs(out - np.moveaxis(ref, -1, 0)).max() < 0.02

    def test_batch_threaded(self, tmp_path, rng):
        paths = []
        refs = []
        for i in range(8):
            p, arr = self._png(tmp_path, rng, size=(32 + i, 24))
            paths.append(p)
            refs.append(arr)
        out = native.load_images(paths, 16, 12)
        assert out.shape == (8, 3, 12, 16)
        for i, p in enumerate(paths):
            single = native.load_image(p, 16, 12)
            np.testing.assert_allclose(out[i], single, atol=1e-6)

    def test_camera_uses_native(self, tmp_path, rng, monkeypatch):
        from saro_gs_tpu.data.cameras import Camera
        path, arr = self._png(tmp_path, rng, size=(64, 48), alpha=True)
        cam = Camera(uid=0, R=np.eye(3), T=np.zeros(3), fovx=1.0, fovy=1.0,
                     width=32, height=24, image_path=path)
        nat = cam.load_image(white_background=True)
        monkeypatch.setenv("SARO_NATIVE", "0")
        pil = cam.load_image(white_background=True)
        assert nat.shape == pil.shape == (3, 24, 32)
        # PIL quantizes resize intermediates to uint8 and round-trips
        # premultiplied alpha; on uniform-noise images the worst pixel can
        # differ by a few LSB — gate on max and mean
        d = np.abs(nat - pil)
        assert d.max() < 0.05 and d.mean() < 0.005
