"""COLMAP preprocessing writers, pose/visual helpers, HyperNeRF loader."""
import json
import os
import sqlite3

import numpy as np
import pytest

from saro_gs_tpu.data import colmap, preprocess
from saro_gs_tpu.utils import visual


class TestPreprocess:
    def _poses_bounds(self, rng, n=3):
        pb = np.zeros((n, 17))
        for i in range(n):
            th = i * 0.3
            c, s = np.cos(th), np.sin(th)
            R_c2w = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            pos = R_c2w @ np.array([0, 0, 4.0])
            # LLFF axes: [down, right, back]
            m = np.zeros((3, 5))
            m[:, 0] = R_c2w[:, 1]     # down
            m[:, 1] = R_c2w[:, 0]     # right
            m[:, 2] = -R_c2w[:, 2]    # back
            m[:, 3] = pos
            m[:, 4] = [480, 640, 500.0]
            pb[i, :15] = m.reshape(-1)
            pb[i, 15:] = [2.0, 10.0]
        return pb

    def test_llff_conversion_roundtrip(self, rng):
        pb = self._poses_bounds(rng)
        cams = preprocess.llff_poses_to_colmap(pb)
        assert len(cams) == 3
        for (q, t, focal, h, w), row in zip(cams, pb):
            assert (h, w, focal) == (480, 640, 500.0)
            R = colmap.qvec2rotmat(q)
            # camera center = -R^T t must equal the LLFF position
            center = -R.T @ t
            m = row[:15].reshape(3, 5)
            np.testing.assert_allclose(center, m[:, 3], atol=1e-6)

    def test_write_frame_model(self, tmp_path, rng):
        pb = self._poses_bounds(rng)
        names = [f"cam{i:02d}.png" for i in range(3)]
        db_path, manual = preprocess.write_frame_model(
            str(tmp_path / "colmap_0"), pb, names)
        # db holds 3 cameras + 3 images with prior poses
        conn = sqlite3.connect(db_path)
        cams = conn.execute("SELECT camera_id, model, width, height "
                            "FROM cameras").fetchall()
        imgs = conn.execute("SELECT image_id, name, prior_qw "
                            "FROM images").fetchall()
        assert len(cams) == 3 and len(imgs) == 3
        assert all(c[1] == 1 and c[2] == 640 and c[3] == 480 for c in cams)
        assert not any(np.isnan(i[2]) for i in imgs)
        # manual model parses back through our text readers
        tcams = colmap.read_cameras_text(os.path.join(manual, "cameras.txt"))
        assert len(tcams) == 3
        assert tcams[1].model == "PINHOLE"
        # COLMAP text format: one pose line + one (empty) points2D line
        # per image; our text reader pairs them
        timgs = colmap.read_images_text(os.path.join(manual, "images.txt"))
        assert len(timgs) == 3
        assert timgs[1].name == "cam00.png"

    def test_missing_binary_raises(self, tmp_path, monkeypatch):
        monkeypatch.setenv("PATH", str(tmp_path))
        with pytest.raises(RuntimeError, match="colmap"):
            preprocess.run_colmap_frame(str(tmp_path), 0)
        with pytest.raises(RuntimeError, match="ffmpeg"):
            preprocess.extract_frames("x.mp4", str(tmp_path), 0, 1)


class TestVisual:
    def test_quat_mat_roundtrip(self, rng):
        for _ in range(20):
            q = rng.randn(4)
            q /= np.linalg.norm(q)
            R = visual._mat_from_quat(q)
            q2 = visual._quat_from_mat(R)
            if np.dot(q, q2) < 0:
                q2 = -q2
            np.testing.assert_allclose(q, q2, atol=1e-8)

    def test_slerp_endpoints(self, rng):
        q0, q1 = rng.randn(2, 4)
        q0 /= np.linalg.norm(q0)
        q1 /= np.linalg.norm(q1)
        np.testing.assert_allclose(visual.slerp(q0, q1, 0.0), q0, atol=1e-9)
        got = visual.slerp(q0, q1, 1.0)
        if np.dot(got, q1) < 0:
            got = -got
        np.testing.assert_allclose(got, q1, atol=1e-9)

    def test_smooth_poses_fixed_point(self):
        # constant trajectory is unchanged by smoothing
        c2w = np.eye(4)[None].repeat(7, 0)
        out = visual.smooth_camera_poses(c2w, window=5)
        np.testing.assert_allclose(out, c2w, atol=1e-9)

    def test_smooth_poses_reduces_jitter(self, rng):
        n = 30
        base = np.eye(4)[None].repeat(n, 0)
        base[:, 0, 3] = np.linspace(0, 1, n)
        noisy = base.copy()
        noisy[:, 0, 3] += rng.randn(n) * 0.05
        out = visual.smooth_camera_poses(noisy, window=5)
        jitter = lambda p: np.abs(np.diff(p[:, 0, 3], 2)).mean()
        assert jitter(out) < jitter(noisy)

    def test_rgbd_backprojection(self):
        h, w, f = 8, 8, 4.0
        color = np.ones((3, h, w)) * 0.5
        depth = np.full((h, w), 2.0)
        depth[0, 0] = 15.0     # unhit -> dropped
        xyz, rgb = visual.rgbd_to_pointcloud(color, depth, f, f)
        assert xyz.shape[0] == h * w - 1
        assert np.allclose(xyz[:, 2], 2.0)
        # center pixel maps near the optical axis
        center = xyz[np.argmin(np.abs(xyz[:, 0]) + np.abs(xyz[:, 1]))]
        assert np.linalg.norm(center[:2]) < 2 * 2.0 / f

    def test_recenter(self, rng):
        c2ws = np.stack([np.eye(4)] * 4)
        c2ws[:, :3, 3] = rng.randn(4, 3)
        out = visual.recenter_poses(c2ws)
        np.testing.assert_allclose(out[:, :3, 3].mean(0), 0, atol=1e-9)

    def test_frustum_lineset_and_ply(self, tmp_path, rng):
        c2ws = np.stack([np.eye(4)] * 3)
        pts, lines = visual.camera_frustum_lineset(c2ws)
        assert pts.shape == (15, 3) and lines.shape == (24, 2)
        visual.save_pointcloud_ply(str(tmp_path / "p.ply"),
                                   rng.rand(10, 3), rng.rand(10, 3))
        txt = open(tmp_path / "p.ply").read()
        assert "element vertex 10" in txt


class TestHyperNerf:
    def _make_scene(self, root, rng, n=6):
        os.makedirs(root / "camera", exist_ok=True)
        os.makedirs(root / "rgb" / "2x", exist_ok=True)
        ids = [f"{i:06d}" for i in range(n)]
        meta = {}
        from PIL import Image
        for i, iid in enumerate(ids):
            th = i * 0.2
            c, s = np.cos(th), np.sin(th)
            R_w2c = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
            pos = np.array([s * 4, 0, -c * 4])
            json.dump({"orientation": R_w2c.tolist(),
                       "position": pos.tolist(),
                       "focal_length": 500.0,
                       "principal_point": [320.0, 240.0],
                       "image_size": [640, 480]},
                      open(root / "camera" / f"{iid}.json", "w"))
            meta[iid] = {"time_id": i, "camera_id": 0}
            img = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(root / "rgb" / "2x" / f"{iid}.png")
        json.dump({"ids": ids, "train_ids": ids[:-2],
                   "val_ids": ids[-2:]},
                  open(root / "dataset.json", "w"))
        json.dump(meta, open(root / "metadata.json", "w"))
        return ids

    def test_loader(self, tmp_path, rng):
        from saro_gs_tpu.data.hypernerf import read_hypernerf_scene
        self._make_scene(tmp_path, rng)
        info = read_hypernerf_scene(str(tmp_path), resolution=2)
        assert len(info.train_cameras) == 4
        assert len(info.test_cameras) == 2
        cam = info.train_cameras[0]
        assert (cam.width, cam.height) == (320, 240)
        assert 0 <= cam.timestamp <= 1
        # camera centers sit on the radius-4 circle
        assert abs(np.linalg.norm(cam.camera_center) - 4.0) < 1e-3
        img = cam.load_image()
        assert img.shape == (3, 240, 320)
        assert info.point_cloud.points.shape[0] == 100_000

    def test_registered(self):
        from saro_gs_tpu.data.readers import SCENE_READERS
        assert "hypernerf" in SCENE_READERS


class TestMarkVisible:
    def test_frustum_cull(self):
        import jax.numpy as jnp
        from saro_gs_tpu.ops.projection import mark_visible
        from tests.scene_fixtures import make_camera
        cam, _ = make_camera(cam_z=-4.0)
        pts = jnp.asarray([[0.0, 0.0, 0.0],    # in front (view z=4)
                           [0.0, 0.0, -3.9],   # z=0.1 -> culled (<=0.2)
                           [0.0, 0.0, -10.0]])  # behind
        vis = mark_visible(pts, cam)
        assert vis.tolist() == [True, False, False]


def test_minicam_matches_camera():
    import math
    from saro_gs_tpu.data.cameras import Camera, MiniCam
    cam = Camera(uid=0, R=np.eye(3), T=np.array([0.0, 0.0, 4.0]),
                 fovx=1.0, fovy=0.8, width=64, height=48, timestamp=0.3)
    mini = MiniCam(width=64, height=48, fovx=1.0, fovy=0.8, znear=0.01,
                   zfar=100.0, world_view=cam.world_view,
                   full_proj=cam.full_proj, timestamp=0.3)
    a, b = cam.raster_params(), mini.raster_params()
    np.testing.assert_allclose(a.viewmat, b.viewmat)
    np.testing.assert_allclose(a.projmat, b.projmat)
    np.testing.assert_allclose(a.campos, b.campos, atol=1e-6)


def test_sparsify_keeps_frame0_and_isolated_points():
    """sparsify (helper_model.interpolate_point:122-175): frame 0 kept in
    full; later frames keep the top-1/n most isolated points; many unique
    timestamps (random-time Blender init) must stay fast."""
    from saro_gs_tpu.data.pointcloud import PointCloud, sparsify

    rng = np.random.RandomState(0)
    # frame 0: 10 pts; frame 0.5: 8 clustered + 2 isolated outliers
    p0 = rng.rand(10, 3)
    cluster = rng.rand(8, 3) * 0.01
    outliers = np.array([[5.0, 5.0, 5.0], [-5.0, -5.0, -5.0]])
    p1 = np.concatenate([cluster, outliers])
    pts = np.concatenate([p0, p1])
    t = np.concatenate([np.zeros((10, 1)), np.full((10, 1), 0.5)])
    out = sparsify(PointCloud(points=pts, colors=np.zeros_like(pts),
                              times=t), n=5)
    # all of frame 0 survives; frame 1 keeps 10//5=2 most isolated
    kept0 = out.points[(out.times == 0.0)[:, 0]]
    kept1 = out.points[(out.times == 0.5)[:, 0]]
    np.testing.assert_array_equal(np.sort(kept0, axis=0),
                                  np.sort(p0, axis=0))
    assert kept1.shape[0] <= 2
    assert all(any(np.allclose(k, o) for o in outliers) for k in kept1)

    # pathological: every point its own timestamp — must complete quickly
    # and keep only frame 0 (groups of 1 keep int(1/5)=0 points)
    n = 20000
    pts = rng.rand(n, 3)
    t2 = np.concatenate([[0.0], rng.rand(n - 1)])[:, None]
    out2 = sparsify(PointCloud(points=pts, colors=np.zeros_like(pts),
                               times=t2), n=5)
    assert out2.points.shape[0] == 1


def test_camerass_rays_reproject_to_pixels():
    """Camerass (scene/cameras.py:128-214): 2x resolution; per-pixel rays
    must re-project through full_proj onto their own pixel centres and
    point forward (+z) in view space; rayo is the camera centre."""
    from saro_gs_tpu.data.cameras import Camera, Camerass

    rng = np.random.RandomState(3)
    th = 0.4
    c, s = np.cos(th), np.sin(th)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    cam = Camerass(uid=0, R=R, T=np.array([0.1, -0.2, 4.0]),
                   fovx=1.0, fovy=0.8, width=32, height=24, timestamp=0.3)
    assert cam.width == 64 and cam.height == 48
    assert cam.rayd.shape == (1, 3, 48, 64)
    np.testing.assert_allclose(
        cam.rayo[0, :, 0, 0], cam.camera_center, atol=1e-6)
    np.testing.assert_allclose(
        np.linalg.norm(cam.rayd, axis=1), 1.0, atol=1e-5)

    for _ in range(20):
        i = rng.randint(cam.height)
        j = rng.randint(cam.width)
        o = cam.rayo[0, :, i, j].astype(np.float64)
        d = cam.rayd[0, :, i, j].astype(np.float64)
        p = np.append(o + 3.0 * d, 1.0)
        # forward in view space (row-vector convention)
        view = p @ cam.world_view.astype(np.float64)
        assert view[2] > 0
        clip = p @ cam.full_proj.astype(np.float64)
        ndc = clip[:2] / clip[3]
        np.testing.assert_allclose(
            ndc, [(2 * j + 1) / cam.width - 1,
                  (2 * i + 1) / cam.height - 1], atol=1e-5)
