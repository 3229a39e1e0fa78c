"""End-to-end Neural3D scene assembly from a fabricated on-disk layout.

Builds the reference's Neural3D directory structure (per-frame
``colmap_<t>/sparse/0`` binary models + ``poses_bounds.npy``) with our own
COLMAP writers and runs ``read_colmap_scene`` over it, asserting the
behaviors of dataset_readers.readColmapSceneInfo:364-451: first-camera
test split, per-frame timestamps, ``points3D_total<d>.ply`` merge with
per-point times, and the spiral validation path.
"""
import os

import numpy as np
import pytest

from saro_gs_tpu.data import colmap, ply
from saro_gs_tpu.data.readers import read_colmap_scene

DURATION = 4
N_CAMS = 3
PTS_PER_FRAME = [5, 7, 3, 6]


def _rot(i):
    th = 0.3 * i
    c, s = np.cos(th), np.sin(th)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


@pytest.fixture
def neural3d_dir(tmp_path):
    scene = tmp_path / "scene"
    for j in range(DURATION):
        sparse = scene / f"colmap_{j}" / "sparse" / "0"
        sparse.mkdir(parents=True)
        if j == 0:
            cams = {k: colmap.ColmapCamera(
                id=k, model="PINHOLE", width=64, height=48,
                params=[60.0, 60.0, 32.0, 24.0]) for k in range(1, N_CAMS + 1)}
            colmap.write_cameras_binary(cams, str(sparse / "cameras.bin"))
            images = {}
            for k in range(1, N_CAMS + 1):
                q = colmap.rotmat2qvec(_rot(k))
                images[k] = colmap.ColmapImage(
                    id=k, qvec=q, tvec=np.array([0.1 * k, 0.0, 4.0]),
                    camera_id=k, name=f"cam{k - 1:02d}.png", xys=None,
                    point3D_ids=None)
            colmap.write_images_binary(images, str(sparse / "images.bin"))
        n = PTS_PER_FRAME[j]
        xyz = np.linspace(0, 1, 3 * n).reshape(n, 3) + j
        rgb = np.full((n, 3), 10 * (j + 1))
        colmap.write_points3d_binary(xyz, rgb, str(sparse / "points3D.bin"))

    pb = np.zeros((N_CAMS, 17))
    for i in range(N_CAMS):
        R_c2w = _rot(i)
        m = np.zeros((3, 5))
        m[:, 0] = R_c2w[:, 1]
        m[:, 1] = R_c2w[:, 0]
        m[:, 2] = -R_c2w[:, 2]
        m[:, 3] = R_c2w @ np.array([0, 0, 4.0])
        m[:, 4] = [48, 64, 60.0]
        pb[i, :15] = m.reshape(-1)
        pb[i, 15:] = [2.0, 10.0]
    np.save(scene / "poses_bounds.npy", pb)
    return str(scene / "colmap_0")


def test_neural3d_scene_assembly(neural3d_dir):
    info = read_colmap_scene(neural3d_dir, duration=DURATION, resolution=2)

    # first camera (by name) is the test camera; the rest train, one
    # Camera per (physical camera, frame)
    assert len(info.test_cameras) == DURATION
    assert {c.image_name for c in info.test_cameras} == {"cam00"}
    assert len(info.train_cameras) == (N_CAMS - 1) * DURATION
    assert "cam00" not in {c.image_name for c in info.train_cameras}

    # per-frame timestamps (j - start)/duration and per-frame image dirs
    for cams in (info.test_cameras, info.train_cameras):
        by_name = {}
        for c in cams:
            by_name.setdefault(c.image_name, []).append(c)
        for name, group in by_name.items():
            ts = sorted(c.timestamp for c in group)
            assert ts == [j / DURATION for j in range(DURATION)]
        for c in cams:
            frame = round(c.timestamp * DURATION)
            assert f"colmap_{frame}{os.sep}" in c.image_path

    # resolution 2 halves the 64x48 intrinsics
    assert (info.train_cameras[0].width,
            info.train_cameras[0].height) == (32, 24)

    # merged cloud: all frames' points with per-point times
    total = os.path.join(neural3d_dir, "sparse", "0",
                         f"points3D_total{DURATION}.ply")
    assert info.ply_path == total and os.path.exists(total)
    pcd = info.point_cloud
    assert pcd.points.shape[0] == sum(PTS_PER_FRAME)
    expect_t = np.concatenate([
        np.full(n, j / DURATION) for j, n in enumerate(PTS_PER_FRAME)])
    np.testing.assert_allclose(np.sort(pcd.times.ravel()),
                               np.sort(expect_t), atol=1e-6)
    # frame j points live at offset +j (written above)
    sel = pcd.times.ravel() >= 0.74
    np.testing.assert_array_less(2.9, pcd.points[sel].min())

    # spiral validation path (300 views) + nerf++ normalization
    assert len(info.val_cameras) == 300
    assert info.nerf_radius > 0

    # re-read reuses the merged ply rather than rebuilding it
    mtime = os.path.getmtime(total)
    info2 = read_colmap_scene(neural3d_dir, duration=DURATION, resolution=2)
    assert os.path.getmtime(total) == mtime
    assert info2.point_cloud.points.shape == pcd.points.shape


def test_neural3d_no_eval_split(neural3d_dir):
    info = read_colmap_scene(neural3d_dir, duration=DURATION, resolution=2,
                             eval_split=False)
    assert len(info.train_cameras) == N_CAMS * DURATION
    assert len(info.test_cameras) == 2
