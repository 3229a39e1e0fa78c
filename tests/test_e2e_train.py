"""End-to-end: synthetic blender scene -> Scene -> Trainer -> eval.

Builds a tiny dataset on disk (transforms_{train,test}.json + PNGs rendered
from a known Gaussian set with our own forward), then trains from random
init and checks that the loss drops and test PSNR climbs — the full L0-L5
stack in one pass, on the CPU jax backend.
"""
import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saro_gs_tpu.config import load_config
from saro_gs_tpu.ops import math3d
from saro_gs_tpu.ops.projection import CameraParams
from saro_gs_tpu.ops.rasterize import RasterConfig, rasterize

W, H = 40, 32
DURATION = 10


def _pose_around(theta, radius=4.0):
    """Camera on a circle in the x-z plane looking at the origin.
    Returns (R, T) in COLMAP convention (R = c2w rotation)."""
    pos = np.array([radius * math.sin(theta), 0.0,
                    -radius * math.cos(theta)])
    fwd = -pos / np.linalg.norm(pos)               # toward origin
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    true_up = np.cross(fwd, right)
    R = np.stack([right, true_up, fwd], axis=1)    # cam-to-world
    T = -R.T @ pos                                  # world-to-cam translation
    return R, T


def _write_scene(root, rng):
    """Render GT images from a fixed Gaussian set; write blender format."""
    os.makedirs(root, exist_ok=True)
    n = 25
    means = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
    scales = rng.uniform(0.1, 0.3, (n, 3)).astype(np.float32)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.5, 0.95, n).astype(np.float32)
    colors = rng.uniform(0.1, 1.0, (n, 3)).astype(np.float32)
    # gentle rigid motion over time
    vel = rng.uniform(-0.03, 0.03, (n, 3)).astype(np.float32)

    fovx = math.radians(60)
    cfg = RasterConfig(tile_x=16, tile_y=16, chunk=8, max_instances=8192,
                       max_slots=256)
    from PIL import Image

    def make_frames(name, thetas, t_frames):
        frames = []
        for i, (theta, tf) in enumerate(zip(thetas, t_frames)):
            R, T = _pose_around(theta)
            wv = math3d.world_to_view_matrix(R, T)
            focal = math3d.fov2focal(fovx, W)
            fovy = math3d.focal2fov(focal, H)
            proj = math3d.projection_matrix(0.01, 100.0, fovx, fovy)
            cam = CameraParams(
                viewmat=jnp.asarray(wv),
                projmat=jnp.asarray((wv.astype(np.float64)
                                     @ proj.astype(np.float64)
                                     ).astype(np.float32)),
                campos=jnp.asarray(np.linalg.inv(
                    wv.astype(np.float64))[3, :3].astype(np.float32)),
                tanfovx=jnp.float32(math.tan(fovx / 2)),
                tanfovy=jnp.float32(math.tan(fovy / 2)))
            m = means + vel * tf * DURATION
            out = rasterize(jnp.asarray(m), jnp.asarray(scales),
                            jnp.asarray(quats), jnp.asarray(opac), cam,
                            jnp.zeros(3), width=W, height=H, sh_degree=0,
                            config=cfg, colors_precomp=jnp.asarray(colors))
            img = np.asarray(jnp.clip(out.color, 0, 1))
            arr = (np.transpose(img, (1, 2, 0)) * 255).astype(np.uint8)
            fname = f"{name}_{i:03d}"
            Image.fromarray(arr).save(os.path.join(root, fname + ".png"))
            # c2w transform matrix for the blender reader: it inverts and
            # applies R=-R.T with column flip; build the inverse mapping
            c2w = np.eye(4)
            c2w[:3, :3] = -R
            c2w[:3, 0] = -c2w[:3, 0]
            # blender reader: matrix = inv(transform); R' built from it
            w2c = np.eye(4)
            Rb = -R.copy()
            Rb[:, 0] = -Rb[:, 0]
            w2c[:3, :3] = Rb.T
            w2c[:3, 3] = -T
            transform = np.linalg.inv(w2c)
            frames.append({"file_path": fname,
                           "time": tf,
                           "transform_matrix": transform.tolist()})
        return frames

    n_train = 12
    thetas = np.linspace(0, 2 * np.pi, n_train, endpoint=False)
    t_frames = (np.arange(n_train) % DURATION) / DURATION
    train_frames = make_frames("train", thetas, t_frames)
    test_frames = make_frames("test", [0.13, 2.1],
                              [0.0, 0.5])
    for split, frames in (("train", train_frames), ("test", test_frames)):
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": fovx, "frames": frames}, f)


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("toy_blender"))
    _write_scene(root, np.random.RandomState(7))
    return root


def test_blender_reader(scene_dir):
    from saro_gs_tpu.data.readers import read_blender_scene
    info = read_blender_scene(scene_dir, duration=DURATION, resolution=1)
    assert len(info.train_cameras) == 12
    assert len(info.test_cameras) == 2
    assert info.point_cloud.points.shape[0] == 100_000
    cam = info.train_cameras[0]
    img = cam.load_image()
    assert img.shape == (3, H, W)
    # reader's pose round-trip: camera looks at the scene (gaussians render)
    assert info.nerf_radius > 0


def test_train_loop_converges(scene_dir, tmp_path):
    cfg = load_config(
        source_path=scene_dir, model_path=str(tmp_path / "model"),
        loader="blender", duration=DURATION, resolution=1,
        batch=2, iterations=120, static_iteration=20,
        densify=5, densify_from_iter=30, densify_until_iter=100,
        densification_interval=40, opacity_reset_interval=1000,
        preprocesspoints=0, capacity=2048,
        raster_backend="jax", max_instances=16384, max_slots=512,
        kplanes_config={"grid_dimensions": 2, "input_coordinate_dim": 4,
                        "output_coordinate_dim": 8,
                        "resolution": [16, 16, 16, 8]},
        multires=[1], sh_degree=1, dsh=True, scale_reg=True,
        lambda_dscale_reg=8e-6, min_intergral=1e-4, min_interval=0.5,
        position_lr_max_steps=120, mlp_lr=1.6e-3)
    # shrink the init point cloud for CPU speed
    from saro_gs_tpu import scene as scene_mod
    from saro_gs_tpu.data import readers

    orig = readers.read_blender_scene

    def small_reader(*a, **k):
        info = orig(*a, **k)
        pc = info.point_cloud
        sel = np.random.RandomState(0).choice(pc.points.shape[0], 400,
                                              replace=False)
        from saro_gs_tpu.models.gaussians import PointCloud
        return info._replace(point_cloud=PointCloud(
            points=pc.points[sel], colors=pc.colors[sel],
            times=pc.times[sel]))

    readers.SCENE_READERS["blender"] = small_reader
    try:
        sc = scene_mod.Scene(cfg)
    finally:
        readers.SCENE_READERS["blender"] = orig
    assert int(np.asarray(sc.alive).sum()) == 400

    from saro_gs_tpu.train.trainer import Trainer
    tr = Trainer(cfg, sc)
    # capture loss trajectory
    tr.run(max_iterations=cfg.iterations, log_every=20)
    hist = tr.history
    assert len(hist) >= 5
    first, last = hist[0], hist[-1]
    assert last["loss"] < first["loss"] * 0.7, (first, last)
    assert np.isfinite(last["loss"])

    # test-set PSNR is meaningfully above random-noise level
    from saro_gs_tpu.eval import quick_test_psnr
    psnr = quick_test_psnr(tr, sc.test_cameras())
    assert psnr > 14.0, psnr

    # golden-trajectory gate: convergence SPEED, not just non-breakage —
    # loss/PSNR at fixed iterations vs a committed reference run (VERDICT
    # r2 task 8; regenerate with SARO_UPDATE_GOLDEN=1 after an
    # intentional optimizer/loss change).
    golden_path = os.path.join(os.path.dirname(__file__), "golden",
                               "toy_trajectory.json")
    traj = {str(h["it"]): {"loss": float(h["loss"]),
                           "psnr": float(h["psnr"])} for h in hist}
    traj["test_psnr"] = psnr
    if os.environ.get("SARO_UPDATE_GOLDEN") == "1":
        os.makedirs(os.path.dirname(golden_path), exist_ok=True)
        with open(golden_path, "w") as f:
            json.dump(traj, f, indent=1)
    else:
        with open(golden_path) as f:
            golden = json.load(f)
        for it, g in golden.items():
            if it == "test_psnr":
                assert psnr > g - 1.5, (psnr, g)
                continue
            assert it in traj, f"missing history record at iter {it}"
            # a regression that halves convergence speed must fail
            assert traj[it]["loss"] < g["loss"] * 1.3, (it, traj[it], g)
            assert traj[it]["psnr"] > g["psnr"] - 1.5, (it, traj[it], g)

    # checkpoint roundtrip
    path = sc.save("final", tr.state.points, tr.state.nets, tr.state.alive)
    assert os.path.exists(path)
    cfg2 = load_config(
        source_path=scene_dir, model_path=cfg.model_path,
        loader="blender", duration=DURATION, resolution=1,
        capacity=2048, raster_backend="jax",
        kplanes_config=cfg.kplanes_config, multires=[1], sh_degree=1,
        dsh=True, preprocesspoints=0)
    try:
        readers.SCENE_READERS["blender"] = small_reader
        sc2 = scene_mod.Scene(cfg2, load_iteration="final")
    finally:
        readers.SCENE_READERS["blender"] = orig
    n1 = int(np.asarray(tr.state.alive).sum())
    n2 = int(np.asarray(sc2.alive).sum())
    assert n1 == n2
    # same render from restored state
    from saro_gs_tpu.eval import Evaluator
    ev = Evaluator(cfg2, sc2)
    # >10 cameras engages the 4-pass amortized-sync FPS protocol
    # (test.py:150-163 shape, pass-level rolling-window sync)
    cams12 = sc2.test_cameras() * 6
    res = ev.render_set("test", cams12, sc2.params, sc2.nets,
                        sc2.alive, iteration="final", measure_fps=True)
    assert res["PSNR"] > 14.0, res
    assert res["FPS"] is not None and res["FPS"] > 0, res


def test_nan_guard_skips_bad_step(rng, tmp_path):
    """A poisoned parameter row (inf xyz) must not destroy the state: the
    step is skipped (bad_step=1), parameters unchanged (train/step.py
    non-finite guard; the reference asserts instead)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from saro_gs_tpu.config import load_config
    from saro_gs_tpu import scene as scene_mod
    from saro_gs_tpu.data import readers
    from saro_gs_tpu.models.gaussians import PointCloud
    from saro_gs_tpu.train.trainer import Trainer

    root = str(tmp_path / "scene")
    _write_scene(root, np.random.RandomState(7))
    cfg = load_config(
        source_path=root, model_path=str(tmp_path / "m"),
        loader="blender", duration=DURATION, resolution=1, batch=2,
        iterations=4, static_iteration=-1, densify=0, preprocesspoints=0,
        capacity=512, raster_backend="jax", max_instances=8192,
        max_slots=256,
        kplanes_config={"grid_dimensions": 2, "input_coordinate_dim": 4,
                        "output_coordinate_dim": 8,
                        "resolution": [16, 16, 16, 8]},
        multires=[1], sh_degree=1, min_intergral=1e-4, min_interval=0.5)
    orig = readers.read_blender_scene

    def small_reader(*a, **k):
        info = orig(*a, **k)
        pc = info.point_cloud
        sel = np.random.RandomState(0).choice(pc.points.shape[0], 100,
                                              replace=False)
        return info._replace(point_cloud=PointCloud(
            points=pc.points[sel], colors=pc.colors[sel],
            times=pc.times[sel]))

    readers.SCENE_READERS["blender"] = small_reader
    try:
        sc = scene_mod.Scene(cfg)
    finally:
        readers.SCENE_READERS["blender"] = orig
    tr = Trainer(cfg, sc)
    # poison one alive row with a non-finite position
    pts = tr.state.points._replace(
        xyz=tr.state.points.xyz.at[0, 0].set(jnp.inf))
    tr.state = tr.state._replace(points=pts)
    loader = sc.train_loader(2, num_workers=1, seed=1)
    batch = next(iter(loader))
    args = (jax.tree_util.tree_map(jnp.asarray, batch.cams),
            jnp.asarray(batch.gt), jnp.asarray(batch.timestamps))
    before = np.asarray(tr.state.points.scaling)
    st, m = tr._train_step(tr.state, *args, tr._sh_mask(1), tr._flag(True),
                           st=tr._statics(), stage="dynamatic")
    # either the poisoned row is culled finite (render fine) or the update
    # was skipped; in both cases the state stays finite on alive rows
    if int(m["bad_step"]):
        np.testing.assert_array_equal(np.asarray(st.points.scaling), before)
        # the bad_src bitmask must attribute the skip to at least one
        # gradient group (inf xyz poisons loss and/or grads)
        from saro_gs_tpu.train.step import bad_src_names
        srcs = bad_src_names(int(m["bad_src"]))
        assert srcs, m
    alive = np.asarray(st.alive) > 0
    assert np.isfinite(np.asarray(st.points.scaling)[alive]).all()
    assert np.isfinite(np.asarray(st.points.xyz)[alive][1:]).all()
