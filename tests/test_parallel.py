"""Multi-device (virtual 8-CPU mesh) tests: sharded == single-device."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saro_gs_tpu.ops.rasterize import RasterConfig, rasterize
from saro_gs_tpu.parallel import shard
from tests.scene_fixtures import make_camera, make_gaussians


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_tile_sharded_render_matches_single(rng):
    cam, meta = make_camera(width=64, height=64)
    means, scales, quats, opac, shs = make_gaussians(rng, n=50)
    colors = np.abs(shs[:, 0])
    w, h = meta["width"], meta["height"]
    cfg = RasterConfig(tile_x=16, tile_y=16, chunk=8, max_instances=8192,
                       max_slots=256)
    ref = rasterize(jnp.asarray(means), jnp.asarray(scales),
                    jnp.asarray(quats), jnp.asarray(opac), cam,
                    jnp.zeros(3), width=w, height=h, sh_degree=0,
                    config=cfg, colors_precomp=jnp.asarray(colors))
    for n_tile in (2, 4):
        img = shard.tile_sharded_render(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(colors), cam, jnp.zeros(3),
            width=w, height=h, tile_x=16, tile_y=16, chunk=8,
            max_instances=8192, max_slots=256, n_tile=n_tile)
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref.color),
                                   atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_tile_sharded_render_pallas_shs(rng):
    """Strip sharding with the FULL rasterizer: pallas backend + SH."""
    cam, meta = make_camera(width=64, height=56)   # partial bottom tile
    means, scales, quats, opac, shs = make_gaussians(rng, n=50)
    w, h = meta["width"], meta["height"]
    cfg = RasterConfig(tile_x=16, tile_y=16, chunk=8, max_instances=8192,
                       max_slots=256, backend="pallas")
    ref = rasterize(jnp.asarray(means), jnp.asarray(scales),
                    jnp.asarray(quats), jnp.asarray(opac), cam,
                    jnp.zeros(3), width=w, height=h, sh_degree=3,
                    config=cfg, shs=jnp.asarray(shs))
    img = shard.tile_sharded_render(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac), None, cam, jnp.zeros(3),
        width=w, height=h, n_tile=2, shs=jnp.asarray(shs), sh_degree=3,
        config=cfg)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref.color),
                               atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_dp_train_step_matches_single(rng, tmp_path):
    """4-view batch on 4 devices == same batch on one device."""
    import os
    from tests.test_e2e_train import _write_scene, DURATION
    from saro_gs_tpu.config import load_config
    from saro_gs_tpu import scene as scene_mod
    from saro_gs_tpu.data import readers
    from saro_gs_tpu.train.trainer import Trainer
    from saro_gs_tpu.models.gaussians import PointCloud

    root = str(tmp_path / "scene")
    _write_scene(root, np.random.RandomState(7))

    def cfg_for(mesh_data):
        return load_config(
            source_path=root, model_path=str(tmp_path / f"m{mesh_data}"),
            loader="blender", duration=DURATION, resolution=1,
            batch=4, iterations=10, static_iteration=-1, densify=0,
            preprocesspoints=0, capacity=512, raster_backend="jax",
            max_instances=8192, max_slots=256,
            kplanes_config={"grid_dimensions": 2, "input_coordinate_dim": 4,
                            "output_coordinate_dim": 8,
                            "resolution": [16, 16, 16, 8]},
            multires=[1], sh_degree=1, dsh=True, min_intergral=1e-4,
            min_interval=0.5, mesh_data=mesh_data)

    orig = readers.read_blender_scene

    def small_reader(*a, **k):
        info = orig(*a, **k)
        pc = info.point_cloud
        sel = np.random.RandomState(0).choice(pc.points.shape[0], 200,
                                              replace=False)
        return info._replace(point_cloud=PointCloud(
            points=pc.points[sel], colors=pc.colors[sel],
            times=pc.times[sel]))

    readers.SCENE_READERS["blender"] = small_reader
    try:
        sc1 = scene_mod.Scene(cfg_for(1))
        sc4 = scene_mod.Scene(cfg_for(4))
    finally:
        readers.SCENE_READERS["blender"] = orig

    tr1 = Trainer(cfg_for(1), sc1)
    tr4 = Trainer(cfg_for(4), sc4)
    loader = sc1.train_loader(4, num_workers=2, seed=1)
    batch = next(iter(loader))
    args = (jax.tree_util.tree_map(jnp.asarray, batch.cams),
            jnp.asarray(batch.gt), jnp.asarray(batch.timestamps))
    s1, m1 = tr1._train_step(tr1.state, *args, tr1._sh_mask(1),
                             tr1._flag(True), st=tr1._statics(),
                             stage="dynamatic")
    s4, m4 = tr4._train_step(tr4.state, *args, tr4._sh_mask(1),
                             tr4._flag(True), st=tr4._statics(),
                             stage="dynamatic")
    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]),
                               rtol=1e-5)
    # updated params agree to fp tolerance (reduction order differs)
    a = np.asarray(s1.points.xyz)
    b = np.asarray(s4.points.xyz)
    np.testing.assert_allclose(a, b, atol=1e-5)
    ga = np.asarray(s1.aux.xyz_grad_accum)
    gb = np.asarray(s4.aux.xyz_grad_accum)
    np.testing.assert_allclose(ga, gb, rtol=1e-3, atol=1e-7)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("mesh_shape", [(1, 4), (2, 4)])
def test_tile_train_step_matches_single(rng, tmp_path, mesh_shape):
    """Tile-sharded (and composed data x tile) training step produces the
    same update as the single-device step — per-Gaussian grads psum'd over
    the ``tile`` axis (VERDICT r1 task 4)."""
    from tests.test_e2e_train import _write_scene, DURATION
    from saro_gs_tpu.config import load_config
    from saro_gs_tpu import scene as scene_mod
    from saro_gs_tpu.data import readers
    from saro_gs_tpu.train.trainer import Trainer
    from saro_gs_tpu.models.gaussians import PointCloud

    n_data, n_tile = mesh_shape
    root = str(tmp_path / "scene")
    _write_scene(root, np.random.RandomState(7))

    def cfg_for(md, mt):
        return load_config(
            source_path=root, model_path=str(tmp_path / f"m{md}x{mt}"),
            loader="blender", duration=DURATION, resolution=1,
            batch=2 * md, iterations=10, static_iteration=-1, densify=0,
            preprocesspoints=0, capacity=512, raster_backend="jax",
            max_instances=8192, max_slots=256,
            lambda_dscale_reg=1e-4, scale_reg=True,
            kplanes_config={"grid_dimensions": 2, "input_coordinate_dim": 4,
                            "output_coordinate_dim": 8,
                            "resolution": [16, 16, 16, 8]},
            multires=[1], sh_degree=1, dsh=True, min_intergral=1e-4,
            min_interval=0.5, mesh_data=md, mesh_tile=mt)

    orig = readers.read_blender_scene

    def small_reader(*a, **k):
        info = orig(*a, **k)
        pc = info.point_cloud
        sel = np.random.RandomState(0).choice(pc.points.shape[0], 200,
                                              replace=False)
        return info._replace(point_cloud=PointCloud(
            points=pc.points[sel], colors=pc.colors[sel],
            times=pc.times[sel]))

    readers.SCENE_READERS["blender"] = small_reader
    try:
        sc1 = scene_mod.Scene(cfg_for(1, 1))
        scn = scene_mod.Scene(cfg_for(n_data, n_tile))
    finally:
        readers.SCENE_READERS["blender"] = orig

    tr1 = Trainer(cfg_for(1, 1), sc1)
    trn = Trainer(cfg_for(n_data, n_tile), scn)
    loader = sc1.train_loader(2 * n_data, num_workers=2, seed=1)
    batch = next(iter(loader))
    args = (jax.tree_util.tree_map(jnp.asarray, batch.cams),
            jnp.asarray(batch.gt), jnp.asarray(batch.timestamps))
    s1, m1 = tr1._train_step(tr1.state, *args, tr1._sh_mask(1),
                             tr1._flag(True), st=tr1._statics(),
                             stage="dynamatic")
    sn, mn = trn._train_step(trn.state, *args, trn._sh_mask(1),
                             trn._flag(True), st=trn._statics(),
                             stage="dynamatic")
    np.testing.assert_allclose(float(m1["Ll1"]), float(mn["Ll1"]),
                               rtol=1e-5)
    for name in ("xyz", "scaling", "opacity", "temporal_pos"):
        a = np.asarray(getattr(s1.points, name))
        b = np.asarray(getattr(sn.points, name))
        np.testing.assert_allclose(a, b, atol=2e-5, err_msg=name)
    # the field grids updated through the strip-sharded backward too
    a = np.asarray(s1.nets.grids[0][0])
    b = np.asarray(sn.nets.grids[0][0])
    np.testing.assert_allclose(a, b, atol=2e-5)
    ga = np.asarray(s1.aux.xyz_grad_accum)
    gb = np.asarray(sn.aux.xyz_grad_accum)
    np.testing.assert_allclose(ga, gb, rtol=1e-3, atol=1e-6)


def test_multihost_loader_shards_are_disjoint(rng, tmp_path):
    """Faked process_index/count: each host's loader draws from a disjoint
    camera shard whose union is the full set, with batch/pc local views —
    the concatenation IS the global batch (VERDICT r1 task 5)."""
    from tests.test_e2e_train import _write_scene, DURATION
    from saro_gs_tpu.config import load_config
    from saro_gs_tpu import scene as scene_mod

    root = str(tmp_path / "scene")
    _write_scene(root, np.random.RandomState(7))
    cfg = load_config(source_path=root, model_path=str(tmp_path / "m"),
                      loader="blender", duration=DURATION, resolution=1,
                      preprocesspoints=0, capacity=512)
    sc = scene_mod.Scene(cfg)
    n_total = len(sc.info.train_cameras)
    pc = 2
    shards = []
    for pi in range(pc):
        loader = sc.train_loader(4, num_workers=1, seed=3,
                                 process_index=pi, process_count=pc)
        assert loader.batch_size == 2          # 4 global / 2 hosts
        shards.append({id(c) for c in loader.cameras})
        batch = next(iter(loader))
        assert batch.gt.shape[0] == 2
    assert not (shards[0] & shards[1])
    assert len(shards[0] | shards[1]) == n_total


def test_runtime_helpers():
    from saro_gs_tpu.parallel import runtime
    assert runtime.init_distributed() == 0
    # round-robin host shard is identity on a single process
    assert runtime.host_shard([1, 2, 3]) == [1, 2, 3]
    assert runtime.host_shard([1, 2, 3, 4], process_index=1,
                              process_count=2) == [2, 4]
    mesh = runtime.global_mesh(n_data=4, n_tile=2)
    assert mesh.shape == {"data": 4, "tile": 2}
    import numpy as np
    batch = {"x": np.ones((8, 3))}
    out = runtime.make_global_batch(runtime.global_mesh(n_data=8), batch)
    assert out["x"].shape == (8, 3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_two_process_train_matches_single(tmp_path):
    """TRUE multi-host: two subprocesses, each 4 virtual CPU devices,
    joined by a real jax.distributed TCP coordinator, train 3 dp steps of
    the toy scene — updates must match a single-process run on the same
    8-device mesh (VERDICT r2 task 6: covers coordinator init, gloo
    collectives across the process boundary, and cross-process global
    batch assembly that the faked-index tests bypass)."""
    import os
    import socket
    import subprocess
    import sys

    from tests.test_e2e_train import _write_scene, DURATION
    from saro_gs_tpu.config import load_config
    from saro_gs_tpu import scene as scene_mod
    from saro_gs_tpu.data import readers
    from saro_gs_tpu.data.dataset import CameraBatch, stack_camera_params
    from saro_gs_tpu.models.gaussians import PointCloud
    from saro_gs_tpu.train.trainer import Trainer

    root = str(tmp_path / "scene")
    _write_scene(root, np.random.RandomState(7))

    # free TCP port for the coordinator; skip loudly if sockets are banned
    try:
        s = socket.socket()
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
        s.close()
    except OSError as e:
        pytest.skip(f"environment forbids local sockets: {e}")

    env = dict(os.environ)
    env.update({
        # disable the axon sitecustomize (it imports jax at interpreter
        # start, freezing the backend before the worker can configure it)
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "JAX_COMPILATION_CACHE_DIR": "",
        "PYTHONPATH": os.path.dirname(os.path.dirname(__file__)),
    })
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    outs = [str(tmp_path / f"w{i}.npz") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, worker, root, outs[i], str(i), "2", str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, cwd=os.path.dirname(os.path.dirname(__file__)))
        for i in range(2)]
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            logs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    # single-process reference on the same 8-device mesh, same batch set
    orig = readers.read_blender_scene

    def small_reader(*a, **k):
        info = orig(*a, **k)
        pc = info.point_cloud
        sel = np.random.RandomState(0).choice(pc.points.shape[0], 200,
                                              replace=False)
        return info._replace(point_cloud=PointCloud(
            points=pc.points[sel], colors=pc.colors[sel],
            times=pc.times[sel]))

    readers.SCENE_READERS["blender"] = small_reader
    try:
        cfg = load_config(
            source_path=root, model_path=str(tmp_path / "ref"),
            loader="blender", duration=DURATION, resolution=1,
            batch=8, iterations=10, static_iteration=-1, densify=0,
            preprocesspoints=0, capacity=512, raster_backend="jax",
            max_instances=8192, max_slots=256,
            kplanes_config={"grid_dimensions": 2,
                            "input_coordinate_dim": 4,
                            "output_coordinate_dim": 8,
                            "resolution": [16, 16, 16, 8]},
            multires=[1], sh_degree=1, dsh=True, min_intergral=1e-4,
            min_interval=0.5, mesh_data=8)
        sc = scene_mod.Scene(cfg)
    finally:
        readers.SCENE_READERS["blender"] = orig
    tr = Trainer(cfg, sc)
    cams8 = list(sc.info.train_cameras[:8])
    # same global composition the workers assemble: host-shard order
    ordered = cams8[0::2] + cams8[1::2]
    batch = CameraBatch(
        cams=stack_camera_params(ordered),
        gt=np.stack([c.load_image(cfg.white_background)
                     for c in ordered]),
        timestamps=np.asarray([c.timestamp for c in ordered],
                              np.float32).reshape(-1, 1, 1),
        indices=np.arange(8))
    args = (jax.tree_util.tree_map(jnp.asarray, batch.cams),
            jnp.asarray(batch.gt), jnp.asarray(batch.timestamps))
    for _ in range(3):
        tr.state, metrics = tr._train_step(
            tr.state, *args, tr._sh_mask(1), tr._flag(True),
            st=tr._statics(), stage="dynamatic")

    w0 = np.load(outs[0])
    w1 = np.load(outs[1])
    # both processes hold identical replicated state...
    np.testing.assert_allclose(w0["xyz"], w1["xyz"], atol=1e-6)
    np.testing.assert_allclose(w0["grid0"], w1["grid0"], atol=1e-6)
    # ...that matches the single-process run (fp reassociation tolerance)
    np.testing.assert_allclose(float(w0["loss"]), float(metrics["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(w0["xyz"], np.asarray(tr.state.points.xyz),
                               atol=2e-5)
    np.testing.assert_allclose(w0["opacity"],
                               np.asarray(tr.state.points.opacity),
                               atol=2e-5)
    np.testing.assert_allclose(w0["grid0"],
                               np.asarray(tr.state.nets.grids[0][0]),
                               atol=2e-5)
