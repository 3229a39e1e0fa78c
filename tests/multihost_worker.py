"""Worker process for the TRUE 2-process multi-host test.

Spawned twice by tests/test_parallel.py::test_two_process_train_matches
with a local TCP coordinator; each process drives 4 virtual CPU devices
(XLA_FLAGS set by the parent — it must be in the LAUNCH env because the
axon sitecustomize imports jax before this module body runs).

Covers what the faked-process_index tests bypass: real
``jax.distributed.initialize`` (parallel/runtime.py:24-37), global-mesh
construction over devices of BOTH processes, cross-process global batch
assembly via ``make_array_from_process_local_data``
(trainer._globalize -> runtime.make_global_batch), and gloo-backed
collectives inside the dp train step.  The reference has no multi-host
path at all (single hard-coded cuda:0, utils/general_utils.py:223).
"""
import sys


def main():
    scene_root, out_path, pid_s, nproc_s, port = sys.argv[1:6]
    pid, nproc = int(pid_s), int(nproc_s)

    import jax
    from saro_gs_tpu.parallel import runtime
    idx = runtime.init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid)
    assert idx == pid, (idx, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()

    import numpy as np
    from saro_gs_tpu import scene as scene_mod
    from saro_gs_tpu.config import load_config
    from saro_gs_tpu.data import readers
    from saro_gs_tpu.data.dataset import CameraBatch, stack_camera_params
    from saro_gs_tpu.models.gaussians import PointCloud
    from saro_gs_tpu.train.trainer import Trainer

    # identical 200-point downselect as the in-process reference run
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
    cfg = load_config(
        source_path=scene_root, model_path=out_path + ".model",
        loader="blender", duration=10, resolution=1,
        batch=8, iterations=10, static_iteration=-1, densify=0,
        preprocesspoints=0, capacity=512, raster_backend="jax",
        max_instances=8192, max_slots=256,
        kplanes_config={"grid_dimensions": 2, "input_coordinate_dim": 4,
                        "output_coordinate_dim": 8,
                        "resolution": [16, 16, 16, 8]},
        multires=[1], sh_degree=1, dsh=True, min_intergral=1e-4,
        min_interval=0.5, mesh_data=8)
    sc = scene_mod.Scene(cfg)
    tr = Trainer(cfg, sc)
    tr._global_mesh = None

    # deterministic global batch: cameras {0..7}; this host contributes
    # its round-robin shard (host_shard semantics) of 4 local views
    cams8 = list(sc.info.train_cameras[:8])
    local = runtime.host_shard(cams8, pid, nproc)
    batch = CameraBatch(
        cams=stack_camera_params(local),
        gt=np.stack([c.load_image(cfg.white_background) for c in local]),
        timestamps=np.asarray([c.timestamp for c in local],
                              np.float32).reshape(-1, 1, 1),
        indices=np.arange(len(local)))

    metrics = None
    for _ in range(3):
        cams_g, gt_g, ts_g = tr._globalize(batch)
        tr.state, metrics = tr._train_step(
            tr.state, cams_g, gt_g, ts_g, tr._sh_mask(1), tr._flag(True),
            st=tr._statics(), stage="dynamatic")

    np.savez(out_path,
             xyz=np.asarray(jax.device_get(tr.state.points.xyz)),
             opacity=np.asarray(jax.device_get(tr.state.points.opacity)),
             grid0=np.asarray(jax.device_get(tr.state.nets.grids[0][0])),
             loss=np.float64(metrics["loss"]),
             ll1=np.float64(metrics["Ll1"]))
    print(f"[worker {pid}] ok", flush=True)


if __name__ == "__main__":
    main()
