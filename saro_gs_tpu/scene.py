"""Scene assembly (L3): dataset -> model state + cameras + checkpoints.

Mirrors scene/__init__.py: loader dispatch, field AABB from the point
cloud, cameras-extent radius, point-cloud preprocessing, model creation or
checkpoint restore, and the dual PLY+npz checkpoint layout
(``point_cloud/iteration_<n>/point_cloud.ply`` with a sibling net file, the
reference uses .pth; we use .npz for the field/MLP pytrees).
"""
from __future__ import annotations

import json
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .data import ply
from .data.cameras import Camera, camera_to_json
from .data.dataset import BatchLoader
from .data.pointcloud import preprocess_points
from .data.readers import SCENE_READERS, SceneInfo
from .models import densify as dens
from .models import field as field_mod
from .models import gaussians as gm


def _next_pow2(n: int) -> int:
    c = 1
    while c < n:
        c <<= 1
    return c


def load_gaussian_checkpoint(path: str, nets_template, capacity=None):
    """point_cloud.ply + sibling .npz -> (params, nets, alive, fstatic, n).

    ``capacity`` — None keeps the exact point count (eval/bench: the sort
    cost scales with capacity, so no padding); an int pads with dead rows;
    a callable receives n and returns the capacity (training restore).
    Counterpart of save: Scene.save / reference load_ply
    (saro_gaussian.py:458-526)."""
    d = ply.load_gaussian_ply(path)
    n = d["xyz"].shape[0]
    cap = n if capacity is None else (
        capacity(n) if callable(capacity) else capacity)

    def pad(x, fill=0.0):
        padding = [(0, cap - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.asarray(np.pad(x, padding, constant_values=fill),
                           jnp.float32)

    params = gm.GaussianParams(
        xyz=pad(d["xyz"]), features_dc=pad(d["f_dc"]),
        features_rest=pad(d["f_rest"]),
        scaling=pad(d["scaling"], fill=-10.0),
        rotation=pad(d["rotation"]),
        opacity=pad(d["opacity"], fill=-10.0),
        temporal_pos=pad(d["temporal_pos"], fill=0.5))
    alive = (jnp.arange(cap) < n).astype(jnp.float32)
    npz = np.load(path.replace(".ply", ".npz"))
    flat = [jnp.asarray(npz[f"leaf_{i}"])
            for i in range(int(npz["num_leaves"]))]
    treedef = jax.tree_util.tree_structure(nets_template)
    nets = jax.tree_util.tree_unflatten(treedef, flat)
    fstatic = field_mod.FieldStatic(
        aabb_min=jnp.asarray(npz["aabb_min"]),
        aabb_max=jnp.asarray(npz["aabb_max"]),
        duration=jnp.asarray(npz["duration"]))
    return params, nets, alive, fstatic, n


class Scene:
    def __init__(self, cfg: Config, load_iteration: Optional[str] = None,
                 is_rendering: bool = False):
        self.cfg = cfg
        self.model_path = cfg.model_path
        self.mcfg = cfg.model_config()

        reader = SCENE_READERS[cfg.loader]
        if cfg.loader == "colmap":
            self.info: SceneInfo = reader(cfg.source_path,
                                          duration=cfg.duration,
                                          resolution=cfg.resolution,
                                          eval_split=cfg.eval,
                                          images_dir=cfg.images)
        else:
            self.info = reader(cfg.source_path, duration=cfg.duration,
                               resolution=cfg.resolution,
                               eval_split=cfg.eval,
                               white_background=cfg.white_background)

        pcd = self.info.point_cloud
        xyz_max = pcd.points.max(axis=0)
        xyz_min = pcd.points.min(axis=0)
        self.fstatic = field_mod.make_static(xyz_min, xyz_max, cfg.duration)
        self.cameras_extent = float(self.info.nerf_radius)

        key = jax.random.PRNGKey(cfg.seed)
        knet, kpts = jax.random.split(key)
        self.nets = gm.init_nets(knet, self.mcfg)

        if load_iteration is not None:
            ckpt = os.path.join(self.model_path, "point_cloud",
                                f"iteration_{load_iteration}",
                                "point_cloud.ply")
            self.load_checkpoint(ckpt)
        else:
            pcd = preprocess_points(pcd, cfg.preprocesspoints)
            n = pcd.points.shape[0]
            capacity = max(cfg.capacity, _next_pow2(n))
            self.params, self.alive = gm.create_from_pcd(
                kpts, pcd, capacity, self.mcfg)
            if cfg.model_path:
                os.makedirs(cfg.model_path, exist_ok=True)
                cams = list(self.info.test_cameras) + \
                    list(self.info.train_cameras)
                with open(os.path.join(cfg.model_path, "cameras.json"),
                          "w") as f:
                    json.dump([camera_to_json(i, c)
                               for i, c in enumerate(cams)], f, indent=2)

    # ---- camera access (scene/__init__.py:139-163) ------------------------
    def train_loader(self, batch_size: int, num_workers: int = 4,
                     seed: int = 666, process_index: Optional[int] = None,
                     process_count: Optional[int] = None) -> BatchLoader:
        """Per-host loader: on a multi-host runtime each process feeds its
        disjoint round-robin camera shard with batch_size/process_count
        local views; the global batch is their concatenation
        (parallel/runtime.host_shard + make_global_batch).  The reference's
        DataLoader workers (train.py:116-117) scale within one host only.
        """
        import jax
        from .parallel import runtime
        pc = jax.process_count() if process_count is None else process_count
        pi = jax.process_index() if process_index is None else process_index
        cameras = self.info.train_cameras
        local_bs = batch_size
        if pc > 1:
            cameras = runtime.host_shard(cameras, pi, pc)
            assert batch_size % pc == 0, (batch_size, pc)
            local_bs = batch_size // pc
        return BatchLoader(cameras, local_bs,
                           white_background=self.cfg.white_background,
                           num_workers=num_workers, seed=seed + 997 * pi)

    def test_cameras(self) -> List[Camera]:
        return self.info.test_cameras

    def val_cameras(self) -> List[Camera]:
        return self.info.val_cameras

    # ---- checkpoints ------------------------------------------------------
    def save(self, iteration, params: gm.GaussianParams, nets: gm.NetParams,
             alive: jnp.ndarray, best_ckpt: bool = False):
        tag = "best" if best_ckpt else str(iteration)
        out_dir = os.path.join(self.model_path, "point_cloud",
                               f"iteration_{tag}")
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, "point_cloud.ply")
        keep = np.asarray(alive) > 0
        ply.save_gaussian_ply(
            path,
            np.asarray(params.xyz)[keep],
            np.asarray(params.features_dc)[keep],
            np.asarray(params.features_rest)[keep],
            np.asarray(params.opacity)[keep],
            np.asarray(params.scaling)[keep],
            np.asarray(params.rotation)[keep],
            np.asarray(params.temporal_pos)[keep])
        # nets + field static: flat npz (reference stores a torch .pth)
        flat, treedef = jax.tree_util.tree_flatten(nets)
        np.savez(path.replace(".ply", ".npz"),
                 aabb_min=np.asarray(self.fstatic.aabb_min),
                 aabb_max=np.asarray(self.fstatic.aabb_max),
                 duration=np.asarray(self.fstatic.duration),
                 num_leaves=len(flat),
                 **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)})
        return path

    def load_checkpoint(self, path: str):
        (self.params, self.nets, self.alive, self.fstatic,
         _n) = load_gaussian_checkpoint(
            path, self.nets,
            capacity=lambda n: max(self.cfg.capacity, _next_pow2(n)))

    def record_points(self, iteration, note: str, n_points: int):
        """exp_log.txt journal (helper_train.recordpointshelper:189-194)."""
        if not self.model_path:
            return
        with open(os.path.join(self.model_path, "exp_log.txt"), "a") as f:
            f.write(f"iteration at {iteration}\n")
            f.write(f"{note} pointsnumber {n_points}\n")
