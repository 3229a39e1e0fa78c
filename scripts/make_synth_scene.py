"""Generate a synthetic multi-view dynamic-scene dataset from a ground-truth
Gaussian set, rendered with this repo's own rasterizer.

No real capture dataset ships in this environment, so this builds the
largest feasible training target: a Neural3D-like multi-camera video rig
(N cameras on a ring, camera 0 held out for test — mirroring the
reference's first-camera-is-test split, dataset_readers.py:391-405) written
in the Blender/D-NeRF on-disk layout (transforms_{train,test}.json + PNGs,
dataset_readers.py:464-532) that `saro_gs_tpu.data.readers.read_blender_scene`
loads directly.

The ground-truth scene is a structured Gaussian set (~44k splats):
  * checkerboard floor disk (static),
  * banded sphere sculpture (static),
  * striped torus ring rotating a full revolution over the sequence,
  * bouncing two-tone ball,
  * oscillating box sliding along x.

The init point cloud (points3d.ply) mimics per-frame COLMAP output: noisy
samples of GT surface positions at random frames with noisy colors —
structure the reference also gets from COLMAP, not a copy of the GT set.

Usage:
  python scripts/make_synth_scene.py --out datasets/synth_arena \
      [--width 676] [--height 507] [--frames 50] [--cams 21]
"""
import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SH_C0 = 0.28209479177387814


def build_gt(seed: int = 7):
    """Returns static arrays + a motion function gt_at(t) -> (xyz, quats)."""
    rng = np.random.RandomState(seed)
    xyzs, cols, scales, groups = [], [], [], []

    def add(xyz, col, scale, group):
        xyzs.append(xyz)
        cols.append(np.broadcast_to(col, xyz.shape).copy()
                    if np.ndim(col) == 1 else col)
        scales.append(np.broadcast_to(scale, xyz.shape).copy()
                      if np.ndim(scale) <= 1 else scale)
        groups.append(np.full(xyz.shape[0], group))

    # --- floor disk (static) ---------------------------------------------
    n = 14000
    r = np.sqrt(rng.uniform(0, 1, n)) * 1.7
    th = rng.uniform(0, 2 * np.pi, n)
    xyz = np.stack([r * np.cos(th), r * np.sin(th), np.full(n, -1.0)], 1)
    check = (np.floor(xyz[:, 0] / 0.4) + np.floor(xyz[:, 1] / 0.4)) % 2
    col = np.where(check[:, None] > 0, [0.82, 0.78, 0.70], [0.30, 0.36, 0.48])
    sc = np.full((n, 3), 0.035)
    sc[:, 2] = 0.005
    add(xyz, col, sc, "static")

    # --- banded sphere sculpture (static) --------------------------------
    n = 9000
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    c0 = np.array([-0.65, -0.45, -0.55])
    xyz = c0 + 0.42 * v
    band = (np.floor((v[:, 2] + 1) * 4) % 2)
    col = np.where(band[:, None] > 0, [0.85, 0.35, 0.25], [0.92, 0.80, 0.30])
    add(xyz, col, np.full((n, 3), 0.022), "static")

    # --- rotating striped torus ring -------------------------------------
    n = 12000
    u = rng.uniform(0, 2 * np.pi, n)     # around main ring
    w = rng.uniform(0, 2 * np.pi, n)     # around tube
    R0, r0 = 0.72, 0.13
    xyz = np.stack([
        (R0 + r0 * np.cos(w)) * np.cos(u),
        (R0 + r0 * np.cos(w)) * np.sin(u),
        r0 * np.sin(w) - 0.15], 1)
    stripe = (np.floor(u / (2 * np.pi) * 10) % 2)
    col = np.where(stripe[:, None] > 0, [0.20, 0.65, 0.90], [0.95, 0.95, 0.95])
    add(xyz, col, np.full((n, 3), 0.020), "ring")

    # --- bouncing two-tone ball ------------------------------------------
    n = 6000
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    xyz = 0.24 * v            # centered; offset applied by motion
    col = np.where(v[:, [0]] > 0, [0.25, 0.80, 0.35], [0.55, 0.20, 0.75])
    add(xyz, col, np.full((n, 3), 0.020), "ball")

    # --- oscillating box --------------------------------------------------
    n = 5000
    face = rng.randint(0, 6, n)
    uv = rng.uniform(-1, 1, (n, 2))
    ext = np.array([0.18, 0.18, 0.30])
    xyz = np.zeros((n, 3))
    for f in range(6):
        m = face == f
        ax = f // 2
        sgn = 1.0 if f % 2 == 0 else -1.0
        rest = [a for a in range(3) if a != ax]
        xyz[m, ax] = sgn * ext[ax]
        xyz[m, rest[0]] = uv[m, 0] * ext[rest[0]]
        xyz[m, rest[1]] = uv[m, 1] * ext[rest[1]]
    col = np.stack([0.9 - 0.3 * (face / 5), 0.45 + 0.1 * (face / 5),
                    np.full(n, 0.2)], 1)
    add(xyz, col, np.full((n, 3), 0.018), "box")

    xyz = np.concatenate(xyzs).astype(np.float32)
    col = np.clip(np.concatenate(cols), 0, 1).astype(np.float32)
    scale = np.concatenate(scales).astype(np.float32)
    group = np.concatenate(groups)
    ntot = xyz.shape[0]

    shs = np.zeros((ntot, 16, 3), np.float32)
    shs[:, 0] = (col - 0.5) / SH_C0
    # mild view dependence on degree-1 coefficients
    shs[:, 1:4] = rng.normal(0, 0.03, (ntot, 3, 3))
    opac = np.full(ntot, 0.95, np.float32)
    quats = np.zeros((ntot, 4), np.float32)
    quats[:, 0] = 1.0

    ring, ball, box = group == "ring", group == "ball", group == "box"
    base = xyz.copy()

    def gt_at(t: float) -> np.ndarray:
        """Positions at time t in [0, 1]."""
        p = base.copy()
        a = 2 * np.pi * t                      # one revolution
        ca, sa = np.cos(a), np.sin(a)
        rx = base[ring, 0] * ca - base[ring, 1] * sa
        ry = base[ring, 0] * sa + base[ring, 1] * ca
        p[ring, 0], p[ring, 1] = rx, ry
        p[ball] += np.array([0.80, 0.55, -0.70 + 0.85 *
                             abs(math.sin(2 * math.pi * t))], np.float32)
        p[box] += np.array([-0.15 + 0.55 * math.sin(2 * math.pi * t),
                            0.85, -0.78], np.float32)
        return p

    return dict(base=base, scales=scale, quats=quats, opac=opac, shs=shs,
                colors=col, group=group, gt_at=gt_at)


def ring_cameras(n_cams: int, radius: float = 4.2):
    """Camera-to-world matrices on a ring, OpenGL convention (x right,
    y up, z backward), all looking at the scene center."""
    mats = []
    target = np.array([0.0, 0.0, -0.25])
    for i in range(n_cams):
        th = 2 * np.pi * i / n_cams
        z = 0.45 + 0.75 * ((i * 7) % n_cams) / max(n_cams - 1, 1)
        pos = np.array([radius * math.cos(th), radius * math.sin(th), z])
        fwd = target - pos
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        up2 = np.cross(right, fwd)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = \
            right, up2, -fwd, pos
        mats.append(c2w)
    return mats


def camera_from_c2w(c2w, fovx, width, height, timestamp):
    """Identical math to readers._blender_cameras (:158-179) so the
    rendered GT matches what training reconstructs from the JSON."""
    from saro_gs_tpu.data.cameras import Camera
    from saro_gs_tpu.ops import math3d
    mat = np.linalg.inv(np.array(c2w))
    R = -np.transpose(mat[:3, :3])
    R[:, 0] = -R[:, 0]
    T = -mat[:3, 3]
    fovy = math3d.focal2fov(math3d.fov2focal(fovx, width), height)
    return Camera(uid=0, R=R, T=T, fovx=fovx, fovy=fovy, width=width,
                  height=height, timestamp=timestamp)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="datasets/synth_arena")
    ap.add_argument("--width", type=int, default=676)
    ap.add_argument("--height", type=int, default=507)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--cams", type=int, default=21)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--init_points", type=int, default=100_000)
    ap.add_argument("--fovx", type=float, default=0.85)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from saro_gs_tpu.data import ply as ply_mod
    from saro_gs_tpu.ops.rasterize import RasterConfig, rasterize

    os.makedirs(args.out, exist_ok=True)
    gt = build_gt(args.seed)
    n = gt["base"].shape[0]
    print(f"GT scene: {n} gaussians", flush=True)

    on_tpu = jax.default_backend() == "tpu"
    rcfg = RasterConfig(tile_x=32, tile_y=32, chunk=128,
                        max_instances=1 << 20,
                        backend="pallas" if on_tpu else "jax",
                        max_slots=2048, tight_rect=True,
                        prefix="roll", packed=False, expander="pallas")
    bg = jnp.ones(3)  # white background (D-NeRF convention)
    scales = jnp.asarray(gt["scales"])
    quats = jnp.asarray(gt["quats"])
    opac = jnp.asarray(gt["opac"])
    shs = jnp.asarray(gt["shs"])

    @jax.jit
    def render(camp, means):
        out = rasterize(means, scales, quats, opac, camp, bg,
                        width=args.width, height=args.height, sh_degree=3,
                        config=rcfg, shs=shs)
        img = jnp.clip(jnp.transpose(out.color, (1, 2, 0)), 0.0, 1.0)
        return (img * 255 + 0.5).astype(jnp.uint8), out.num_dropped

    c2ws = ring_cameras(args.cams)
    splits = {"train": list(range(1, args.cams)), "test": [0]}
    frame_means = [jnp.asarray(gt["gt_at"](j / (args.frames - 1)))
                   for j in range(args.frames)]

    # PNG encode is the wall-clock bottleneck (device renders stream much
    # faster than single-threaded encode at 1352x1014); encode on a pool,
    # and skip frames already on disk so a killed run resumes for free
    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(max_workers=8)
    pending = []
    for split, cam_ids in splits.items():
        frames_json = []
        done = 0
        for ci in cam_ids:
            for j in range(args.frames):
                t = j / (args.frames - 1)
                name = f"r_{ci:02d}_{j:03d}"
                path = os.path.join(args.out, name + ".png")
                frames_json.append({
                    "file_path": name, "time": t,
                    "transform_matrix": c2ws[ci].tolist()})
                if os.path.exists(path):
                    done += 1
                    continue
                cam = camera_from_c2w(c2ws[ci], args.fovx, args.width,
                                      args.height, t)
                img, dropped = render(cam.raster_params(), frame_means[j])
                img = np.asarray(img)
                assert int(dropped) == 0, (ci, j, int(dropped))
                if ci == cam_ids[0] and j == 0:
                    nonbg = (img < 250).any(-1).mean()
                    print(f"[{split}] cam {ci} coverage "
                          f"{nonbg:.2f}", flush=True)
                    assert nonbg > 0.15, "camera convention broken?"
                pending.append(pool.submit(
                    Image.fromarray(img).save, path))
                if len(pending) > 64:
                    pending.pop(0).result()
        for f_ in pending:
            f_.result()
        pending = []
        with open(os.path.join(args.out, f"transforms_{split}.json"),
                  "w") as f:
            json.dump({"camera_angle_x": args.fovx, "frames": frames_json},
                      f)
        print(f"[{split}] {len(frames_json)} frames written "
              f"({done} already on disk)", flush=True)
    pool.shutdown()

    # --- init point cloud (noisy COLMAP-like samples) ---------------------
    rng = np.random.RandomState(args.seed + 1)
    idx = rng.randint(0, n, args.init_points)
    js = rng.randint(0, args.frames, args.init_points)
    pts = np.empty((args.init_points, 3), np.float32)
    for j in np.unique(js):
        m = js == j
        pts[m] = np.asarray(frame_means[j])[idx[m]]
    pts += rng.normal(0, 0.02, pts.shape).astype(np.float32)
    cols = np.clip(gt["colors"][idx] +
                   rng.normal(0, 0.08, (args.init_points, 3)), 0, 1)
    times = (js / args.frames).astype(np.float32)[:, None]
    ply_mod.store_point_cloud(
        os.path.join(args.out, "points3d.ply"),
        np.concatenate([pts, times], axis=1), cols * 255)
    print(f"init cloud: {args.init_points} points", flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
