"""Shared synthetic scenes for rasterizer tests."""
from __future__ import annotations

import math

import numpy as np

from saro_gs_tpu.ops import math3d
from saro_gs_tpu.ops.projection import CameraParams


def make_camera(width=48, height=32, fovx_deg=60.0, cam_z=-4.0,
                znear=0.01, zfar=100.0):
    fovx = math.radians(fovx_deg)
    focal = math3d.fov2focal(fovx, width)
    fovy = math3d.focal2fov(focal, height)
    R = np.eye(3)
    T = np.array([0.0, 0.0, -cam_z])
    viewmat = math3d.world_to_view_matrix(R, T)
    proj = math3d.projection_matrix(znear, zfar, fovx, fovy)
    full_proj = (viewmat @ proj).astype(np.float32)
    campos = np.linalg.inv(viewmat)[3, :3].astype(np.float32)
    cam = CameraParams(viewmat=viewmat.astype(np.float32),
                       projmat=full_proj,
                       campos=campos,
                       tanfovx=np.float32(math.tan(fovx / 2)),
                       tanfovy=np.float32(math.tan(fovy / 2)))
    return cam, dict(width=width, height=height,
                     tanfovx=math.tan(fovx / 2), tanfovy=math.tan(fovy / 2))


def make_gaussians(rng, n=40, spread=1.2, scale_lo=0.05, scale_hi=0.35,
                   sh_degree=3):
    means = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    means[:, 2] *= 0.5
    scales = rng.uniform(scale_lo, scale_hi, (n, 3)).astype(np.float32)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.2, 0.95, (n,)).astype(np.float32)
    shs = np.zeros((n, 16, 3), np.float32)
    shs[:, 0] = rng.uniform(-0.5, 2.0, (n, 3))
    k = (sh_degree + 1) ** 2
    shs[:, 1:k] = rng.normal(0, 0.15, (n, k - 1, 3))
    return means, scales, quats, opac, shs
