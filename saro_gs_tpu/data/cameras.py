"""Camera objects: host-side metadata + JAX-ready parameter pytrees.

Replaces the reference's nn.Module Camera (scene/cameras.py:24): a plain
dataclass holding pose/intrinsics/timestamp plus a lazily-loaded image, with
``raster_params()`` producing the ``CameraParams`` pytree consumed by the
rasterizer.  The matrix conventions (row-vector, GL projection with the
(f+n)/(f-n) variant, znear=0.01/zfar=100) match cameras.py:84-101.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np

from ..ops import math3d
from ..ops.projection import CameraParams

ZNEAR, ZFAR = 0.01, 100.0


@dataclasses.dataclass
class Camera:
    uid: int
    R: np.ndarray              # [3,3] cam-to-world rotation (COLMAP style)
    T: np.ndarray              # [3] world-to-cam translation
    fovx: float
    fovy: float
    width: int                 # render resolution
    height: int
    timestamp: float = 0.0
    image_name: str = ""
    image_path: Optional[str] = None
    cx_ratio: float = 0.0      # principal point offsets in [-0.5, 0.5]
    cy_ratio: float = 0.0
    _image: Optional[np.ndarray] = None   # [3,H,W] float in [0,1], cached

    def __post_init__(self):
        wv = math3d.world_to_view_matrix(self.R, self.T)
        proj = math3d.projection_matrix(ZNEAR, ZFAR, self.fovx, self.fovy,
                                        self.cx_ratio, self.cy_ratio)
        self.world_view = wv
        self.full_proj = (wv.astype(np.float64)
                          @ proj.astype(np.float64)).astype(np.float32)
        self.camera_center = np.linalg.inv(
            wv.astype(np.float64))[3, :3].astype(np.float32)
        self.tanfovx = math.tan(self.fovx * 0.5)
        self.tanfovy = math.tan(self.fovy * 0.5)

    def raster_params(self) -> CameraParams:
        return CameraParams(
            viewmat=self.world_view,
            projmat=self.full_proj,
            campos=self.camera_center,
            tanfovx=np.float32(self.tanfovx),
            tanfovy=np.float32(self.tanfovy))

    # ---- image loading ---------------------------------------------------
    def load_image(self, white_background: bool = False,
                   size=None) -> np.ndarray:
        """Decode + resize the GT image to (height, width); returns
        [3, H, W] float32 in [0, 1].  Alpha is composited over the
        background (Blender) like scene/dataset.py:57-97."""
        if self._image is not None:
            return self._image
        w, h = size if size is not None else (self.width, self.height)
        from .. import native
        bg = (1.0, 1.0, 1.0) if white_background else (0.0, 0.0, 0.0)
        img = native.load_image(self.image_path, w, h, bg)
        if img is not None:
            return img
        from PIL import Image
        img = Image.open(self.image_path)
        if img.size != (w, h):
            img = img.resize((w, h), Image.LANCZOS)
        arr = np.asarray(img).astype(np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[..., None].repeat(3, -1)
        if arr.shape[-1] == 4:
            bg = 1.0 if white_background else 0.0
            arr = arr[..., :3] * arr[..., 3:4] + bg * (1 - arr[..., 3:4])
        return np.transpose(arr, (2, 0, 1)).copy()

    def set_image(self, img: np.ndarray):
        self._image = img


@dataclasses.dataclass
class MiniCam:
    """Viewer-style camera carrying precomputed matrices only
    (scene/cameras.py:114-126)."""
    width: int
    height: int
    fovx: float
    fovy: float
    znear: float
    zfar: float
    world_view: np.ndarray
    full_proj: np.ndarray
    timestamp: float = 0.0

    def __post_init__(self):
        inv = np.linalg.inv(self.world_view.astype(np.float64))
        self.camera_center = inv[3, :3].astype(np.float32)

    def raster_params(self) -> CameraParams:
        return CameraParams(
            viewmat=self.world_view.astype(np.float32),
            projmat=self.full_proj.astype(np.float32),
            campos=self.camera_center,
            tanfovx=np.float32(math.tan(self.fovx * 0.5)),
            tanfovy=np.float32(math.tan(self.fovy * 0.5)))


@dataclasses.dataclass
class Camerass(Camera):
    """2x-resolution ray-bundle camera (scene/cameras.py:128-214).

    The reference variant doubles ``image_width``/``image_height`` and
    precomputes per-pixel ray origins/directions by pushing every pixel
    centre through the inverse projection (pix2ndc -> proj^-1 ->
    camera-to-world rotation -> normalize).  Unused on the reference main
    path but part of its public camera surface; here it is one vectorized
    numpy pass producing ``rayo``/``rayd`` as [1, 3, H, W] float32 like
    cameras.py:209-211.
    """

    def __post_init__(self):
        super().__post_init__()
        # only the ray grid / render size doubles; the GT image stays at
        # the base resolution (the reference doubles image_width/height
        # for the rays but original_image keeps the loaded size)
        self.base_width, self.base_height = self.width, self.height
        self.width = 2 * self.width
        self.height = 2 * self.height
        h, w = self.height, self.width
        # pixel centres -> NDC (pix2ndc: ((2v + 1) / S) - 1)
        xs = (2.0 * np.arange(w, dtype=np.float64) + 1.0) / w - 1.0
        ys = (2.0 * np.arange(h, dtype=np.float64) + 1.0) / h - 1.0
        ndcx, ndcy = np.meshgrid(xs, ys)                     # [H, W]
        ndc = np.stack([ndcx, ndcy, np.ones_like(ndcx),
                        np.ones_like(ndcx)], axis=-1)        # [H, W, 4]
        # row-vector convention: stored matrices are already transposed, so
        # the reference's ``ndc @ (proj^T)^-1 . T`` is ``ndc @ inv(proj)``
        proj = math3d.projection_matrix(ZNEAR, ZFAR, self.fovx, self.fovy,
                                        self.cx_ratio, self.cy_ratio)
        cam_pt = ndc @ np.linalg.inv(proj.astype(np.float64))
        cam_pt = cam_pt[..., :3] / cam_pt[..., 3:4]
        c2w = np.linalg.inv(self.world_view.astype(np.float64))
        direction = cam_pt @ c2w[:3, :3]
        direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
        self.rayd = np.transpose(direction, (2, 0, 1))[None].astype(
            np.float32)                                      # [1, 3, H, W]
        self.rayo = np.broadcast_to(
            self.camera_center.reshape(1, 3, 1, 1),
            self.rayd.shape).astype(np.float32)

    def load_image(self, white_background: bool = False,
                   size=None) -> np.ndarray:
        if size is None:
            size = (self.base_width, self.base_height)
        return super().load_image(white_background, size=size)


def resolution_policy(orig_w: int, orig_h: int, resolution: int,
                      resolution_scale: float = 1.0) -> Tuple[int, int]:
    """The reference's resolution policy (utils/camera_utils.py:73-95):
    -1 caps width at 1600; 1/2/4/8 divide; other values set target width."""
    if resolution in (1, 2, 4, 8):
        return (round(orig_w / (resolution_scale * resolution)),
                round(orig_h / (resolution_scale * resolution)))
    if resolution == -1:
        global_down = orig_w / 1600 if orig_w > 1600 else 1
    else:
        global_down = orig_w / resolution
    scale = float(global_down) * float(resolution_scale)
    return int(orig_w / scale), int(orig_h / scale)


def camera_to_json(idx: int, cam: Camera) -> dict:
    """cameras.json entry (utils/camera_utils.py:292-312)."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = cam.R.transpose()
    Rt[:3, 3] = cam.T
    Rt[3, 3] = 1.0
    c2w = np.linalg.inv(Rt)
    pos = c2w[:3, 3]
    rot = c2w[:3, :3]
    return {
        "id": idx,
        "img_name": cam.image_name,
        "width": cam.width,
        "height": cam.height,
        "position": pos.tolist(),
        "rotation": [r.tolist() for r in rot],
        "fy": math3d.fov2focal(cam.fovy, cam.height),
        "fx": math3d.fov2focal(cam.fovx, cam.width),
    }
