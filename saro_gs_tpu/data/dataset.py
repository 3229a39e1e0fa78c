"""Host data pipeline: threaded lazy image decode + batched camera feed.

Replaces the reference's torch DataLoader over ``CameraDataset``
(scene/dataset.py + train.py:116-117, num_workers=8): a thread-pool
prefetcher that decodes/resizes images on demand and yields device-ready
batches (stacked ``CameraParams`` + GT images + timestamps).  Threads (not
processes) suffice: PIL decodes release the GIL.
"""
from __future__ import annotations

import concurrent.futures as cf
import threading
from typing import Iterator, List, NamedTuple, Optional

import numpy as np

from ..ops.projection import CameraParams
from .cameras import Camera


class CameraBatch(NamedTuple):
    cams: CameraParams        # leaves stacked [B, ...]
    gt: np.ndarray            # [B, 3, H, W] uint8 (u8 transport: the step
    #                           decodes /255 on-device; float also accepted)
    timestamps: np.ndarray    # [B, 1, 1]
    indices: np.ndarray       # [B]


def stack_camera_params(cams: List[Camera]) -> CameraParams:
    ps = [c.raster_params() for c in cams]
    return CameraParams(*[np.stack([np.asarray(getattr(p, f))
                                    for p in ps]).astype(np.float32)
                          for f in CameraParams._fields])


class BatchLoader:
    """Infinite shuffled batch iterator with lookahead prefetch."""

    def __init__(self, cameras: List[Camera], batch_size: int,
                 white_background: bool = False, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 666, prefetch: int = 4,
                 drop_last: bool = True):
        assert len(cameras) >= batch_size
        self.cameras = cameras
        self.batch_size = batch_size
        self.white_background = white_background
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.pool = cf.ThreadPoolExecutor(max_workers=num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last

    def _load_batch(self, idxs) -> CameraBatch:
        # runs inside a pool worker: decode inline (nested pool.map from a
        # worker can exhaust the pool and deadlock)
        cams = [self.cameras[i] for i in idxs]
        imgs = self._decode(cams)
        gt = np.stack(imgs)
        if gt.dtype != np.uint8:   # u8 transport (see CameraBatch.gt)
            gt = np.clip(gt * 255.0 + 0.5, 0.0, 255.0).astype(np.uint8)
        return CameraBatch(
            cams=stack_camera_params(cams),
            gt=gt,
            timestamps=np.asarray([c.timestamp for c in cams],
                                  np.float32).reshape(-1, 1, 1),
            indices=np.asarray(idxs))

    def _decode(self, cams: List[Camera]) -> List[np.ndarray]:
        """Batch image decode: one native threaded call (no GIL) when every
        view is uncached and same-sized, else the per-camera python path."""
        from .. import native
        if (native.available()
                and all(c._image is None and c.image_path for c in cams)
                and len({(c.width, c.height) for c in cams}) == 1):
            bg = ((1.0,) * 3 if self.white_background else (0.0,) * 3)
            out = native.load_images([c.image_path for c in cams],
                                     cams[0].width, cams[0].height, bg)
            if out is not None:
                return list(out)
        return [c.load_image(self.white_background) for c in cams]

    def epoch(self) -> Iterator[CameraBatch]:
        order = np.arange(len(self.cameras))
        if self.shuffle:
            self.rng.shuffle(order)
        bs = self.batch_size
        stops = len(order) - bs + 1 if self.drop_last else len(order)
        batches = [order[i:i + bs] for i in range(0, stops, bs)]
        futures = []
        it = iter(batches)
        for _ in range(min(self.prefetch, len(batches))):
            futures.append(self.pool.submit(self._load_batch, next(it)))
        i = 0
        while futures:
            batch = futures.pop(0).result()
            nxt = next(it, None)
            if nxt is not None:
                futures.append(self.pool.submit(self._load_batch, nxt))
            yield batch
            i += 1

    def __iter__(self):
        while True:
            yield from self.epoch()
