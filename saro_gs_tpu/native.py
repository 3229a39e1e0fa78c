"""ctypes bindings for the native host runtime (native/libsaro_native.so).

The C++ library provides the host-side hot paths — COLMAP binary parsing,
grid-hash KNN (the reference's simple_knn/mmcv CUDA ops), and threaded
image decode + PIL-parity Lanczos resize (the reference's PIL DataLoader
workers).  Every caller has a pure-Python fallback: ``lib()`` returns None
when the library is missing and integration points degrade gracefully.

Set ``SARO_NATIVE=0`` to force the Python paths (for parity testing).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO_PATH = os.path.join(_ROOT, "native", "build", "libsaro_native.so")

_c_double_p = ctypes.POINTER(ctypes.c_double)
_c_float_p = ctypes.POINTER(ctypes.c_float)
_c_uint8_p = ctypes.POINTER(ctypes.c_uint8)
_c_uint32_p = ctypes.POINTER(ctypes.c_uint32)
_c_int32_p = ctypes.POINTER(ctypes.c_int32)
_c_uint64_p = ctypes.POINTER(ctypes.c_uint64)
_c_int64_p = ctypes.POINTER(ctypes.c_int64)


def _bind(so: ctypes.CDLL) -> ctypes.CDLL:
    so.sn_free.argtypes = [ctypes.c_void_p]
    so.sn_version.restype = ctypes.c_char_p
    so.sn_read_points3d_bin.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(_c_double_p),
        ctypes.POINTER(_c_uint8_p), ctypes.POINTER(_c_double_p), _c_int64_p]
    so.sn_read_images_bin.argtypes = [
        ctypes.c_char_p, _c_int64_p, ctypes.POINTER(_c_uint32_p),
        ctypes.POINTER(_c_double_p), ctypes.POINTER(_c_double_p),
        ctypes.POINTER(_c_uint32_p), ctypes.POINTER(ctypes.c_char_p),
        _c_int64_p]
    so.sn_read_cameras_bin.argtypes = [
        ctypes.c_char_p, _c_int64_p, ctypes.POINTER(_c_uint32_p),
        ctypes.POINTER(_c_int32_p), ctypes.POINTER(_c_uint64_p),
        ctypes.POINTER(_c_double_p), ctypes.POINTER(_c_int64_p)]
    so.sn_nn_distance.argtypes = [_c_float_p, ctypes.c_int64, _c_float_p,
                                  ctypes.c_int]
    so.sn_knn_mean_sq_dist.argtypes = [_c_float_p, ctypes.c_int64,
                                       ctypes.c_int, _c_float_p, ctypes.c_int]
    so.sn_load_image.argtypes = [ctypes.c_char_p, ctypes.c_int32,
                                 ctypes.c_int32, _c_float_p, _c_float_p]
    so.sn_load_images.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, _c_float_p, _c_float_p, ctypes.c_int32, _c_int32_p]
    return so


def lib(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    """The loaded native library, or None if unavailable/disabled."""
    global _LIB, _TRIED
    if os.environ.get("SARO_NATIVE", "1") == "0":
        return None
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO_PATH) and build_if_missing:
            try:
                subprocess.run(["make", "-C", os.path.dirname(
                    os.path.dirname(_SO_PATH))], check=True,
                    capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            _LIB = _bind(ctypes.CDLL(_SO_PATH))
        except OSError:
            _LIB = None
        return _LIB


def available() -> bool:
    return lib() is not None


def _take(ptr, shape, dtype, so):
    """Copy a library-owned buffer into numpy and free it."""
    n = int(np.prod(shape))
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).astype(dtype, copy=True)
    so.sn_free(ctypes.cast(ptr, ctypes.c_void_p))
    return arr.reshape(shape)


# ---------------------------------------------------------------- colmap ---

def read_points3d_bin(path: str):
    """-> (xyz [N,3] f64, rgb [N,3] u8, err [N] f64) or None."""
    so = lib()
    if so is None:
        return None
    xyz, rgb, err = _c_double_p(), _c_uint8_p(), _c_double_p()
    n = ctypes.c_int64()
    rc = so.sn_read_points3d_bin(path.encode(), ctypes.byref(xyz),
                                 ctypes.byref(rgb), ctypes.byref(err),
                                 ctypes.byref(n))
    if rc != 0:
        return None
    n = n.value
    return (_take(xyz, (n, 3), np.float64, so),
            _take(rgb, (n, 3), np.uint8, so),
            _take(err, (n,), np.float64, so))


def read_images_bin(path: str):
    """-> list of (image_id, qvec[4], tvec[3], camera_id, name) or None."""
    so = lib()
    if so is None:
        return None
    n = ctypes.c_int64()
    ids, cams = _c_uint32_p(), _c_uint32_p()
    q, t = _c_double_p(), _c_double_p()
    names = ctypes.c_char_p()
    nlen = ctypes.c_int64()
    rc = so.sn_read_images_bin(path.encode(), ctypes.byref(n),
                               ctypes.byref(ids), ctypes.byref(q),
                               ctypes.byref(t), ctypes.byref(cams),
                               ctypes.byref(names), ctypes.byref(nlen))
    if rc != 0:
        return None
    num = n.value
    blob = ctypes.string_at(names, nlen.value)
    so.sn_free(ctypes.cast(names, ctypes.c_void_p))
    name_list = blob.decode("utf-8").split("\0")[:num]
    out = list(zip(
        _take(ids, (num,), np.uint32, so).tolist(),
        _take(q, (num, 4), np.float64, so),
        _take(t, (num, 3), np.float64, so),
        _take(cams, (num,), np.uint32, so).tolist(),
        name_list))
    return out


def read_cameras_bin(path: str):
    """-> list of (camera_id, model_id, width, height, params) or None."""
    so = lib()
    if so is None:
        return None
    n = ctypes.c_int64()
    ids, models = _c_uint32_p(), _c_int32_p()
    wh = _c_uint64_p()
    params, offs = _c_double_p(), _c_int64_p()
    rc = so.sn_read_cameras_bin(path.encode(), ctypes.byref(n),
                                ctypes.byref(ids), ctypes.byref(models),
                                ctypes.byref(wh), ctypes.byref(params),
                                ctypes.byref(offs))
    if rc != 0:
        return None
    num = n.value
    off = _take(offs, (num + 1,), np.int64, so)
    par = _take(params, (int(off[-1]),), np.float64, so)
    whv = _take(wh, (num, 2), np.uint64, so)
    out = []
    for i, (cid, mid) in enumerate(zip(
            _take(ids, (num,), np.uint32, so).tolist(),
            _take(models, (num,), np.int32, so).tolist())):
        out.append((cid, mid, int(whv[i, 0]), int(whv[i, 1]),
                    par[off[i]:off[i + 1]]))
    return out


# ------------------------------------------------------------------- knn ---

def nn_distance(points: np.ndarray, nthreads: int = 0):
    """[N] distance to the nearest other point, or None."""
    so = lib()
    if so is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty(pts.shape[0], np.float32)
    rc = so.sn_nn_distance(pts.ctypes.data_as(_c_float_p), pts.shape[0],
                           out.ctypes.data_as(_c_float_p), nthreads)
    return out if rc == 0 else None


def knn_mean_sq_dist(points: np.ndarray, k: int = 3, nthreads: int = 0):
    """[N] mean squared distance to k nearest neighbours (distCUDA2), or
    None."""
    so = lib()
    if so is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty(pts.shape[0], np.float32)
    rc = so.sn_knn_mean_sq_dist(pts.ctypes.data_as(_c_float_p), pts.shape[0],
                                k, out.ctypes.data_as(_c_float_p), nthreads)
    return out if rc == 0 else None


# ---------------------------------------------------------------- images ---

def load_image(path: str, width: int, height: int,
               bg: Tuple[float, float, float] = (0.0, 0.0, 0.0)):
    """Decode+resize one image -> [3, H, W] float32 in [0,1], or None."""
    so = lib()
    if so is None:
        return None
    out = np.empty((3, height, width), np.float32)
    bgv = np.asarray(bg, np.float32)
    rc = so.sn_load_image(path.encode(), width, height,
                          bgv.ctypes.data_as(_c_float_p),
                          out.ctypes.data_as(_c_float_p))
    return out if rc == 0 else None


def load_images(paths: List[str], width: int, height: int,
                bg: Tuple[float, float, float] = (0.0, 0.0, 0.0),
                nthreads: int = 0):
    """Threaded batch decode -> [B, 3, H, W] float32, or None."""
    so = lib()
    if so is None or not paths:
        return None
    n = len(paths)
    out = np.empty((n, 3, height, width), np.float32)
    status = np.zeros(n, np.int32)
    bgv = np.asarray(bg, np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = so.sn_load_images(arr, n, width, height,
                           bgv.ctypes.data_as(_c_float_p),
                           out.ctypes.data_as(_c_float_p), nthreads,
                           status.ctypes.data_as(_c_int32_p))
    return out if rc == 0 else None
