"""ctypes bindings for the native host-preprocessing library
(native/host_ops.cc). Falls back to cv2/numpy when the .so isn't built —
`make -C native` produces it.

These are the hot per-item label ops of the data pipeline (13-17 distance
transforms + boundary maps per CelebA-HQ-edge / DeepFashion item,
celebahqedge_dataset.py:88-103, deepfashion_dataset.py:158-168); the
reference runs them in OpenCV's native code inside torch's C++ DataLoader
workers.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                        "libcocosnet_host.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.distance_transform_l1_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                             u8p]
    lib.mask_edges_u8.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int]
    lib.normalize_u8_to_f32.argtypes = [u8p, ctypes.c_int, f32p]
    lib.resize_nearest_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                      u8p, ctypes.c_int, ctypes.c_int]
    if hasattr(lib, "canny_u8"):  # older prebuilt .so may lack it
        lib.canny_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_float, ctypes.c_float,
                                 ctypes.c_float, u8p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def distance_transform_map(edge: np.ndarray) -> np.ndarray:
    """clip(L1-distance-to-edge / 3, 0, 255) uint8 — native or cv2."""
    lib = _load()
    edge = np.ascontiguousarray(edge, dtype=np.uint8)
    if lib is None:
        from cocosnet_tpu.data.edges import distance_transform_map as fallback
        return fallback(edge)
    h, w = edge.shape
    out = np.empty_like(edge)
    lib.distance_transform_l1_u8(_u8p(edge), h, w, _u8p(out))
    return out


def mask_edges(edge: np.ndarray, labels: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        from cocosnet_tpu.data.edges import mask_edges as fallback
        return fallback(edge, labels)
    edge = np.ascontiguousarray(edge, dtype=np.uint8)
    labels = np.ascontiguousarray(labels, dtype=np.uint8)
    h, w = labels.shape
    lib.mask_edges_u8(_u8p(edge), _u8p(labels), h, w)
    return edge


def normalize_to_f32(img_u8: np.ndarray) -> np.ndarray:
    """uint8 -> float32 in [-1, 1]."""
    lib = _load()
    img_u8 = np.ascontiguousarray(img_u8, dtype=np.uint8)
    if lib is None:
        return img_u8.astype(np.float32) / 255.0 * 2.0 - 1.0
    out = np.empty(img_u8.shape, np.float32)
    lib.normalize_u8_to_f32(_u8p(img_u8), img_u8.size,
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def canny(gray: np.ndarray, sigma: float = 1.0, low: float = 0.1,
          high: float = 0.2) -> np.ndarray:
    """Canny edge map (bool) of a uint8 grayscale plane — native C++
    (host_ops.cc::canny_u8) or the scipy implementation in data/edges.py.
    Both follow skimage's defaults; see edges.py for the algorithm notes."""
    lib = _load()
    gray = np.ascontiguousarray(gray, dtype=np.uint8)
    if lib is None or not hasattr(lib, "canny_u8"):
        from cocosnet_tpu.data.edges import canny as fallback
        return fallback(gray, sigma, low, high)
    h, w = gray.shape
    out = np.empty((h, w), np.uint8)
    lib.canny_u8(_u8p(gray), h, w, ctypes.c_float(sigma),
                 ctypes.c_float(low), ctypes.c_float(high), _u8p(out))
    return out.astype(bool)


def resize_nearest(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(src, dtype=np.uint8)
    if lib is None:
        sh, sw = src.shape
        ys = np.minimum((np.arange(dh) * sh // dh), sh - 1)
        xs = np.minimum((np.arange(dw) * sw // dw), sw - 1)
        return src[ys][:, xs]
    sh, sw = src.shape
    out = np.empty((dh, dw), np.uint8)
    lib.resize_nearest_u8(_u8p(src), sh, sw, _u8p(out), dh, dw)
    return out
