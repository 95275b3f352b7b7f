"""ctypes binding for the native preprocessing core (native/preprocess.cc).

Provides multithreaded batch affine-warp+normalize and MSRA heatmap
rendering on the host, auto-building the shared library on first use and
falling back to the numpy/cv2 path when a compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libedgecape_preprocess.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    with _LIB_LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        try:
            if not os.path.exists(_SO_PATH):
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True)
            lib = ctypes.CDLL(_SO_PATH)
            lib.warp_normalize_batch.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int]
            heatmap_sig = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_float, ctypes.c_float,
                ctypes.c_int]
            lib.msra_heatmaps_batch.argtypes = heatmap_sig
            lib.udp_heatmaps_batch.argtypes = heatmap_sig
            _LIB = lib
        except Exception:
            _LIB_FAILED = True
        return _LIB


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def warp_normalize_batch(images: list[np.ndarray], inv_mats: np.ndarray,
                         out_hw: tuple[int, int], mean, std,
                         num_threads: int = 0) -> np.ndarray:
    """images: list of [H_i, W_i, 3] uint8 RGB; inv_mats [n, 2, 3];
    returns [n, h, w, 3] float32 normalized."""
    lib = _load()
    assert lib is not None, "native preprocessing library unavailable"
    n = len(images)
    h, w = out_hw
    flat = np.concatenate([im.reshape(-1) for im in images]).astype(
        np.uint8, copy=False)
    flat = np.ascontiguousarray(flat)
    sizes = np.array([im.size for im in images], np.int64)
    offsets = np.zeros(n, np.int64)
    offsets[1:] = np.cumsum(sizes)[:-1]
    hs = np.array([im.shape[0] for im in images], np.int32)
    ws = np.array([im.shape[1] for im in images], np.int32)
    mats = np.ascontiguousarray(inv_mats, np.float32)
    out = np.empty((n, h, w, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 1, n)
    lib.warp_normalize_batch(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        hs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ws.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        _fptr(mats), _fptr(out), n, h, w, _fptr(mean), _fptr(std),
        num_threads)
    return out


def msra_heatmaps_batch(joints: np.ndarray, visible: np.ndarray,
                        heatmap_hw: tuple[int, int],
                        image_hw: tuple[float, float], sigma: float,
                        num_threads: int = 0):
    """joints [n, k, 2], visible [n, k] -> (target [n, k, H, W],
    weight [n, k])."""
    lib = _load()
    assert lib is not None, "native preprocessing library unavailable"
    joints = np.ascontiguousarray(joints, np.float32)
    visible = np.ascontiguousarray(visible, np.float32)
    n, k = joints.shape[:2]
    hh, hw = heatmap_hw
    target = np.empty((n, k, hh, hw), np.float32)
    weight = np.empty((n, k), np.float32)
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 1, n)
    lib.msra_heatmaps_batch(
        _fptr(joints), _fptr(visible), _fptr(target), _fptr(weight),
        n, k, hh, hw, float(image_hw[0]), float(image_hw[1]), float(sigma),
        num_threads)
    return target, weight


def udp_heatmaps_batch(joints: np.ndarray, visible: np.ndarray,
                       heatmap_hw: tuple[int, int],
                       image_hw: tuple[float, float], sigma: float,
                       num_threads: int = 0):
    """UDP (unbiased-data-processing) variant of msra_heatmaps_batch:
    continuous sub-pixel gaussian center, stride (img-1)/(hm-1). Same
    shapes and semantics as ops/heatmap.render_udp."""
    lib = _load()
    assert lib is not None, "native preprocessing library unavailable"
    joints = np.ascontiguousarray(joints, np.float32)
    visible = np.ascontiguousarray(visible, np.float32)
    n, k = joints.shape[:2]
    hh, hw = heatmap_hw
    target = np.empty((n, k, hh, hw), np.float32)
    weight = np.empty((n, k), np.float32)
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 1, n)
    lib.udp_heatmaps_batch(
        _fptr(joints), _fptr(visible), _fptr(target), _fptr(weight),
        n, k, hh, hw, float(image_hw[0]), float(image_hw[1]), float(sigma),
        num_threads)
    return target, weight
