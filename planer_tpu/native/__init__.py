"""Native host-side kernels (C++/ctypes) with transparent numpy fallback.

Builds ``libplaner_native.so`` from nms.cpp with g++ on first use (cached
next to the source); if the toolchain or binary is unavailable every entry
point falls back to the numpy implementation, so the package works anywhere.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["nms", "score_filter", "available"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libplaner_native.so")
_SRC = os.path.join(_HERE, "nms.cpp")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                   < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.planer_nms.restype = ctypes.c_int64
        lib.planer_nms.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_float, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        lib.planer_score_filter.restype = ctypes.c_int64
        lib.planer_score_filter.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def nms(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float = 0.45,
        top_k: int = 300) -> np.ndarray:
    """Greedy NMS on [cx, cy, w, h] boxes; returns kept indices (sorted by
    descending score).  C++ fast path, numpy fallback."""
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = boxes.shape[0]
    lib = _load()
    if lib is None or n == 0:
        from ..models.yolo_post import _nms_numpy
        return _nms_numpy(boxes, scores, iou_thresh, top_k)
    keep = np.empty(min(n, top_k), np.int64)
    cnt = lib.planer_nms(_fptr(boxes), _fptr(scores), n,
                         ctypes.c_float(iou_thresh), keep.shape[0],
                         _iptr(keep))
    return keep[:cnt].copy()


def score_filter(dec: np.ndarray, conf_thresh: float):
    """(idx, cls_id, score) rows of ``dec`` with obj*max(cls) >= thresh."""
    dec = np.ascontiguousarray(dec, np.float32)
    n, w = dec.shape
    c = w - 5
    lib = _load()
    if lib is None:
        scores = dec[:, 4:5] * dec[:, 5:]
        cls_id = scores.argmax(1)
        cls_sc = scores.max(1)
        m = cls_sc >= conf_thresh
        return np.nonzero(m)[0], cls_id[m], cls_sc[m]
    idx = np.empty(n, np.int64)
    cls = np.empty(n, np.int64)
    sc = np.empty(n, np.float32)
    cnt = lib.planer_score_filter(_fptr(dec), n, c,
                                  ctypes.c_float(conf_thresh),
                                  _iptr(idx), _iptr(cls), _fptr(sc))
    return idx[:cnt].copy(), cls[:cnt].copy(), sc[:cnt].copy()
