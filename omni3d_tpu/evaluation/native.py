"""ctypes bridge to the native greedy matcher (native/matcher.cc).

Compiles the C++ source on first use into a per-repo build dir (g++ is part
of the baked toolchain); falls back to the numpy/python loop in
omni3d_eval._evaluate_img when compilation is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "matcher.cc")
_BUILD = os.path.join(os.path.dirname(__file__), "..", "..", "native", "build")


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        os.makedirs(_BUILD, exist_ok=True)
        so = os.path.join(_BUILD, "libmatcher.so")
        if not os.path.exists(so) or (
            os.path.getmtime(so) < os.path.getmtime(_SRC)
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, _SRC],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.greedy_match.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def greedy_match(ious: np.ndarray, iou_thrs: np.ndarray, gt_ignore: np.ndarray,
                 in_prox: np.ndarray | None, dt_ids, gt_ids):
    """Run the native matcher. Returns (dtm (T,D), gtm (T,G), dt_ig (T,D))."""
    lib = _load()
    assert lib is not None
    D, G = ious.shape
    T = len(iou_thrs)
    ious = np.ascontiguousarray(ious, np.float32)
    thrs = np.ascontiguousarray(iou_thrs, np.float64)
    gti = np.ascontiguousarray(gt_ignore, np.uint8)
    use_prox = in_prox is not None
    prox = np.ascontiguousarray(in_prox, np.uint8) if use_prox else np.zeros((1, 1), np.uint8)
    dti = np.ascontiguousarray(dt_ids, np.int64)
    gtid = np.ascontiguousarray(gt_ids, np.int64)
    dtm = np.zeros((T, D), np.float64)
    gtm = np.zeros((T, G), np.float64)
    dt_ig = np.zeros((T, D), np.uint8)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    lib.greedy_match(
        p(ious, ctypes.c_float), D, G,
        p(thrs, ctypes.c_double), T,
        p(gti, ctypes.c_uint8),
        p(prox, ctypes.c_uint8), int(use_prox),
        p(dti, ctypes.c_int64), p(gtid, ctypes.c_int64),
        p(dtm, ctypes.c_double), p(gtm, ctypes.c_double),
        p(dt_ig, ctypes.c_uint8),
    )
    return dtm, gtm, dt_ig
