"""Native (C++) host-runtime components, JIT-compiled at import.

Mirrors the reference's compile-at-import pattern for its CUDA extension
(``xlstm/blocks/slstm/src/cuda_init.py:60-117``) with g++ instead of nvcc;
the .so is cached next to the source keyed on a source hash. Falls back to
the pure-python paths if no compiler is available.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_LIB = None
_TRIED = False


def _build() -> Path | None:
    src = _DIR / "imgproc.cpp"
    tag = hashlib.sha256(src.read_bytes()).hexdigest()[:12]
    so = _DIR / f"imgproc_{tag}.so"
    if so.exists():
        return so
    cmd = ["g++", "-O3", "-march=native", "-funroll-loops", "-shared", "-fPIC", "-pthread", "-std=c++17",
           str(src), "-o", str(so)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so
    except (OSError, subprocess.SubprocessError):
        return None


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        so = _build()
        if so is not None:
            lib = ctypes.CDLL(str(so))
            lib.letterbox_batch.argtypes = [
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int,
            ]
            lib.hsv_inplace.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ]
            _LIB = lib
    return _LIB


def available() -> bool:
    return get_lib() is not None


def letterbox_batch(images: list, imgsz: int, n_threads: int | None = None,
                    scaleup: bool = True):
    """Fused letterbox+normalize of a list of HWC uint8 RGB images into one
    (n, imgsz, imgsz, 3) float32 batch. Returns (batch, metas) where metas is
    (n, 3) = (scale, pad_x, pad_y)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native imgproc unavailable")
    n = len(images)
    images = [np.ascontiguousarray(im, dtype=np.uint8) for im in images]
    out = np.empty((n, imgsz, imgsz, 3), np.float32)
    metas = np.empty((n, 3), np.float32)
    ptrs = (ctypes.c_void_p * n)(*[im.ctypes.data_as(ctypes.c_void_p) for im in images])
    hs = (ctypes.c_int * n)(*[im.shape[0] for im in images])
    ws = (ctypes.c_int * n)(*[im.shape[1] for im in images])
    if n_threads is None:
        # os.cpu_count() reports the physical host, not the cgroup quota —
        # oversubscribing a 1-core allowance was a measured 15x slowdown
        try:
            avail = len(os.sched_getaffinity(0))
        except AttributeError:  # non-linux
            avail = os.cpu_count() or 1
        n_threads = max(1, min(n, avail))
    lib.letterbox_batch(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)), hs, ws,
        n, imgsz,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        metas.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads, int(scaleup),
    )
    return out, metas
