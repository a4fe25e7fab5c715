"""ctypes bindings for the native batch-assembly library (native/dataloader.cc).

Auto-builds ``libssp_dataloader.so`` with make on first use (g++ is part of the
toolchain); every entry point has a numpy fallback so the pipeline never
depends on the native build succeeding.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libssp_dataloader.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.gather_batch_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int,
            ]
            lib.normalize_batch_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
            ]
            _lib = lib
        except Exception as e:  # missing toolchain etc. -> numpy fallback
            print(f"[INFO] native dataloader unavailable ({e}); using numpy")
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def gather_batch(images: np.ndarray, indices: np.ndarray,
                 flips: Optional[np.ndarray] = None,
                 num_threads: Optional[int] = None) -> np.ndarray:
    """images[indices] with optional per-sample horizontal flips, assembled
    into one contiguous uint8 batch."""
    assert images.dtype == np.uint8 and images.ndim == 4
    n = len(indices)
    h, w, c = images.shape[1:]
    lib = _load()
    if lib is None:
        out = images[indices]
        if flips is not None:
            out = out.copy()
            sel = flips.astype(bool)
            out[sel] = out[sel, :, ::-1]
        return np.ascontiguousarray(out)

    images = np.ascontiguousarray(images)
    idx = np.ascontiguousarray(np.asarray(indices, np.int64))
    fl = None if flips is None else np.ascontiguousarray(np.asarray(flips, np.uint8))
    out = np.empty((n, h, w, c), np.uint8)
    if num_threads is None:
        num_threads = min(8, os.cpu_count() or 1)
    lib.gather_batch_u8(
        images.ctypes.data_as(ctypes.c_void_p), idx.ctypes.data_as(ctypes.c_void_p),
        None if fl is None else fl.ctypes.data_as(ctypes.c_void_p),
        n, h, w, c, out.ctypes.data_as(ctypes.c_void_p), num_threads,
    )
    return out


def normalize_batch(batch_u8: np.ndarray, mean, std,
                    num_threads: Optional[int] = None) -> np.ndarray:
    """(x/255 - mean)/std as float32 on host (CPU-only runs)."""
    assert batch_u8.dtype == np.uint8
    c = batch_u8.shape[-1]
    lib = _load()
    if lib is None:
        return ((batch_u8.astype(np.float32) / 255.0 - np.asarray(mean, np.float32))
                / np.asarray(std, np.float32))
    flat = np.ascontiguousarray(batch_u8)
    out = np.empty(flat.shape, np.float32)
    m = np.ascontiguousarray(np.asarray(mean, np.float32))
    s = np.ascontiguousarray(np.asarray(std, np.float32))
    if num_threads is None:
        num_threads = min(8, os.cpu_count() or 1)
    lib.normalize_batch_f32(
        flat.ctypes.data_as(ctypes.c_void_p), flat.size,
        m.ctypes.data_as(ctypes.c_void_p), s.ctypes.data_as(ctypes.c_void_p),
        c, out.ctypes.data_as(ctypes.c_void_p), num_threads,
    )
    return out
