"""ctypes bridge to the native C++ latent batch engine (native/).

Replaces the reference's 16-worker-process torch DataLoader
(train_ddp_v3mod2.py:683-699) with an in-process mmap + thread-pool
assembler.  Crop/loop semantics are identical to the Python
``LatentDataset`` path (they are cross-checked in tests), so the two are
interchangeable; the native path removes per-batch Python overhead and
scales with threads for multi-stream serving hosts.

Builds on demand with ``make`` (g++); falls back gracefully if the
toolchain or build fails — callers should check ``is_available()``.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "liblatentloader.so"
_lib = None
_build_error: Optional[str] = None


def _load_lib():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True, text=True,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.ll_open.restype = ctypes.c_void_p
        lib.ll_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int64,
        ]
        lib.ll_frames.restype = ctypes.c_int64
        lib.ll_frames.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.ll_channels.restype = ctypes.c_int64
        lib.ll_channels.argtypes = [ctypes.c_void_p]
        lib.ll_fill_batch.restype = ctypes.c_int
        lib.ll_fill_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.ll_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception as e:  # toolchain missing / build failure
        _build_error = str(e)
    return _lib


def is_available() -> bool:
    return _load_lib() is not None


def build_error() -> Optional[str]:
    _load_lib()
    return _build_error


class NativeLatentStore:
    """mmap'd latent shards + threaded batch assembly."""

    def __init__(self, hr_paths: List[str], n_threads: int = 4):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        self._lib = lib
        self.n_threads = n_threads
        lr_paths = [p.replace(".hr.npy", ".lr.npy") for p in hr_paths]
        n = len(hr_paths)
        hr_arr = (ctypes.c_char_p * n)(*[p.encode() for p in hr_paths])
        lr_arr = (ctypes.c_char_p * n)(*[p.encode() for p in lr_paths])
        self._h = lib.ll_open(hr_arr, lr_arr, n)
        if not self._h:
            raise RuntimeError("ll_open failed (bad npy shard?)")
        self.n_files = n
        self.channels = int(lib.ll_channels(self._h))
        self.frames = [int(lib.ll_frames(self._h, i)) for i in range(n)]

    def fill_batch(self, file_idx: np.ndarray, starts: np.ndarray,
                   target: int):
        """(idx [B], starts [B]) -> (hr, lr) float32 [B, target, C]."""
        B = len(file_idx)
        hr = np.empty((B, target, self.channels), np.float32)
        lr = np.empty((B, target, self.channels), np.float32)
        idx = np.ascontiguousarray(file_idx, np.int64)
        st = np.ascontiguousarray(starts, np.int64)
        rc = self._lib.ll_fill_batch(
            self._h,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            st.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            B, target,
            hr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            lr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.n_threads,
        )
        if rc != 0:
            raise RuntimeError(f"ll_fill_batch error code {rc}")
        return hr, lr

    def close(self):
        if getattr(self, "_h", None):
            self._lib.ll_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
