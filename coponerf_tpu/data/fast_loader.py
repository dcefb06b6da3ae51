"""ctypes bindings for the native scene cache (runtime/scenecache.cpp) and a
drop-in fast dataset backend.

The cache converts a scene's ``data.npz`` once into a flat mmap-able file;
per-sample work (open+inflate zip, crop, resize, float conversion — the
reference's realestate10k_dataio.py:237-456 hot path) then becomes a single
native call writing into a preallocated buffer.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_RUNTIME_DIR = Path(__file__).resolve().parents[2] / "runtime"
_LIB_PATH = _RUNTIME_DIR / "libscenecache.so"
_lib = None


def _build_library():
    subprocess.run(["make", "-C", str(_RUNTIME_DIR)], check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    src = _RUNTIME_DIR / "scenecache.cpp"
    stale = (
        not _LIB_PATH.exists()
        or (src.exists() and src.stat().st_mtime > _LIB_PATH.stat().st_mtime)
    )
    if stale:
        _build_library()
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.scenecache_open.restype = ctypes.c_void_p
    lib.scenecache_open.argtypes = [ctypes.c_char_p]
    lib.scenecache_close.argtypes = [ctypes.c_void_p]
    lib.scenecache_num_frames.restype = ctypes.c_int64
    lib.scenecache_num_frames.argtypes = [ctypes.c_void_p]
    lib.scenecache_shape.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
    lib.scenecache_timestamps.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.scenecache_get_frame.restype = ctypes.c_int
    lib.scenecache_get_frame.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8)]
    lib.scenecache_load_processed.restype = ctypes.c_int
    lib.scenecache_load_processed.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
    lib.scenecache_write.restype = ctypes.c_int
    lib.scenecache_write.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ]
    _lib = lib
    return lib


class SceneCache:
    """Zero-copy reader over one scene's cache file."""

    def __init__(self, path: str):
        self._lib = get_lib()
        self._h = self._lib.scenecache_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open scene cache: {path}")
        hh = ctypes.c_int64()
        ww = ctypes.c_int64()
        self._lib.scenecache_shape(self._h, ctypes.byref(hh), ctypes.byref(ww))
        self.height, self.width = hh.value, ww.value
        self.n_frames = self._lib.scenecache_num_frames(self._h)
        ts = np.empty(self.n_frames, np.int64)
        self._lib.scenecache_timestamps(self._h, ts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        self.timestamps = ts

    def frame(self, i: int) -> np.ndarray:
        out = np.empty((self.height, self.width, 3), np.uint8)
        rc = self._lib.scenecache_get_frame(self._h, i, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc != 0:
            raise IndexError(i)
        return out

    def processed(self, i: int, out_size: int = 256, out: Optional[np.ndarray] = None) -> np.ndarray:
        """Center-crop + bilinear resize + [-1,1] float, fused in C++."""
        if out is None:
            out = np.empty((out_size, out_size, 3), np.float32)
        rc = self._lib.scenecache_load_processed(
            self._h, i, out_size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        if rc != 0:
            raise IndexError(i)
        return out

    def close(self):
        if self._h:
            self._lib.scenecache_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def write_cache(path: str, timestamps: np.ndarray, frames: np.ndarray):
    """frames: (N, H, W, 3) uint8; timestamps: (N,) int64 (sorted)."""
    lib = get_lib()
    timestamps = np.ascontiguousarray(timestamps, np.int64)
    frames = np.ascontiguousarray(frames, np.uint8)
    n, h, w, _ = frames.shape
    rc = lib.scenecache_write(
        path.encode(),
        timestamps.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w,
    )
    if rc != 0:
        raise IOError(f"cache write failed: {path}")


def convert_scene_npz(npz_path: str, cache_path: str, base_hw=(256, 455)):
    """One-time conversion: data.npz -> scene.cache (frames normalized to
    base_hw as the loaders expect, realestate10k_dataio.py:341-342)."""
    import cv2

    data = np.load(npz_path)
    names = sorted(data.keys(), key=lambda s: int(s.split(".")[0]))
    ts = np.array([int(s.split(".")[0]) for s in names], np.int64)
    frames = []
    for nm in names:
        f = data[nm]
        if f.shape[:2] != base_hw:
            f = cv2.resize(f, (base_hw[1], base_hw[0]))
        frames.append(f)
    write_cache(cache_path, ts, np.stack(frames))
    return len(frames)
