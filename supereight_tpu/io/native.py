"""ctypes bindings to the native IO helpers (csrc/io_native.cpp).

Build with ``make -C csrc``.  Every entry point has a pure-numpy fallback so
the framework works without the native library; with it, .raw streaming is
mmap'd with a background prefetch thread (the data-loader path).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                         "libse_io.so")
_lib = None


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    try:
        lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
    except OSError:
        return None
    lib.se_raw_open.restype = ctypes.c_void_p
    lib.se_raw_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.se_raw_width.argtypes = [ctypes.c_void_p]
    lib.se_raw_height.argtypes = [ctypes.c_void_p]
    lib.se_raw_frames.restype = ctypes.c_long
    lib.se_raw_frames.argtypes = [ctypes.c_void_p]
    lib.se_raw_read.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                ctypes.POINTER(ctypes.c_float)]
    lib.se_raw_read_depth_mm.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                         ctypes.POINTER(ctypes.c_uint16)]
    lib.se_raw_read_rgb.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                    ctypes.POINTER(ctypes.c_uint8)]
    lib.se_raw_close.argtypes = [ctypes.c_void_p]
    lib.se_scene2raw_frame.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_uint16)]
    _lib = lib
    return _lib


def available() -> bool:
    return load_library() is not None


class NativeRawReader:
    """Prefetching .raw reader backed by csrc/io_native.cpp.

    ``read_float(frame)`` returns the decimated metric-depth frame and stages
    frame+1 in a background thread, hiding IO behind device compute.
    """

    def __init__(self, path: str, ratio: int = 1):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native io library not built (make -C csrc)")
        self._lib = lib
        self._h = lib.se_raw_open(path.encode(), ratio)
        if not self._h:
            raise IOError(f"cannot open raw file {path}")
        self.width = lib.se_raw_width(self._h)
        self.height = lib.se_raw_height(self._h)
        self.num_frames = lib.se_raw_frames(self._h)

    def read_float(self, frame: int) -> np.ndarray:
        out = np.empty((self.height, self.width), np.float32)
        rc = self._lib.se_raw_read(
            self._h, frame, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise IndexError(frame)
        return out

    def read(self, frame: int):
        """RawReader-interface adapter: (depth uint16 [H, W] in mm, rgb).
        The native path decodes to meters; the round back to mm is exact
        at ratio 1 (the stream stores mm).  rgb is not decoded (the
        pipeline never consumes it) — zeros keep the tuple shape."""
        d = self.read_float(frame)
        mm = np.rint(d * 1000.0).astype(np.uint16)
        rgb = np.zeros((self.height, self.width, 3), np.uint8)
        return mm, rgb

    def __len__(self):
        return self.num_frames

    def close(self):
        if self._h:
            self._lib.se_raw_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def euclidean_to_depth_mm(euclidean: np.ndarray, k) -> np.ndarray:
    """ICL-NUIM euclidean ray length -> planar z depth in mm
    (scene2raw semantics, `se_tools/scene2raw.cpp`).  Uses the native
    implementation when built, numpy otherwise."""
    h, w = euclidean.shape
    fx, fy, cx, cy = (float(v) for v in k)
    lib = load_library()
    if lib is not None:
        e = np.ascontiguousarray(euclidean, np.float32)
        out = np.empty((h, w), np.uint16)
        lib.se_scene2raw_frame(
            e.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), w, h,
            fx, fy, cx, cy,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
        return out
    x = (np.arange(w) - cx) / fx
    y = (np.arange(h)[:, None] - cy) / fy
    denom = np.sqrt(x[None, :] ** 2 + y ** 2 + 1.0)
    z = euclidean / denom
    return np.clip(z * 1000.0 + 0.5, 0, 65535).astype(np.uint16)
