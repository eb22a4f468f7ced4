"""ctypes bindings for the C++ IO runtime (csrc/nerf_io.cpp).

Builds the shared library on first use (g++, cached as csrc/_nerf_io.so);
every caller falls back to the numpy path when the toolchain or library is
unavailable, so the framework stays pure-Python-capable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"
_LIB_PATH = _CSRC / "_nerf_io.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    if not (_CSRC / "nerf_io.cpp").exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(_CSRC), "-s"],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("NERF_RS_TPU_NO_NATIVE"):
            return None
        if not _LIB_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        lib.nio_read_f32.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_int64]
        lib.nio_read_f32.restype = ctypes.c_int
        lib.nio_file_size.argtypes = [ctypes.c_char_p]
        lib.nio_file_size.restype = ctypes.c_int64
        lib.nio_quantize_u8.argtypes = [ctypes.POINTER(ctypes.c_float),
                                        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.nio_quantize_u8.restype = ctypes.c_int
        lib.nio_rgb_to_rgba_u8.argtypes = [ctypes.POINTER(ctypes.c_float),
                                           ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.nio_rgb_to_rgba_u8.restype = ctypes.c_int
        lib.nio_write_ppm.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                                      ctypes.c_int, ctypes.c_int]
        lib.nio_write_ppm.restype = ctypes.c_int
        lib.nio_write_ppm_f32.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                          ctypes.c_int, ctypes.c_int]
        lib.nio_write_ppm_f32.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def read_tensor_f32(path: str, dims: Tuple[int, ...]) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO unavailable")
    count = int(np.prod(dims)) if dims else 0
    if count == 0:
        size = lib.nio_file_size(path.encode())
        if size < 0:
            raise FileNotFoundError(path)
        count = size // 4
    out = np.empty(count, np.float32)
    rc = lib.nio_read_f32(path.encode(),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), count)
    if rc != 0:
        raise IOError(f"nio_read_f32({path}) failed with code {rc}")
    return out.reshape(dims) if dims else out


def quantize_u8(pixels: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO unavailable")
    flat = np.ascontiguousarray(pixels, np.float32).reshape(-1)
    out = np.empty(flat.shape, np.uint8)
    rc = lib.nio_quantize_u8(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), flat.size)
    if rc != 0:
        raise IOError(f"nio_quantize_u8 failed with code {rc}")
    return out.reshape(pixels.shape)


def rgb_to_rgba(pixels: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO unavailable")
    rgb = np.ascontiguousarray(pixels, np.float32).reshape(-1, 3)
    out = np.empty((rgb.shape[0], 4), np.uint8)
    rc = lib.nio_rgb_to_rgba_u8(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), rgb.shape[0])
    if rc != 0:
        raise IOError(f"nio_rgb_to_rgba_u8 failed with code {rc}")
    return out.reshape(-1)


def write_ppm(path: str, rgb_u8: np.ndarray) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO unavailable")
    h, w = rgb_u8.shape[:2]
    buf = np.ascontiguousarray(rgb_u8, np.uint8)
    rc = lib.nio_write_ppm(path.encode(),
                           buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h)
    if rc != 0:
        raise IOError(f"nio_write_ppm({path}) failed with code {rc}")
