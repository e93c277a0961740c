"""ctypes binding for the native codec (codec.cpp).

Builds lazily with g++ on first use (cached as libcodec.so next to the
source); falls back cleanly if no toolchain is present — utils.io then uses
the pure-numpy codec.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "codec.cpp")
_LIB = os.path.join(_HERE, "libcodec.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
             "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.bmp_probe.restype = ctypes.c_int
        lib.bmp_probe.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
        lib.bmp_decode.restype = ctypes.c_int
        lib.bmp_decode.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                   ctypes.c_void_p]
        lib.bmp_encode_size.restype = ctypes.c_size_t
        lib.bmp_encode_size.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.bmp_encode.restype = ctypes.c_size_t
        lib.bmp_encode.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_void_p]
        lib.bmp_load_batch.restype = ctypes.c_int
        lib.bmp_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def read_bmp(path: str) -> np.ndarray:
    lib = _load()
    with open(path, "rb") as f:
        data = f.read()
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.bmp_probe(data, len(data), ctypes.byref(w), ctypes.byref(h)) != 0:
        raise ValueError(f"not a BMP file: {path}")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.bmp_decode(data, len(data), out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise ValueError(f"BMP decode failed ({rc}): {path}")
    return out


def write_bmp(path: str, img: np.ndarray) -> None:
    lib = _load()
    img = np.ascontiguousarray(img)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    h, w = img.shape[:2]
    buf = np.empty(lib.bmp_encode_size(w, h), np.uint8)
    n = lib.bmp_encode(img.ctypes.data_as(ctypes.c_void_p), w, h,
                       buf.ctypes.data_as(ctypes.c_void_p))
    with open(path, "wb") as f:
        f.write(buf[:n].tobytes())


def load_batch(paths: list[str], n_threads: int = 0) -> np.ndarray:
    """Decode a uniform batch of BMPs concurrently -> [N, H, W, 3] uint8."""
    lib = _load()
    first = read_bmp(paths[0])
    h, w = first.shape[:2]
    out = np.empty((len(paths), h, w, 3), np.uint8)
    arr = (ctypes.c_char_p * len(paths))(
        *[p.encode() for p in paths])
    bad = lib.bmp_load_batch(arr, len(paths),
                             out.ctypes.data_as(ctypes.c_void_p), w, h,
                             n_threads)
    if bad:
        raise ValueError(f"{bad} file(s) failed to load in batch")
    return out
