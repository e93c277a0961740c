"""Image load/save.

Dispatches to the native C++ codec (computervisionimagestich2_tpu.native) when
built, else to the pure-numpy BMP codec. PNG is handled via the stdlib-only
encoder in png.py when needed.
"""
from __future__ import annotations

import os

import numpy as np

from . import bmp

_NATIVE = None


def _native():
    global _NATIVE
    if _NATIVE is None:
        try:
            from ..native import codec as _c  # noqa: PLC0415

            _NATIVE = _c if _c.available() else False
        except Exception:
            _NATIVE = False
    return _NATIVE


def load_image(path: str) -> np.ndarray:
    """Load an image file as RGB uint8 [H, W, 3]."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".bmp":
        native = _native()
        if native:
            return native.read_bmp(path)
        return bmp.read_bmp(path)
    raise ValueError(f"unsupported image format: {ext}")


def save_image(path: str, img: np.ndarray) -> None:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".bmp":
        native = _native()
        if native:
            native.write_bmp(path, np.ascontiguousarray(img))
            return
        bmp.write_bmp(path, img)
        return
    raise ValueError(f"unsupported image format: {ext}")
