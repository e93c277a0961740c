"""Reference-shaped API wrappers.

Mirrors the reference's public entry points (SURVEY.md §1 "L5 -> L4
interface") so users of the original can switch with minimal edits:

- ``ImageProcess(file_dic, pic_sum)`` — construction runs the whole pipeline
  (/root/reference/ImageProcess.cpp:3-8; there is no other public API in the
  reference). The result is exposed as ``.result`` (RGB uint8), plus
  ``save(path)`` — the ex6 variant's result.bmp write
  (/root/reference/src/ex6/main.cpp:14-16).
- ``Projection.imageProjection`` / ``Projection.bilinearInterpolation``
  (/root/reference/Projection.h:28-38).
- ``equalization(img, mode)`` (/root/reference/equalization.h:35).
- ``transfer(src, template)`` (/root/reference/transfer.h:30).

Arrays are numpy RGB uint8 [H, W, 3] in CImg's top-down row order.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config import DEFAULT_CONFIG, StitchConfig
from ..models import equalization as eq_model
from ..models import transfer as transfer_model
from ..models.stitcher import Stitcher
from ..ops import warp as warp_ops
from ..utils.io import load_image, save_image


class Projection:
    """Static-method namespace matching the reference class."""

    @staticmethod
    def imageProjection(src: np.ndarray, angle_deg: float = 15.0) -> np.ndarray:
        out = warp_ops.cylindrical_project(
            jnp.asarray(np.asarray(src), jnp.float32), angle_deg)
        return np.asarray(out).astype(np.uint8)

    @staticmethod
    def bilinearInterpolation(src: np.ndarray, x: float, y: float,
                              channel: int) -> int:
        val = warp_ops.bilinear_sample(
            jnp.asarray(np.asarray(src), jnp.float32),
            jnp.float32(x), jnp.float32(y))
        return int(np.asarray(val)[channel])


class ImageProcess:
    """Construction = execution, like the reference (ImageProcess.cpp:3-8)."""

    def __init__(self, file_dic: str, pic_sum: int,
                 config: StitchConfig = DEFAULT_CONFIG):
        paths = [f"{file_dic.rstrip('/')}/{i}.bmp"
                 for i in range(1, pic_sum + 1)]
        images = [load_image(p) for p in paths]
        self._stitcher = Stitcher(config)
        self.result: np.ndarray = self._stitcher.stitch(images)

    def save(self, path: str) -> None:
        save_image(path, self.result)

    @property
    def stage_times(self):
        return self._stitcher.stage_times


def equalization(img: np.ndarray, mode: int = 1) -> np.ndarray:
    """equalization(src, mode) (equalization.cpp:4-25). mode 1 = color
    (returns the equalized image); mode 0 = gray — NOTE the reference's mode
    0 computes the equalized grayscale but writes the *original* image back
    (colorOutput is never updated, equalization.cpp:24), so we return the
    input unchanged for compat."""
    img_f = jnp.asarray(np.asarray(img), jnp.float32)
    if mode == 1:
        return np.asarray(eq_model.equalize_color(img_f)).astype(np.uint8)
    if mode == 0:
        return np.asarray(img)
    raise ValueError("ERROR mode input!")  # equalization.cpp:21


def transfer(src: np.ndarray, template: np.ndarray) -> np.ndarray:
    """transfer(src, template, output) ctor (transfer.cpp:4-13)."""
    out = transfer_model.color_transfer(
        jnp.asarray(np.asarray(src), jnp.float32),
        jnp.asarray(np.asarray(template), jnp.float32))
    return np.asarray(out).astype(np.uint8)
