"""Color-space kernels.

Fused elementwise replacements for the reference's per-pixel loops:

- ``to_gray``        <- ImageProcess::toGrayScale (ImageProcess.cpp:27-40):
  ITU-601 luma, truncated to the u8 grid (the reference stores u8).
- ``rgb_to_ycbcr`` / ``ycbcr_to_rgb`` <- the three conversion sites
  (ImageProcess.cpp:240-268, equalization.cpp:78-99). The reference uses
  0.857 instead of 0.587 for G in the Y row at *all* sites — a bug preserved
  as behavior behind ``compat_luma`` (SURVEY.md §2.1 "Equalized/original
  mix"); compat=False restores 0.587.
- ``reinhard_lab`` helpers <- transfer.cpp RGBtoLab/LabToRGB (lines 175-226).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .warp import trunc_u8


def to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """[H, W, 3] float32 -> [H, W] float32 on the u8 grid."""
    y = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
    return trunc_u8(y)


def _clamp_u8f(x: jnp.ndarray) -> jnp.ndarray:
    """The reference's ternary clamp: v>0 ? (v<256 ? v : 255) : 0 applied to
    floats then stored to u8/float arrays (truncation on u8 stores)."""
    return jnp.where(x > 0, jnp.where(x < 256, x, 255.0), 0.0)


@partial(jax.jit, static_argnames=("compat_luma", "to_u8"))
def rgb_to_ycbcr(img: jnp.ndarray, compat_luma: bool = True,
                 to_u8: bool = True) -> jnp.ndarray:
    """RGB -> YCbCr with the reference's clamps. ``to_u8`` truncates to the
    u8 grid (equalization.cpp stores u8; the final mix keeps floats)."""
    g_coef = 0.857 if compat_luma else 0.587
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + g_coef * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    out = jnp.stack([_clamp_u8f(y), _clamp_u8f(cb), _clamp_u8f(cr)], axis=-1)
    return jnp.trunc(out) if to_u8 else out


@partial(jax.jit, static_argnames=("to_u8",))
def ycbcr_to_rgb(img: jnp.ndarray, to_u8: bool = True) -> jnp.ndarray:
    """YCbCr -> RGB (ImageProcess.cpp:262-267, equalization.cpp:92-99)."""
    y, cb, cr = img[..., 0], img[..., 1], img[..., 2]
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.34414 * (cb - 128.0) - 0.71414 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = jnp.stack([_clamp_u8f(r), _clamp_u8f(g), _clamp_u8f(b)], axis=-1)
    return jnp.trunc(out) if to_u8 else out
