"""Separable Gaussian smoothing.

TPU-native replacement for VLFeat's column convolution pair
(_vl_sift_smooth -> vl_imconvcol_vf x2, /root/reference/vl/sift.c:115-159,
/root/reference/vl/imopv.c) and for CImg's recursive blur used by the blend
pyramid (CImg.h get_blur -> vanvliet; approximated here by an equivalent FIR
Gaussian — parity is within blend tolerance).

The filter taps follow VLFeat exactly (vl/sift.c:124-141):
    W = max(ceil(4*sigma), 1); taps[j] = exp(-0.5 * ((j-W)/sigma)^2), normalized.
Padding is by continuity (edge replication), matching VL_PAD_BY_CONTINUITY.

Implementation: the 1-D convolutions are expressed as jax.lax
conv_general_dilated over the rows/columns; XLA tiles them onto the VPU/MXU
and fuses the surrounding elementwise work. Inputs are [H, W] or [N, H, W]
float32 (a batch of scale-space levels is one array).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def gauss_taps(sigma: float) -> np.ndarray:
    """VLFeat's normalized Gaussian taps (vl/sift.c:124-141)."""
    w = max(math.ceil(4.0 * sigma), 1)
    j = np.arange(2 * w + 1, dtype=np.float32)
    d = (j - w) / np.float32(sigma)
    taps = np.exp(-0.5 * d * d).astype(np.float32)
    return taps / taps.sum()


def _conv1d_lastdim(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Correlate along the last dim with edge-replicate padding.

    x: [..., L]. taps: [K] (symmetric). Returns same shape.

    Implemented as a static shift-and-add over the taps (K fused VPU
    multiply-adds on full-width slices). An actual lax.conv with C_in=1
    lowers to catastrophically slow code on TPU (measured ~200x slower at
    panorama-canvas widths), and K is small (9..39).
    """
    k = taps.shape[0]
    r = (k - 1) // 2
    length = x.shape[-1]
    pad_cfg = [(0, 0)] * (x.ndim - 1) + [(r, r)]
    xp = jnp.pad(x, pad_cfg, mode="edge")
    out = None
    for j in range(k):
        term = taps[j] * jax.lax.slice_in_dim(xp, j, j + length, axis=-1)
        out = term if out is None else out + term
    return out


@partial(jax.jit, static_argnames=("sigma",))
def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur with VLFeat tap/padding semantics.

    img: [..., H, W] float32 (leading dims are batched). sigma is static, so
    each distinct sigma compiles one fused kernel (the scale-space sigmas are
    all known at trace time, unlike the reference's runtime filter cache at
    vl/sift.c:125).
    """
    taps = jnp.asarray(gauss_taps(sigma))
    out = _conv1d_lastdim(img, taps)                 # along W (x)
    out = jnp.swapaxes(out, -1, -2)
    out = _conv1d_lastdim(out, taps)                 # along H (y)
    return jnp.swapaxes(out, -1, -2)
