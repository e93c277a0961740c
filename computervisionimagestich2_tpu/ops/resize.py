"""Resize kernels with CImg-exact semantics, expressed as matmuls.

The reference's blend pyramid calls CImg get_resize(..., interpolation=3)
(/root/reference/ImageProcess.cpp:709-715,731,764). CImg's "linear" mode
actually dispatches per-dimension:

- shrinking  -> mode 2, an overlap-weighted moving average
  (CImg.h:29539-29556): output pixel t averages source pixels with weights
  proportional to interval overlap on the common w_src*w_dst grid.
- enlarging  -> true linear interpolation with origin-aligned mapping
  (CImg.h:29618-29654): pos(x) = min(x * w_src / w_dst, w_src - 1),
  out[x] = lerp(src[floor(pos)], src[floor(pos)+1], frac(pos)).

Both are linear maps, so we precompute (host-side, per static shape pair) a
sparse row-stochastic weight matrix and apply it as a dense matmul on the
MXU — the TPU-native form of CImg's per-pixel pointer walk. The matrices are
tiny (pyramid dims), and XLA folds the pair of matmuls with neighbors.

VLFeat's scale-space decimation (copy_and_downsample, vl/sift.c:178-194) is
plain stride-2 point sampling and is implemented directly.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _resize_weights(n_src: int, n_dst: int) -> np.ndarray:
    """CImg per-dimension resize weights: [n_dst, n_src], rows sum to 1."""
    w = np.zeros((n_dst, n_src), dtype=np.float32)
    if n_dst == n_src:
        np.fill_diagonal(w, 1.0)
    elif n_dst < n_src:
        # mode 2: overlap-weighted moving average on the n_src*n_dst grid.
        # Source pixel s covers [s*n_dst, (s+1)*n_dst); dst t covers
        # [t*n_src, (t+1)*n_src); weight = overlap / n_src.
        for t in range(n_dst):
            lo, hi = t * n_src, (t + 1) * n_src
            s0, s1 = lo // n_dst, (hi - 1) // n_dst
            for s in range(s0, s1 + 1):
                ov = min(hi, (s + 1) * n_dst) - max(lo, s * n_dst)
                w[t, s] = ov / n_src
    else:
        # mode 3 enlarge: origin-aligned linear interpolation.
        fx = n_src / n_dst
        for t in range(n_dst):
            pos = min(t * fx, n_src - 1.0)
            i = int(pos)
            a = pos - i
            w[t, i] += 1.0 - a
            w[t, min(i + 1, n_src - 1)] += a
    return w


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def cimg_resize(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """CImg get_resize(out_w, out_h, 1, C, 3) on an [H, W] or [H, W, C] array."""
    h, w = img.shape[0], img.shape[1]
    wx = jnp.asarray(_resize_weights(w, out_w))  # [out_w, w]
    wy = jnp.asarray(_resize_weights(h, out_h))  # [out_h, h]
    # x first, then y (CImg order; result identical for linear maps).
    out = jnp.einsum("xw,hw...->hx...", wx, img,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("yh,hx...->yx...", wy, out,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out


def vlfeat_downsample(img: jnp.ndarray, d: int = 1) -> jnp.ndarray:
    """Stride-2^d point decimation (copy_and_downsample, vl/sift.c:178-194).

    img: [..., H, W]. Output dims: ceil over the reference's loop bounds —
    rows step ``y += d`` over [0, H), cols over [0, W-(d-1)).
    """
    step = 1 << d
    return img[..., ::step, : img.shape[-1] - (step - 1) : step]


def vlfeat_upsample_rows(img: jnp.ndarray) -> jnp.ndarray:
    """One application of copy_and_upsample_rows (vl/sift.c:81-101): doubles
    the row length with midpoint interpolation and transposes. Two calls
    double an image (used only when o_min < 0)."""
    # img: [..., H, W] -> [..., W*2, H] after transpose, matching the C code.
    nxt = jnp.concatenate([img[..., :, 1:], img[..., :, -1:]], axis=-1)
    interleaved = jnp.stack([img, 0.5 * (img + nxt)], axis=-1)
    up = interleaved.reshape(img.shape[:-1] + (img.shape[-1] * 2,))
    return jnp.swapaxes(up, -1, -2)
