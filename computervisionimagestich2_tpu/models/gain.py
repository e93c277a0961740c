"""Gain compensation (BASELINE.json config 4 — an extension beyond the
reference, which only mixes exposure globally via the equalization tail).

Before blending, the incoming warped image's intensity is scaled so its mean
over the overlap region matches the existing canvas — the standard panorama
gain-compensation step that removes exposure steps at seams. One fused
kernel: masked reductions + scalar scales.

Modes: "luma" (one scalar gain from ITU-601 luma means) or "rgb" (one gain
per channel — also removes white-balance/tint steps, which a luma-only
gain leaves behind at narrow seam-band blends).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("mode",))
def gain_compensate(a: jnp.ndarray, b: jnp.ndarray,
                    mode: str = "luma") -> jnp.ndarray:
    """Scale canvas a so its overlap mean matches b's.

    a, b: [H, W, 3] float32 (0..255, zeros = empty). Returns adjusted a.
    """
    if mode not in ("luma", "rgb"):
        raise ValueError(f"unknown gain mode {mode!r}")
    luma_a = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    luma_b = 0.299 * b[..., 0] + 0.587 * b[..., 1] + 0.114 * b[..., 2]
    overlap = (luma_a > 0) & (luma_b > 0)
    n = jnp.maximum(jnp.sum(overlap.astype(jnp.float32)), 1.0)
    if mode == "rgb":
        mean_a = jnp.sum(jnp.where(overlap[..., None], a, 0.0),
                         axis=(0, 1)) / n
        mean_b = jnp.sum(jnp.where(overlap[..., None], b, 0.0),
                         axis=(0, 1)) / n
    else:
        mean_a = jnp.sum(jnp.where(overlap, luma_a, 0.0)) / n
        mean_b = jnp.sum(jnp.where(overlap, luma_b, 0.0)) / n
    gain = jnp.where((mean_a > 1.0) & (mean_b > 1.0),
                     mean_b / jnp.maximum(mean_a, 1e-3), 1.0)
    # clamp to a sane exposure-correction range
    gain = jnp.clip(gain, 0.5, 2.0)
    return jnp.clip(a * gain, 0.0, 255.0)
