"""Warp / sampling kernels.

TPU-native replacements for the reference's per-pixel scalar loops:

- ``bilinear_sample``    <- Projection::bilinearInterpolation
                           (/root/reference/Projection.cpp:3-18)
- ``cylindrical_project``<- Projection::imageProjection
                           (/root/reference/Projection.cpp:20-73)
- ``warp_xy``            <- getX/YAfterWarping (ImageProcess.cpp:465-471)
- ``warp_image``         <- warpingImageByHomography (ImageProcess.cpp:596-606)
- ``shift_image``        <- movingImageByOffset (ImageProcess.cpp:608-620)

All functions are pure, jittable, and operate on dense [H, W, C] float32 arrays
(pixel values 0..255). Instead of the reference's dst-pixel scalar loops
(cimg_forXY), every kernel is a fused elementwise-compute + gather that XLA
lays out on the VPU; there is no data-dependent control flow.

The warp model is the reference's 8-coefficient *bilinear* warp, not a
projective homography (see ImageProcess.h:58-73 — coefficients packed into a
3x3 with H[2][2]=1, applied as x' = w11*x + w12*y + w13*x*y + w21,
y' = w22*x + w23*y + w31*x*y + w32). Coefficients here are a flat (8,) vector
[w11, w12, w13, w21, w22, w23, w31, w32].
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def gather_pixels(img: jnp.ndarray, xi: jnp.ndarray, yi: jnp.ndarray) -> jnp.ndarray:
    """Gather img[yi, xi] for integer index arrays. img: [H, W, C] or [H, W]."""
    return img[yi, xi]


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample with the reference's exact corner/clamp semantics.

    Matches Projection::bilinearInterpolation (Projection.cpp:3-18):
    x_floor = floor(x); x_ceil = min(ceil(x), W-1) (same for y); the four
    corners are mixed with weights from the fractional parts. Out-of-range
    coordinates are the caller's responsibility (as in the reference). The
    float result is returned un-truncated; callers that need the reference's
    u8 truncation apply :func:`trunc_u8`.

    img: [H, W, C] float32. x, y: broadcastable index arrays (float).
    Returns [..., C].
    """
    h, w = img.shape[0], img.shape[1]
    xf = jnp.floor(x)
    yf = jnp.floor(y)
    xc = jnp.minimum(jnp.ceil(x), w - 1)
    yc = jnp.minimum(jnp.ceil(y), h - 1)
    a = (x - xf)[..., None]
    b = (y - yf)[..., None]

    xf_i = jnp.clip(xf.astype(jnp.int32), 0, w - 1)
    yf_i = jnp.clip(yf.astype(jnp.int32), 0, h - 1)
    xc_i = jnp.clip(xc.astype(jnp.int32), 0, w - 1)
    yc_i = jnp.clip(yc.astype(jnp.int32), 0, h - 1)

    p00 = img[yf_i, xf_i]  # leftdown  (x_floor, y_floor)
    p10 = img[yf_i, xc_i]  # rightdown (x_ceil,  y_floor)
    p11 = img[yc_i, xc_i]  # righttop  (x_ceil,  y_ceil)
    p01 = img[yc_i, xf_i]  # lefttop   (x_floor, y_ceil)

    return ((1 - a) * (1 - b) * p00 + a * (1 - b) * p10
            + a * b * p11 + (1 - a) * b * p01)


def trunc_u8(x: jnp.ndarray) -> jnp.ndarray:
    """C-style float -> unsigned char: truncation toward zero (values are
    in range in the reference; we clamp defensively)."""
    return jnp.clip(jnp.trunc(x), 0.0, 255.0)


@partial(jax.jit, static_argnames=("angle_deg",))
def cylindrical_project(img: jnp.ndarray, angle_deg: float = 15.0) -> jnp.ndarray:
    """Cylindrical projection, backward map (Projection.cpp:20-73).

    Exactly reproduces the reference, including its integer-division centers
    (``width / 2`` on ints) and the landscape axis swap. img: [H, W, C]
    float32 in 0..255; returns same shape, out-of-bounds pixels = 0, values
    truncated to u8 grid (the reference stores u8).
    """
    src_h, src_w = img.shape[0], img.shape[1]
    flag = src_w > src_h  # landscape -> swapped axes (Projection.cpp:24)
    width = src_h if flag else src_w
    height = src_w if flag else src_h
    half_w = width // 2    # int division, Projection.cpp:34/54
    half_h = height // 2
    tan_val = math.tan(angle_deg * math.pi / 180.0)
    r = (width / 2.0) / tan_val

    ys = jax.lax.broadcasted_iota(jnp.int32, (src_h, src_w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (src_h, src_w), 1)

    if flag:
        dst_x = (ys - half_w).astype(jnp.float32)
        dst_y = (xs - half_h).astype(jnp.float32)
    else:
        dst_x = (xs - half_w).astype(jnp.float32)
        dst_y = (ys - half_h).astype(jnp.float32)

    k = r / jnp.sqrt(r * r + dst_x * dst_x)
    sx = dst_x / k + half_w
    sy = dst_y / k + half_h

    if flag:
        # bounds use (sx in [0, src_h), sy in [0, src_w)); sample at
        # (x=sy, y=sx) — Projection.cpp:41-45
        valid = (sx >= 0) & (sx < src_h) & (sy >= 0) & (sy < src_w)
        sample_x, sample_y = sy, sx
    else:
        valid = (sx >= 0) & (sx < src_w) & (sy >= 0) & (sy < src_h)
        sample_x, sample_y = sx, sy

    out = trunc_u8(bilinear_sample(img, sample_x, sample_y))
    return jnp.where(valid[..., None], out, 0.0)


def warp_xy(coeffs: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Apply the 8-coefficient bilinear warp (ImageProcess.cpp:465-471).

    coeffs: (8,) [w11,w12,w13,w21,w22,w23,w31,w32].
    Returns (x', y').
    """
    c = coeffs
    xw = c[0] * x + c[1] * y + c[2] * x * y + c[3]
    yw = c[4] * x + c[5] * y + c[6] * x * y + c[7]
    return xw, yw


def projective_xy(coeffs: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Apply a row-major 3x3 homography stored as a flat (9,) vector — the
    'correct mode' alternative to the reference's bilinear warp (the report
    describes DLT, 16340028.md §DLT; the code ships the bilinear model)."""
    c = coeffs
    den = c[6] * x + c[7] * y + c[8]
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    return ((c[0] * x + c[1] * y + c[2]) / den,
            (c[3] * x + c[4] * y + c[5]) / den)


def warp_points(coeffs: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                model: str = "bilinear"):
    """Model-dispatching point warp: 'bilinear' (8 coeffs, reference
    behavior) or 'projective' (9 coeffs)."""
    if model == "bilinear":
        return warp_xy(coeffs, x, y)
    if model == "projective":
        return projective_xy(coeffs, x, y)
    raise ValueError(model)


@partial(jax.jit, static_argnames=("out_shape", "model"))
def warp_image(src: jnp.ndarray, coeffs: jnp.ndarray,
               offset_x: jnp.ndarray, offset_y: jnp.ndarray,
               out_shape: tuple[int, int] | None = None,
               out: jnp.ndarray | None = None,
               model: str = "bilinear") -> jnp.ndarray:
    """Inverse-warp src onto a canvas (warpingImageByHomography,
    ImageProcess.cpp:596-606).

    For each canvas pixel (x, y): (nx, ny) = warp(x+ox, y+oy), truncated
    toward zero to ints (the reference assigns the warped floats to ``int``).
    In-bounds pixels copy src[ny, nx] (the reference calls bilinear
    interpolation with integer coords, which reduces to a direct read);
    out-of-bounds pixels take the existing canvas value (0 on a fresh canvas).

    Provide either ``out`` (a canvas to fill) or ``out_shape`` (H, W).
    """
    if out is None:
        assert out_shape is not None
        out = jnp.zeros(out_shape + (src.shape[2],), dtype=src.dtype)
    h, w = out.shape[0], out.shape[1]
    src_h, src_w = src.shape[0], src.shape[1]

    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    xw, yw = warp_points(coeffs, xs + offset_x, ys + offset_y, model)
    nx = jnp.trunc(xw).astype(jnp.int32)   # C float->int truncation
    ny = jnp.trunc(yw).astype(jnp.int32)
    valid = (nx >= 0) & (nx < src_w) & (ny >= 0) & (ny < src_h)
    nx_c = jnp.clip(nx, 0, src_w - 1)
    ny_c = jnp.clip(ny, 0, src_h - 1)
    vals = src[ny_c, nx_c]
    return jnp.where(valid[..., None], vals, out)


@partial(jax.jit, static_argnames=("out_shape",))
def shift_image(src: jnp.ndarray, offset_x: jnp.ndarray, offset_y: jnp.ndarray,
                out: jnp.ndarray | None = None,
                out_shape: tuple[int, int] | None = None) -> jnp.ndarray:
    """Offset copy without interpolation (movingImageByOffset,
    ImageProcess.cpp:608-620). offset_* are ints (the reference truncates the
    float canvas offsets at the call site, ImageProcess.cpp:224).

    Pass ``out_shape`` to build the zero canvas on device (a host-built
    canvas would ride the host->device link every stitch edge)."""
    if out is None:
        assert out_shape is not None
        out = jnp.zeros(out_shape + (src.shape[2],), dtype=src.dtype)
    h, w = out.shape[0], out.shape[1]
    src_h, src_w = src.shape[0], src.shape[1]
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    nx = xs + offset_x
    ny = ys + offset_y
    valid = (nx >= 0) & (nx < src_w) & (ny >= 0) & (ny < src_h)
    nx_c = jnp.clip(nx, 0, src_w - 1)
    ny_c = jnp.clip(ny, 0, src_h - 1)
    vals = src[ny_c, nx_c]
    return jnp.where(valid[..., None], vals, out)
