"""Warp-model solvers.

The reference solves A h = b with rows [x, y, x*y, 1] twice (x' and y'
targets) — 4x4 LU for a minimal sample (getHomographyMat,
/root/reference/ImageProcess.cpp:439-462; CImg.h:25310-25356) and an
overdetermined least-squares refit on the inliers (getInlinerHomography,
ImageProcess.cpp:500-529).

TPU-native: solves are batched/vmapped over RANSAC hypotheses. Because the
design matrix contains x*y terms (values up to ~1e6 at canvas scale), we
normalize coordinates (shift/scale) before solving and map the coefficients
back exactly — keeping fp32 well-conditioned on the MXU instead of falling
back to f64 (which TPUs emulate slowly). The bilinear model family is closed
under this reparameterization, so the result is mathematically identical.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _design_rows(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """[N, 4] rows [x, y, x*y, 1] (ImageProcess.cpp:446-449)."""
    return jnp.stack([x, y, x * y, jnp.ones_like(x)], axis=-1)


def _denormalize(coeffs_n: jnp.ndarray, cx, cy, s) -> jnp.ndarray:
    """Map coefficients fitted on normalized coords x̃=(x-cx)/s, ỹ=(y-cy)/s
    back to raw-coordinate coefficients, exactly.

    For one output channel with normalized coeffs (a, b, c, d):
      out = a*x̃ + b*ỹ + c*x̃ỹ + d
          = (a/s - c*cy/s²)x + (b/s - c*cx/s²)y + (c/s²)xy
            + (d - a*cx/s - b*cy/s + c*cx*cy/s²)
    coeffs_n: [..., 2, 4] (channels x', y'). Returns same shape.
    """
    a = coeffs_n[..., 0]
    b = coeffs_n[..., 1]
    c = coeffs_n[..., 2]
    d = coeffs_n[..., 3]
    s2 = s * s
    w_x = a / s - c * cy / s2
    w_y = b / s - c * cx / s2
    w_xy = c / s2
    w_1 = d - a * cx / s - b * cy / s + c * cx * cy / s2
    return jnp.stack([w_x, w_y, w_xy, w_1], axis=-1)


def _solve4_spd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Unrolled 4x4 Cholesky solve for the SPD normal-equation systems.

    A handful of scalar VPU flops per system — vmaps over thousands of
    RANSAC hypotheses without falling back to a batched LU. a: [4, 4] SPD,
    b: [4, K]. Returns x with a @ x = b.
    """
    eps = 1e-30
    l11 = jnp.sqrt(jnp.maximum(a[0, 0], eps))
    l21 = a[1, 0] / l11
    l31 = a[2, 0] / l11
    l41 = a[3, 0] / l11
    l22 = jnp.sqrt(jnp.maximum(a[1, 1] - l21 * l21, eps))
    l32 = (a[2, 1] - l31 * l21) / l22
    l42 = (a[3, 1] - l41 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(a[2, 2] - l31 * l31 - l32 * l32, eps))
    l43 = (a[3, 2] - l41 * l31 - l42 * l32) / l33
    l44 = jnp.sqrt(jnp.maximum(
        a[3, 3] - l41 * l41 - l42 * l42 - l43 * l43, eps))
    # forward substitution L y = b
    y1 = b[0] / l11
    y2 = (b[1] - l21 * y1) / l22
    y3 = (b[2] - l31 * y1 - l32 * y2) / l33
    y4 = (b[3] - l41 * y1 - l42 * y2 - l43 * y3) / l44
    # back substitution L^T x = y
    x4 = y4 / l44
    x3 = (y3 - l43 * x4) / l33
    x2 = (y2 - l32 * x3 - l42 * x4) / l22
    x1 = (y1 - l21 * x2 - l31 * x3 - l41 * x4) / l11
    return jnp.stack([x1, x2, x3, x4])


def solve_warp(src_xy: jnp.ndarray, dst_xy: jnp.ndarray,
               weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Fit the 8-coefficient bilinear warp mapping src -> dst.

    src_xy, dst_xy: [N, 2]. weights: optional [N] mask/weights for the
    least-squares refit (the RANSAC inlier set with static shape). With
    N == 4 and unit weights this reproduces the reference's exact minimal
    solve; with more points it is the least-squares refit.

    Returns the flat (8,) coefficient vector
    [w11, w12, w13, w21, w22, w23, w31, w32] (see ops.warp.warp_xy).
    """
    x, y = src_xy[:, 0], src_xy[:, 1]
    if weights is None:
        weights = jnp.ones_like(x)
    wsum = jnp.maximum(jnp.sum(weights), 1.0)
    cx = jnp.sum(weights * x) / wsum
    cy = jnp.sum(weights * y) / wsum
    spread = jnp.sum(weights * (jnp.abs(x - cx) + jnp.abs(y - cy))) / wsum
    s = jnp.maximum(spread, 1e-3)

    xn = (x - cx) / s
    yn = (y - cy) / s
    a_mat = _design_rows(xn, yn)                      # [N, 4]
    aw = a_mat * weights[:, None]
    ata = aw.T @ a_mat                                 # [4, 4]
    atb = aw.T @ dst_xy                                # [4, 2]
    # Tikhonov epsilon keeps degenerate samples (duplicate points) finite;
    # RANSAC scoring discards them, mirroring the reference where CImg's
    # solver returns garbage for singular systems.
    ata = ata + 1e-6 * jnp.eye(4, dtype=ata.dtype)
    coeffs_n = _solve4_spd(ata, atb).T                 # [2, 4]
    coeffs = _denormalize(coeffs_n, cx, cy, s)         # [2, 4]
    return coeffs.reshape(8)


solve_warp_batched = jax.vmap(solve_warp, in_axes=(0, 0, None))
