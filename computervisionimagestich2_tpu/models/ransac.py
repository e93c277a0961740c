"""RANSAC warp estimation — vmapped hypotheses instead of a sequential loop.

Equivalent of ImageProcess::RANSAC (/root/reference/ImageProcess.cpp:395-436):
sample 4 distinct pairs, solve the 8-coefficient bilinear warp, count inliers
(reprojection L2 < 4.0 over *all* pairs — the seed points are not excluded,
ImageProcess.cpp:478-480), keep the best, refit on its inliers by least
squares (getInlinerHomography, ImageProcess.cpp:500-529).

TPU-native: all K hypotheses run as one batch — K 4-point solves via a
batched 4x4 linear solve, one [K, N] reprojection/inlier evaluation on the
VPU, argmax, then a masked least-squares refit. K defaults to 128 (>= the
reference's 72 iterations computed from confidence 0.99 / inlier ratio 0.5).
RNG is threefry (jax.random); parity is on the refit model, which is stable
across RNGs at this hypothesis count (SURVEY.md §7 "RANSAC RNG").
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import RansacConfig
from ..core.types import MatchPairs
from ..ops.solve import solve_projective, solve_warp
from ..ops.warp import warp_points, warp_xy


@partial(jax.jit, static_argnames=("n_hypotheses", "threshold", "n_sample",
                                   "model"))
def ransac_warp(pairs: MatchPairs, key: jax.Array,
                n_hypotheses: int = 128, threshold: float = 4.0,
                n_sample: int = 4, model: str = "bilinear"):
    """Returns (coeffs, inlier_mask [N], n_inliers scalar). ``model`` picks
    the warp family: 'bilinear' (8 coeffs, reference behavior) or
    'projective' (9 coeffs, normalized DLT)."""
    solve_fn = solve_warp if model == "bilinear" else solve_projective
    n_cap = pairs.src_xy.shape[0]
    valid_f = pairs.valid.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(valid_f), 1.0)
    p = valid_f / n_valid

    def sample_one(k):
        return jax.random.choice(k, n_cap, shape=(n_sample,), replace=False, p=p)

    keys = jax.random.split(key, n_hypotheses)
    sample_idx = jax.vmap(sample_one)(keys)               # [K, 4]

    src_s = pairs.src_xy[sample_idx]                      # [K, 4, 2]
    dst_s = pairs.dst_xy[sample_idx]
    coeffs_k = jax.vmap(lambda s, d: solve_fn(s, d))(src_s, dst_s)

    # reprojection of every pair under every hypothesis: [K, N]
    x = pairs.src_xy[:, 0]
    y = pairs.src_xy[:, 1]
    xw, yw = jax.vmap(lambda c: warp_points(c, x, y, model))(coeffs_k)
    dx = xw - pairs.dst_xy[:, 0][None, :]
    dy = yw - pairs.dst_xy[:, 1][None, :]
    dist = jnp.sqrt(dx * dx + dy * dy)                    # [K, N]
    inliers = (dist < threshold) & pairs.valid[None, :]
    counts = jnp.sum(inliers.astype(jnp.int32), axis=1)   # [K]

    best = jnp.argmax(counts)
    best_mask = inliers[best]
    if model == "bilinear":
        # warm-started residual refit: keeps every f32 intermediate at
        # O(threshold) px — without it the f32 normal equations drift
        # 1.8-3.6 px (corners) off the reference's f64 refit on the SAME
        # inlier set (scripts/parity_refit.py, RESULTS round 3)
        coeffs = solve_warp(pairs.src_xy, pairs.dst_xy,
                            best_mask.astype(jnp.float32),
                            init=coeffs_k[best])
    else:
        coeffs = solve_fn(pairs.src_xy, pairs.dst_xy,
                          best_mask.astype(jnp.float32))
    return coeffs, best_mask, counts[best]


def ransac_config_call(pairs: MatchPairs, cfg: RansacConfig,
                       key: jax.Array | None = None, salt: int = 0):
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    key = jax.random.fold_in(key, salt)
    return ransac_warp(pairs, key, cfg.n_hypotheses, cfg.threshold,
                       cfg.n_sample)


def reprojection_errors(coeffs: jnp.ndarray, pairs: MatchPairs) -> jnp.ndarray:
    """Per-pair reprojection L2 (the BASELINE.json parity metric)."""
    xw, yw = warp_xy(coeffs, pairs.src_xy[:, 0], pairs.src_xy[:, 1])
    return jnp.sqrt((xw - pairs.dst_xy[:, 0]) ** 2
                    + (yw - pairs.dst_xy[:, 1]) ** 2)
