"""Tests for exact matching and vmapped RANSAC."""
import jax
import numpy as np

from computervisionimagestich2_tpu.core.types import Features, MatchPairs
from computervisionimagestich2_tpu.models.matcher import match_count, match_features
from computervisionimagestich2_tpu.models.ransac import (
    ransac_warp,
    reprojection_errors,
)


def make_features(desc, xy):
    n, d = desc.shape
    cap = 64
    pad_desc = np.zeros((cap, d), np.float32)
    pad_desc[:n] = desc
    pad_xy = np.zeros((cap, 2), np.float32)
    pad_xy[:n] = xy
    valid = np.zeros(cap, bool)
    valid[:n] = True
    return Features(desc=pad_desc, xy=pad_xy,
                    scale=np.ones(cap, np.float32), valid=valid)


def test_match_features_pairs_aligned(rng):
    # B's descriptors are noisy copies of a subset of A's
    da = rng.normal(size=(10, 16)).astype(np.float32)
    da /= np.linalg.norm(da, axis=1, keepdims=True)
    perm = [3, 7, 1]
    db = da[perm] + 0.001
    xa = rng.uniform(0, 100, (10, 2)).astype(np.float32)
    xb = rng.uniform(0, 100, (3, 2)).astype(np.float32)
    fa = make_features(da, xa)
    fb = make_features(db, xb)
    pairs = match_features(fa, fb, ratio=0.5, max_matches=32)
    n = int(np.asarray(pairs.count()))
    assert n == 3
    got_src = np.asarray(pairs.src_xy)[:n]
    got_dst = np.asarray(pairs.dst_xy)[:n]
    # src must be A's keypoint of the matched descriptor, dst B's keypoint
    np.testing.assert_allclose(got_src, xa[perm], atol=1e-5)
    np.testing.assert_allclose(got_dst, xb, atol=1e-5)
    assert int(np.asarray(match_count(fa, fb))) == 3


def test_ransac_recovers_warp_with_outliers(rng):
    true_c = np.array([1.01, 0.04, 2e-5, 35.0, -0.03, 0.99, -1e-5, -12.0],
                      np.float32)
    n, cap = 60, 128
    src = rng.uniform(0, 400, (n, 2)).astype(np.float32)
    x, y = src[:, 0], src[:, 1]
    dst = np.stack([
        true_c[0] * x + true_c[1] * y + true_c[2] * x * y + true_c[3],
        true_c[4] * x + true_c[5] * y + true_c[6] * x * y + true_c[7],
    ], axis=-1).astype(np.float32)
    dst[:20] += rng.uniform(50, 200, (20, 2)).astype(np.float32)  # outliers

    pad = lambda a: np.pad(a, ((0, cap - n), (0, 0)))
    valid = np.zeros(cap, bool)
    valid[:n] = True
    pairs = MatchPairs(pad(src), pad(dst), valid)

    coeffs, mask, count = ransac_warp(pairs, jax.random.PRNGKey(0),
                                      n_hypotheses=128, threshold=4.0)
    count = int(np.asarray(count))
    assert count >= 38, count  # the 40 inliers (allow edge effects)
    errs = np.asarray(reprojection_errors(coeffs, pairs))[20:n]
    assert errs.max() < 1.0, errs.max()


def test_ransac_deterministic(rng):
    n, cap = 30, 64
    src = rng.uniform(0, 300, (n, 2)).astype(np.float32)
    dst = src + np.array([25.0, -3.0], np.float32)
    pad = lambda a: np.pad(a, ((0, cap - n), (0, 0)))
    valid = np.zeros(cap, bool)
    valid[:n] = True
    pairs = MatchPairs(pad(src), pad(dst), valid)
    c1, _, _ = ransac_warp(pairs, jax.random.PRNGKey(666666))
    c2, _, _ = ransac_warp(pairs, jax.random.PRNGKey(666666))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
