"""Projective (DLT) warp-model mode tests."""
import dataclasses

import jax
import numpy as np

from computervisionimagestich2_tpu.core.types import MatchPairs
from computervisionimagestich2_tpu.models.ransac import ransac_warp
from computervisionimagestich2_tpu.ops.solve import solve_projective
from computervisionimagestich2_tpu.ops.warp import projective_xy, warp_points
import pytest


def apply_h(h, x, y):
    den = h[6] * x + h[7] * y + h[8]
    return ((h[0] * x + h[1] * y + h[2]) / den,
            (h[3] * x + h[4] * y + h[5]) / den)


def test_solve_projective_recovers_homography(rng):
    h_true = np.array([1.05, 0.08, 20.0, -0.04, 0.97, 5.0,
                       1e-4, -5e-5, 1.0])
    src = rng.uniform(0, 500, (30, 2)).astype(np.float32)
    u, v = apply_h(h_true, src[:, 0], src[:, 1])
    dst = np.stack([u, v], -1).astype(np.float32)
    got = np.asarray(solve_projective(src, dst))
    gu, gv = projective_xy(got, src[:, 0], src[:, 1])
    np.testing.assert_allclose(np.asarray(gu), u, atol=0.2)
    np.testing.assert_allclose(np.asarray(gv), v, atol=0.2)


def test_ransac_projective_with_outliers(rng):
    h_true = np.array([1.0, 0.03, 50.0, -0.02, 1.02, -8.0, 5e-5, 1e-5, 1.0])
    n, cap = 60, 128
    src = rng.uniform(0, 400, (n, 2)).astype(np.float32)
    u, v = apply_h(h_true, src[:, 0], src[:, 1])
    dst = np.stack([u, v], -1).astype(np.float32)
    dst[:15] += rng.uniform(60, 150, (15, 2)).astype(np.float32)
    pad = lambda a: np.pad(a, ((0, cap - n), (0, 0)))
    valid = np.zeros(cap, bool)
    valid[:n] = True
    pairs = MatchPairs(pad(src), pad(dst), valid)
    coeffs, mask, count = ransac_warp(pairs, jax.random.PRNGKey(1),
                                      model="projective")
    assert int(np.asarray(count)) >= 42
    gu, gv = warp_points(coeffs, src[15:, 0], src[15:, 1], "projective")
    np.testing.assert_allclose(np.asarray(gu), u[15:], atol=1.0)
    np.testing.assert_allclose(np.asarray(gv), v[15:], atol=1.0)


@pytest.mark.slow
def test_stitcher_projective_mode(rng):
    from test_integration import SMALL, make_scene
    from computervisionimagestich2_tpu.models.stitcher import Stitcher

    scene = make_scene(rng)
    cfg = dataclasses.replace(SMALL, ordering="chain",
                              warp_model="projective")
    out = Stitcher(cfg).stitch([scene[:, :140], scene[:, 60:]])
    assert out.shape[1] > 150
