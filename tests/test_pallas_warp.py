"""One-hot-matmul warp kernel vs warp_image (interpret mode).

The kernel must be BIT-IDENTICAL to ops.warp.warp_image on a fresh canvas:
same f32 warp evaluation order, same trunc-to-int reads, zeros outside the
source. Coefficient draws cover the real panorama-edge geometry that
defeats the banded kernel (x-scale far from 1 via the bilinear xy term).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from computervisionimagestich2_tpu.ops import pallas_warp as pw
from computervisionimagestich2_tpu.ops.warp import warp_image


CASES = [
    # (coeffs, offset_x, offset_y, src_hw, out_hw)
    # near-translation (banded-kernel territory)
    ([1.0, 0.02, 0.0, -120.0, 0.01, 1.0, 0.0, 12.0], -130.0, -20.0,
     (96, 160), (128, 256)),
    # real dataset1-edge-like geometry: scale 0.93 + xy cross term
    ([0.93, -0.027, 2.4e-4, 214.0, 3.2e-3, 1.0, -2.1e-6, 4.0], -40.0, -16.0,
     (200, 240), (256, 512)),
    # strong xy term at canvas distance (the gather-fallback case)
    ([0.9, -0.05, 6.0e-4, 60.0, 0.01, 1.05, -8.0e-5, -10.0], -10.0, -64.0,
     (160, 200), (320, 384)),
    # pure downscale (every output row reads a sparse source row)
    ([1.7, 0.0, 0.0, -30.0, 0.0, 1.7, 0.0, -20.0], 0.0, 0.0,
     (128, 160), (120, 256)),
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_onehot_warp_matches_gather(case):
    coeffs, ox, oy, src_hw, out_hw = CASES[case]
    rng = np.random.default_rng(11 + case)
    src = jnp.asarray(
        rng.random((src_hw[0], src_hw[1], 3), dtype=np.float32) * 255.0)
    cj = jnp.asarray(coeffs, jnp.float32)

    plan = pw.onehot_warp_params(np.asarray(coeffs, np.float64), out_hw,
                                 ox, oy, src_hw)
    assert plan is not None, "planner rejected an in-envelope warp"
    starts, winr, winc, d = plan

    ref = warp_image(src, cj, jnp.float32(ox), jnp.float32(oy),
                     out_shape=out_hw)
    got = pw.warp_image_onehot(src, cj, jnp.float32(ox), jnp.float32(oy),
                               out_hw, starts, winr, winc, d,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_planner_rejects_projective_and_extreme_span():
    c = np.asarray([1.0, 0, 0, 0, 0, 1.0, 0, 0, 1.0])
    assert pw.onehot_warp_params(c, (64, 128), 0, 0, (64, 128),
                                 model="projective") is None
    # 20x horizontal downscale: x-span per 128-lane tile >> max_winc
    c2 = np.asarray([20.0, 0, 0, 0, 0, 1.0, 0, 0])
    assert pw.onehot_warp_params(c2, (64, 2560), 0, 0,
                                 (64, 4096), max_winc=512) is None


def test_onehot_params_reject_unpackable_source():
    """ADVICE r4: the packed (sy<<16)|sx tile word cannot represent
    sources taller than 2^15 rows or wider than 2^16 px — the planner
    must fall back (return None) instead of silently corrupting."""
    import numpy as np
    from computervisionimagestich2_tpu.ops.pallas_warp import (
        onehot_warp_params)

    coeffs = np.array([1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0], np.float32)
    ok = onehot_warp_params(coeffs, (64, 256), 0.0, 0.0, (512, 512))
    assert ok is not None
    assert onehot_warp_params(coeffs, (64, 256), 0.0, 0.0,
                              (40000, 512)) is None
    assert onehot_warp_params(coeffs, (64, 256), 0.0, 0.0,
                              (512, 70000)) is None
