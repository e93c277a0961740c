"""Van Vliet recursive blur vs a literal port of CImg's C loop
(_cimg_recursive_apply order 0, Neumann, CImg.h:34887-34933)."""
import numpy as np
import jax.numpy as jnp

import pytest

from computervisionimagestich2_tpu.ops.gaussian import (
    _triggs_matrix, _vanvliet_coefs, vanvliet_blur, vanvliet_blur_axis)


def cimg_recursive_apply_0(data, filt):
    """Literal numpy port (double precision, Neumann boundary)."""
    data = data.astype(np.float64).copy()
    n = len(data)
    sumsq = filt[0]
    ssum = sumsq * sumsq
    a1, a2, a3 = filt[1], filt[2], filt[3]
    scale_m = 1.0 / ((1.0 + a1 - a2 + a3) * (1.0 - a1 - a2 - a3)
                     * (1.0 + a2 + (a1 - a3) * a3))
    m = [scale_m * (-a3 * a1 + 1.0 - a3 * a3 - a2),
         scale_m * (a3 + a1) * (a2 + a3 * a1),
         scale_m * a3 * (a1 + a3 * a2),
         scale_m * (a1 + a3 * a2),
         -scale_m * (a2 - 1.0) * (a2 + a3 * a1),
         -scale_m * a3 * (a3 * a1 + a3 * a3 + a2 - 1.0),
         scale_m * (a3 * a1 + a2 + a1 * a1 - a2 * a2),
         scale_m * (a1 * a2 + a3 * a2 * a2 - a1 * a3 * a3
                    - a3 * a3 * a3 - a3 * a2 + a3),
         scale_m * a3 * (a1 + a3 * a2)]
    iplus = data[n - 1]
    val = np.zeros(4)
    # forward
    for k in range(1, 4):
        val[k] = data[0] / sumsq
    pos = 0
    for _ in range(n):
        val[0] = data[pos] + val[1] * filt[1] + val[2] * filt[2] \
            + val[3] * filt[3]
        data[pos] = val[0]
        pos += 1
        val[3], val[2], val[1] = val[2], val[1], val[0]
    pos -= 1
    # Triggs + backward
    uplus = iplus / (1.0 - a1 - a2 - a3)
    vplus = uplus / (1.0 - a1 - a2 - a3)
    unp, unp1, unp2 = val[1] - uplus, val[2] - uplus, val[3] - uplus
    val[0] = (m[0] * unp + m[1] * unp1 + m[2] * unp2 + vplus) * ssum
    val[1] = (m[3] * unp + m[4] * unp1 + m[5] * unp2 + vplus) * ssum
    val[2] = (m[6] * unp + m[7] * unp1 + m[8] * unp2 + vplus) * ssum
    data[pos] = val[0]
    pos -= 1
    val[3], val[2], val[1] = val[2], val[1], val[0]
    for _ in range(1, n):
        val[0] = data[pos] * ssum + val[1] * filt[1] + val[2] * filt[2] \
            + val[3] * filt[3]
        data[pos] = val[0]
        pos -= 1
        val[3], val[2], val[1] = val[2], val[1], val[0]
    return data


@pytest.mark.slow
def test_axis_matches_cimg_loop():
    rng = np.random.default_rng(3)
    big_b, f1, f2, f3 = _vanvliet_coefs(2.0)
    filt = [big_b, f1, f2, f3]
    x = rng.uniform(0, 255, 200)
    expect = cimg_recursive_apply_0(x, filt)
    got = np.asarray(vanvliet_blur_axis(jnp.asarray(x, jnp.float32), 2.0))
    np.testing.assert_allclose(got, expect, atol=0.05)


@pytest.mark.slow  # 20s; non-default blur_impl parity, core axis parity stays quick
def test_blur_2d_separable_order():
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 255, (40, 56))
    # oracle: rows (x axis) then columns (y axis), like CImg blur()
    big_b, f1, f2, f3 = _vanvliet_coefs(2.0)
    filt = [big_b, f1, f2, f3]
    mid = np.stack([cimg_recursive_apply_0(r, filt) for r in img])
    expect = np.stack([cimg_recursive_apply_0(c, filt) for c in mid.T]).T
    got = np.asarray(vanvliet_blur(jnp.asarray(img, jnp.float32), 2.0))
    np.testing.assert_allclose(got, expect, atol=0.1)


def test_small_sigma_identity():
    x = jnp.asarray(np.arange(20, dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(vanvliet_blur_axis(x, 0.3)),
                                  np.asarray(x))


def test_short_axes_match_cimg_loop():
    """n < 4 axes: the Triggs states fall back to the Neumann init values
    (CImg.h:34910), and n==1's backward loop runs zero iterations."""
    rng = np.random.default_rng(5)
    big_b, f1, f2, f3 = _vanvliet_coefs(2.0)
    filt = [big_b, f1, f2, f3]
    for n in (1, 2, 3, 4):
        x = rng.uniform(0, 255, n)
        expect = cimg_recursive_apply_0(x, filt)
        got = np.asarray(vanvliet_blur_axis(jnp.asarray(x, jnp.float32), 2.0))
        np.testing.assert_allclose(got, expect, atol=0.05,
                                   err_msg=f"n={n}")


@pytest.mark.slow  # 14s; non-default blur_impl edge case
def test_blur_2d_skips_size1_axes():
    """get_blur skips size-1 axes (CImg.h:35115-35116): a [1, W] image is
    blurred along W only, a [H, 1] along H only."""
    rng = np.random.default_rng(6)
    big_b, f1, f2, f3 = _vanvliet_coefs(2.0)
    filt = [big_b, f1, f2, f3]
    row = rng.uniform(0, 255, (1, 37))
    expect = cimg_recursive_apply_0(row[0], filt)[None, :]
    got = np.asarray(vanvliet_blur(jnp.asarray(row, jnp.float32), 2.0))
    np.testing.assert_allclose(got, expect, atol=0.05)
    col = rng.uniform(0, 255, (29, 1))
    expect = cimg_recursive_apply_0(col[:, 0], filt)[:, None]
    got = np.asarray(vanvliet_blur(jnp.asarray(col, jnp.float32), 2.0))
    np.testing.assert_allclose(got, expect, atol=0.05)


@pytest.mark.slow
def test_wide_canvas_vanvliet_blend():
    """A wide panorama canvas whose short-axis pyramid reaches size 1
    (40x600, level_mode='max' -> 9 levels) must not crash in the vanvliet
    parity mode and must stay close to the FIR blend."""
    from computervisionimagestich2_tpu.models.blender import blend_two_images

    rng = np.random.default_rng(7)
    h, w = 40, 600
    a = np.zeros((h, w, 3), np.float32)
    b = np.zeros((h, w, 3), np.float32)
    a[:, : w * 2 // 3] = rng.uniform(1, 255, (h, w * 2 // 3, 3))
    b[:, w // 3:] = rng.uniform(1, 255, (h, w - w // 3, 3))
    out_vv = np.asarray(blend_two_images(
        jnp.asarray(a), jnp.asarray(b), "max", 2.0, "vanvliet"))
    out_fir = np.asarray(blend_two_images(
        jnp.asarray(a), jnp.asarray(b), "max", 2.0, "fir"))
    assert out_vv.shape == (h, w, 3)
    assert np.isfinite(out_vv).all()
    # same blend decision, different blur kernels: agree loosely
    assert np.abs(out_vv - out_fir).mean() < 12.0
