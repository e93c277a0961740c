"""Oracle tests for the substrate ops: BMP codec, bilinear sampling,
cylindrical projection, warp model, gaussian blur, CImg-style resize,
distance/top-2, warp solve."""
import math

import numpy as np
import pytest

from computervisionimagestich2_tpu.ops import distance, gaussian, resize, solve, warp
from computervisionimagestich2_tpu.utils import bmp


# ---------------------------------------------------------------- BMP codec
def test_bmp_roundtrip(rng):
    img = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
    out = bmp.decode_bmp(bmp.encode_bmp(img))
    np.testing.assert_array_equal(out, img)


def test_bmp_reads_reference_dataset(input_images):
    for img in input_images:
        assert img.shape == (512, 384, 3)
        assert img.dtype == np.uint8
    # sanity: images are non-trivial
    assert input_images[0].std() > 10


# ------------------------------------------------------------ bilinear_sample
def _ref_bilinear(src, x, y, c):
    """Direct transcription of Projection::bilinearInterpolation
    (Projection.cpp:3-18) as the NumPy oracle."""
    h, w = src.shape[:2]
    xf, yf = math.floor(x), math.floor(y)
    xc = (w - 1) if math.ceil(x) >= (w - 1) else math.ceil(x)
    yc = (h - 1) if math.ceil(y) >= (h - 1) else math.ceil(y)
    a, b = x - xf, y - yf
    return ((1 - a) * (1 - b) * float(src[yf, xf, c])
            + a * (1 - b) * float(src[yf, xc, c])
            + a * b * float(src[yc, xc, c])
            + (1 - a) * b * float(src[yc, xf, c]))


def test_bilinear_sample_matches_reference(rng):
    src = rng.integers(0, 256, size=(20, 30, 3)).astype(np.float32)
    xs = rng.uniform(0, 29, size=50).astype(np.float32)
    ys = rng.uniform(0, 19, size=50).astype(np.float32)
    got = np.asarray(warp.bilinear_sample(src, xs, ys))
    for i in range(50):
        for c in range(3):
            expect = _ref_bilinear(src, float(xs[i]), float(ys[i]), c)
            assert got[i, c] == pytest.approx(expect, abs=1e-3)


def test_bilinear_sample_integer_coords_is_identity(rng):
    src = rng.integers(0, 256, size=(8, 9, 3)).astype(np.float32)
    xs = np.arange(9, dtype=np.float32)
    got = np.asarray(warp.bilinear_sample(src, xs, np.full(9, 3.0, np.float32)))
    np.testing.assert_allclose(got, src[3], atol=1e-4)


# ------------------------------------------------------ cylindrical projection
def _ref_projection(src, angle=15.0):
    """Transcription of Projection::imageProjection (Projection.cpp:20-73)."""
    src_h, src_w = src.shape[:2]
    res = np.zeros_like(src)
    flag = src_w > src_h
    width = src_h if flag else src_w
    height = src_w if flag else src_h
    tan_val = math.tan(angle * math.pi / 180.0)
    r = (width / 2.0) / tan_val
    for y in range(src_h):
        for x in range(src_w):
            if flag:
                dst_x = y - width // 2
                dst_y = x - height // 2
            else:
                dst_x = x - width // 2
                dst_y = y - height // 2
            k = r / math.sqrt(r * r + dst_x * dst_x)
            sx = dst_x / k + width // 2
            sy = dst_y / k + height // 2
            if flag:
                if 0 <= sx < src_h and 0 <= sy < src_w:
                    for c in range(3):
                        res[y, x, c] = int(_ref_bilinear(src.astype(np.float32), sy, sx, c))
            else:
                if 0 <= sx < src_w and 0 <= sy < src_h:
                    for c in range(3):
                        res[y, x, c] = int(_ref_bilinear(src.astype(np.float32), sx, sy, c))
    return res


@pytest.mark.parametrize("shape", [(24, 17), (15, 26)])
def test_cylindrical_projection_matches_reference(rng, shape):
    src = rng.integers(0, 256, size=shape + (3,)).astype(np.uint8)
    expect = _ref_projection(src)
    got = np.asarray(warp.cylindrical_project(src.astype(np.float32)))
    # float32 vs float64 rounding can flip a u8 truncation by 1
    assert np.mean(np.abs(got - expect.astype(np.float32)) > 1.0) < 0.01


# ------------------------------------------------------------------ warp model
def test_warp_xy_matches_reference_formula():
    c = np.arange(1, 9, dtype=np.float32) * 0.1
    x, y = np.float32(3.0), np.float32(5.0)
    xw, yw = warp.warp_xy(c, x, y)
    assert float(xw) == pytest.approx(c[0] * x + c[1] * y + c[2] * x * y + c[3], rel=1e-6)
    assert float(yw) == pytest.approx(c[4] * x + c[5] * y + c[6] * x * y + c[7], rel=1e-6)


def test_warp_image_identity():
    src = np.arange(5 * 7 * 3, dtype=np.float32).reshape(5, 7, 3)
    ident = np.array([1, 0, 0, 0, 0, 1, 0, 0], dtype=np.float32)
    out = warp.warp_image(src, ident, np.float32(0), np.float32(0), out_shape=(5, 7))
    np.testing.assert_allclose(np.asarray(out), src)


def test_shift_image_matches_offset_semantics():
    src = np.arange(4 * 5 * 3, dtype=np.float32).reshape(4, 5, 3)
    out = warp.shift_image(src, np.int32(-2), np.int32(-1), np.zeros((6, 8, 3), np.float32))
    out = np.asarray(out)
    # dst(x, y) = src(x + ox, y + oy) when in bounds
    np.testing.assert_allclose(out[1:5, 2:7], src)
    assert out[0].sum() == 0 and out[:, :2].sum() == 0


def test_shift_image_offset_sweep_matches_scalar_oracle(rng):
    """Randomized offsets incl. partial/total overlap and far out-of-range
    (guards the pad + dynamic_slice formulation's clamp handling)."""
    def oracle(src, ox, oy, out):
        res = out.copy()
        for yy in range(out.shape[0]):
            for xx in range(out.shape[1]):
                sy, sx = yy + oy, xx + ox
                if 0 <= sy < src.shape[0] and 0 <= sx < src.shape[1]:
                    res[yy, xx] = src[sy, sx]
        return res

    for _ in range(25):
        sh, sw = rng.integers(1, 14, 2)
        h, w = rng.integers(1, 14, 2)
        src = rng.random((sh, sw, 3)).astype(np.float32)
        out = rng.random((h, w, 3)).astype(np.float32)
        ox = int(rng.integers(-h - sw - 3, sh + w + 3))
        oy = int(rng.integers(-h - sh - 3, sh + h + 3))
        got = np.asarray(warp.shift_image(
            src, np.int32(ox), np.int32(oy), out=out))
        np.testing.assert_array_equal(got, oracle(src, ox, oy, out))


# -------------------------------------------------------------- gaussian blur
def test_gauss_taps_match_vlfeat_formula():
    sigma = 1.23
    taps = gaussian.gauss_taps(sigma)
    w = max(math.ceil(4 * sigma), 1)
    assert taps.shape == (2 * w + 1,)
    expect = np.exp(-0.5 * ((np.arange(2 * w + 1) - w) / sigma) ** 2)
    expect /= expect.sum()
    np.testing.assert_allclose(taps, expect, rtol=1e-6)


def test_gaussian_blur_matches_numpy_oracle(rng):
    img = rng.normal(size=(12, 16)).astype(np.float32)
    sigma = 0.8
    taps = gaussian.gauss_taps(sigma)
    r = (len(taps) - 1) // 2
    padded = np.pad(img, r, mode="edge")
    tmp = np.apply_along_axis(lambda m: np.convolve(m, taps[::-1], "valid"), 1, padded)[r:-r]
    expect = np.apply_along_axis(lambda m: np.convolve(m, taps[::-1], "valid"), 0,
                                 np.pad(tmp, ((r, r), (0, 0)), mode="edge"))
    got = np.asarray(gaussian.gaussian_blur(img, sigma))
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_gaussian_blur_preserves_constant():
    img = np.full((10, 10), 7.0, np.float32)
    out = np.asarray(gaussian.gaussian_blur(img, 2.0))
    np.testing.assert_allclose(out, 7.0, atol=1e-4)


# ------------------------------------------------------------------- resize
def _cimg_shrink_1d(src, n_dst):
    """Oracle for CImg case-2 moving average along one axis."""
    n_src = len(src)
    out = np.zeros(n_dst)
    a, b, c, s, t = n_src * n_dst, n_src, n_dst, 0, 0
    acc = 0.0
    while a:
        d = min(b, c)
        a -= d
        b -= d
        c -= d
        acc += src[s] * d
        if not b:
            out[t] = acc / n_src
            acc = 0.0
            t += 1
            b = n_src
        if not c:
            s += 1
            c = n_dst
    return out


@pytest.mark.parametrize("n_src,n_dst", [(8, 4), (9, 4), (7, 3), (10, 5)])
def test_resize_shrink_matches_cimg_oracle(rng, n_src, n_dst):
    row = rng.normal(size=n_src).astype(np.float32)
    img = np.tile(row, (4, 1))
    got = np.asarray(resize.cimg_resize(img, 4, n_dst))
    expect = _cimg_shrink_1d(row.astype(np.float64), n_dst)
    np.testing.assert_allclose(got[0], expect, atol=1e-5)


def _cimg_enlarge_1d(src, n_dst):
    """Oracle for CImg case-3 linear enlarge along one axis."""
    n_src = len(src)
    fx = n_src / n_dst
    out = np.zeros(n_dst)
    curr = 0.0
    ptr = 0
    for x in range(n_dst):
        alpha = curr - int(curr)
        v1 = src[ptr]
        v2 = src[ptr + 1] if ptr < n_src - 1 else v1
        out[x] = (1 - alpha) * v1 + alpha * v2
        old = curr
        curr = min(n_src - 1.0, curr + fx)
        ptr += int(curr) - int(old)
    return out


@pytest.mark.parametrize("n_src,n_dst", [(4, 8), (4, 9), (3, 7), (5, 10)])
def test_resize_enlarge_matches_cimg_oracle(rng, n_src, n_dst):
    row = rng.normal(size=n_src).astype(np.float32)
    img = np.tile(row, (3, 1))
    got = np.asarray(resize.cimg_resize(img, 3, n_dst))
    expect = _cimg_enlarge_1d(row.astype(np.float64), n_dst)
    np.testing.assert_allclose(got[0], expect, atol=1e-5)


def test_vlfeat_downsample():
    img = np.arange(5 * 7, dtype=np.float32).reshape(5, 7)
    out = np.asarray(resize.vlfeat_downsample(img, 1))
    np.testing.assert_array_equal(out, img[::2, :6:2])


# ------------------------------------------------------------------ distance
def test_two_nearest_l1_matches_numpy(rng):
    a = rng.normal(size=(20, 16)).astype(np.float32)  # reference set
    b = rng.normal(size=(15, 16)).astype(np.float32)  # queries
    d = np.abs(b[:, None, :] - a[None, :, :]).sum(-1)
    order = np.argsort(d, axis=1)
    d1, d2, i1 = distance.two_nearest(
        b, a, np.ones(15, bool), np.ones(20, bool), "l1")
    np.testing.assert_allclose(np.asarray(d1), d[np.arange(15), order[:, 0]], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), d[np.arange(15), order[:, 1]], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), order[:, 0])


def test_two_nearest_respects_masks(rng):
    a = rng.normal(size=(10, 8)).astype(np.float32)
    b = a[:4] + 0.001  # near-duplicates of first four refs
    ref_valid = np.zeros(10, bool)
    ref_valid[5:] = True  # the near-duplicates are all invalid
    d1, d2, i1 = distance.two_nearest(b, a, np.ones(4, bool), ref_valid, "l1")
    assert np.all(np.asarray(i1) >= 5)


def test_ratio_match_threshold(rng):
    ref = np.eye(4, dtype=np.float32) * 10
    qry = np.array([[10, 0.01, 0, 0]], dtype=np.float32)  # clearly ref[0]
    ok, idx = distance.ratio_match(qry, ref, np.ones(1, bool), np.ones(4, bool), 0.5, "l1")
    assert bool(ok[0]) and int(idx[0]) == 0


# -------------------------------------------------------------------- solve
def test_solve_warp_exact_on_minimal_sample(rng):
    true_c = np.array([1.02, 0.03, 1e-4, 40.0, -0.01, 0.98, -2e-4, -17.0],
                      dtype=np.float64)
    src = rng.uniform(0, 500, size=(4, 2))
    x, y = src[:, 0], src[:, 1]
    dst = np.stack([
        true_c[0] * x + true_c[1] * y + true_c[2] * x * y + true_c[3],
        true_c[4] * x + true_c[5] * y + true_c[6] * x * y + true_c[7],
    ], axis=-1)
    got = np.asarray(solve.solve_warp(src.astype(np.float32), dst.astype(np.float32)))
    # check in reprojection space (coefficients can trade off numerically)
    gx, gy = warp.warp_xy(got, x.astype(np.float32), y.astype(np.float32))
    np.testing.assert_allclose(np.asarray(gx), dst[:, 0], atol=0.05)
    np.testing.assert_allclose(np.asarray(gy), dst[:, 1], atol=0.05)


def test_solve_warp_least_squares_matches_numpy(rng):
    n = 60
    src = rng.uniform(0, 800, size=(n, 2))
    true_c = np.array([0.95, 0.05, 5e-5, 30.0, 0.02, 1.01, -5e-5, 12.0])
    x, y = src[:, 0], src[:, 1]
    dst = np.stack([
        true_c[0] * x + true_c[1] * y + true_c[2] * x * y + true_c[3],
        true_c[4] * x + true_c[5] * y + true_c[6] * x * y + true_c[7],
    ], axis=-1) + rng.normal(scale=0.5, size=(n, 2))
    w = np.ones(n, np.float32)
    w[: n // 4] = 0.0  # mask a quarter out
    a_mat = np.stack([x, y, x * y, np.ones(n)], axis=-1)
    expect_x, *_ = np.linalg.lstsq(a_mat[n // 4:], dst[n // 4:, 0], rcond=None)
    expect_y, *_ = np.linalg.lstsq(a_mat[n // 4:], dst[n // 4:, 1], rcond=None)
    got = np.asarray(solve.solve_warp(src.astype(np.float32), dst.astype(np.float32), w))
    # compare reprojection at probe points
    probe = rng.uniform(0, 800, size=(10, 2)).astype(np.float32)
    gx, gy = warp.warp_xy(got, probe[:, 0], probe[:, 1])
    ex = expect_x[0] * probe[:, 0] + expect_x[1] * probe[:, 1] \
        + expect_x[2] * probe[:, 0] * probe[:, 1] + expect_x[3]
    ey = expect_y[0] * probe[:, 0] + expect_y[1] * probe[:, 1] \
        + expect_y[2] * probe[:, 0] * probe[:, 1] + expect_y[3]
    np.testing.assert_allclose(np.asarray(gx), ex, atol=0.1)
    np.testing.assert_allclose(np.asarray(gy), ey, atol=0.1)


def test_banded_projection_matches_gather_oracle(rng):
    """The banded fast path (MXU column select + static row bands) must
    match the direct gather form within one u8 step (interpolation
    rounding-order only), both orientations."""
    import jax.numpy as jnp

    from computervisionimagestich2_tpu.ops.warp import (
        _cylindrical_project_gather, cylindrical_project)

    for h, w in [(140, 100), (100, 140)]:
        src = (rng.uniform(0, 255, (h, w, 3))).astype(np.float32)
        fast = np.asarray(cylindrical_project(jnp.asarray(src), 15.0))
        ref = np.asarray(_cylindrical_project_gather(jnp.asarray(src), 15.0))
        diff = np.abs(fast - ref)
        assert diff.max() <= 1.0
        assert (diff > 0).mean() < 1e-3


def test_banded_warp_matches_gather(rng):
    """warp_image_banded must be bit-identical to warp_image whenever the
    host planner accepts the warp."""
    import jax.numpy as jnp

    from computervisionimagestich2_tpu.ops.warp import (
        banded_warp_params, warp_image, warp_image_banded)

    src = jnp.asarray(rng.uniform(0, 255, (150, 220, 3)).astype(np.float32))
    for c in [
        np.array([1.002, 0.012, 1e-6, -70.0, 0.01, 0.998, -1e-6, 8.0],
                 np.float32),
        np.array([0.96, -0.03, 2e-6, 30.0, 0.02, 1.04, 1e-6, -15.0],
                 np.float32),
    ]:
        ox, oy = -40.0, -10.0
        out_shape = (200, 300)
        bands = banded_warp_params(c, out_shape, ox, oy, src.shape[:2])
        assert bands is not None
        ref = np.asarray(warp_image(src, jnp.asarray(c), jnp.float32(ox),
                                    jnp.float32(oy), out_shape=out_shape))
        got = np.asarray(warp_image_banded(src, jnp.asarray(c),
                                           jnp.float32(ox), jnp.float32(oy),
                                           out_shape, *bands))
        np.testing.assert_array_equal(ref, got)


def test_banded_warp_projective_exact_bound(rng):
    """Projective banded warp: the planner dense-evaluates every pixel, so
    whenever it accepts a band the banded output matches the gather path —
    including strong-perspective warps whose deviation extrema fall between
    coarse sample points."""
    import jax.numpy as jnp

    from computervisionimagestich2_tpu.ops.warp import (
        banded_warp_params, warp_image, warp_image_banded)

    src = jnp.asarray(rng.uniform(0, 255, (150, 220, 3)).astype(np.float32))
    out_shape = (200, 300)
    ox, oy = -40.0, -10.0
    for c in [
        np.array([1.01, 0.02, -20.0, 0.015, 0.99, 5.0,
                  1e-4, 5e-5, 1.0], np.float32),     # strong perspective
        np.array([0.98, -0.01, 10.0, -0.02, 1.02, -8.0,
                  2e-5, -1e-5, 1.0], np.float32),
    ]:
        bands = banded_warp_params(c, out_shape, ox, oy, src.shape[:2],
                                   model="projective")
        if bands is None:
            continue  # rejection is always safe — the gather path runs
        ref = np.asarray(warp_image(src, jnp.asarray(c), jnp.float32(ox),
                                    jnp.float32(oy), out_shape=out_shape,
                                    model="projective"))
        got = np.asarray(warp_image_banded(src, jnp.asarray(c),
                                           jnp.float32(ox), jnp.float32(oy),
                                           out_shape, *bands,
                                           model="projective"))
        np.testing.assert_array_equal(ref, got)


def test_banded_warp_planner_rejects_wild_warps():
    from computervisionimagestich2_tpu.ops.warp import banded_warp_params

    spin = np.array([0.0, -1.0, 0.0, 200.0, 1.0, 0.0, 0.0, 0.0], np.float32)
    assert banded_warp_params(spin, (256, 256), 0.0, 0.0, (200, 200)) is None
    proj = np.ones(9, np.float32)
    assert banded_warp_params(proj, (256, 256), 0.0, 0.0, (200, 200),
                              model="projective") is None


@pytest.mark.parametrize("h,w", [(16, 24), (17, 25), (30, 19)])
def test_blur_shrink_matches_blur_then_resize(rng, h, w):
    """The fused downsweep stencil (ops.resize.blur_shrink_hwc) must equal
    gaussian_blur -> cimg_resize (it is the same linear map with the
    per-output coefficients precombined; only float reassociation
    differs)."""
    import jax.numpy as jnp

    img = rng.normal(size=(h, w, 3)).astype(np.float32) * 50 + 100
    hp, wp = max(h // 2, 1), max(w // 2, 1)
    sigma = 2.0
    # unfused oracle: blur W then H (gaussian_blur order on [H, W, C] via
    # the axis-direct form used by the blender), then CImg resize
    from computervisionimagestich2_tpu.models.blender import _blur_hwc
    expect = np.asarray(resize.cimg_resize(
        _blur_hwc(jnp.asarray(img), sigma), hp, wp))
    got = np.asarray(resize.blur_shrink_hwc(jnp.asarray(img), hp, wp, sigma))
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, atol=2e-3)


def test_blur_shrink_2d_no_channels(rng):
    import jax.numpy as jnp

    from computervisionimagestich2_tpu.models.blender import _blur_hwc

    img = rng.normal(size=(22, 18)).astype(np.float32)
    expect = np.asarray(resize.cimg_resize(
        _blur_hwc(jnp.asarray(img), 2.0), 11, 9))
    got = np.asarray(resize.blur_shrink_hwc(jnp.asarray(img), 11, 9, 2.0))
    np.testing.assert_allclose(got, expect, atol=2e-3)
