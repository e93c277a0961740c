"""Multi-device tests on the virtual 8-device CPU mesh (conftest)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from computervisionimagestich2_tpu.config import (
    DEFAULT_CONFIG, MatchConfig, RansacConfig, SiftConfig)
from computervisionimagestich2_tpu.parallel import (
    batched_pairwise_register, make_mesh, sharded_gaussian_blur, shard_batch)
from computervisionimagestich2_tpu.ops.gaussian import gaussian_blur


TINY = dataclasses.replace(
    DEFAULT_CONFIG,
    sift=SiftConfig(n_octaves=1, max_keypoints_per_octave=128,
                    max_keypoints=256),
    match=MatchConfig(max_matches=128),
    ransac=RansacConfig(n_hypotheses=32),
)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_blur_matches_single_device(rng):
    mesh = make_mesh(8, sp=8)
    img = rng.normal(size=(128, 64)).astype(np.float32)
    got = np.asarray(sharded_gaussian_blur(jnp.asarray(img), 2.0, mesh, "sp"))
    expect = np.asarray(gaussian_blur(jnp.asarray(img), 2.0))
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_sharded_blend_matches_single_device(rng):
    """The row-sharded halo-exchange blend must reproduce the single-device
    pyramid blend (SURVEY.md §5 'shard the canvas compositing') — overlap
    seam, Laplacian levels, clamps and all."""
    from computervisionimagestich2_tpu.models.blender import blend_two_images
    from computervisionimagestich2_tpu.parallel.blend import (
        plan_shard_levels, sharded_blend_two_images)

    mesh = make_mesh(8, sp=8)
    h, w = 256, 192
    # panorama-shaped canvases: a fills the left 2/3, b the right 2/3, with
    # zero borders (the mask derives from mid-row zero/nonzero structure)
    a = np.zeros((h, w, 3), np.float32)
    b = np.zeros((h, w, 3), np.float32)
    a[8:-8, : 2 * w // 3] = rng.uniform(10, 250, (h - 16, 2 * w // 3, 3))
    b[4:-12, w // 3:] = rng.uniform(10, 250, (h - 16, w - w // 3, 3))

    assert plan_shard_levels(h, 8, 8, 2.0) >= 2  # >=2 levels truly sharded
    got = np.asarray(sharded_blend_two_images(
        jnp.asarray(a), jnp.asarray(b), mesh, "sp"))
    expect = np.asarray(blend_two_images(jnp.asarray(a), jnp.asarray(b)))
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, atol=2e-3)


def test_sharded_composite_and_blend_matches_single_device(rng):
    """The full sharded stitch edge — halo-free warp/offset stripes +
    halo-exchange blend — must reproduce compose.composite +
    blend_two_images (the warp/shift stripes must be bit-identical; the
    blend to f32 round-off)."""
    from computervisionimagestich2_tpu.models.blender import blend_two_images
    from computervisionimagestich2_tpu.models import compose
    from computervisionimagestich2_tpu.parallel.blend import (
        sharded_composite, sharded_composite_and_blend)

    mesh = make_mesh(8, sp=8)
    h, w = 96, 128
    src = rng.uniform(10, 250, (h, w, 3)).astype(np.float32)
    prev = rng.uniform(10, 250, (h, w - 20, 3)).astype(np.float32)
    # near-translation bilinear warp (a realistic stitch edge), canvas
    # grows right/down; offsets negative like a leftward stitch
    coeffs = jnp.asarray([1.01, 0.02, 1e-5, -0.01, 0.99, 2e-5, 1e-6,
                          3.0], jnp.float32)
    min_x, min_y = -12.7, -8.3
    canvas_hw = (128, 160)

    a_s, b_s = sharded_composite(jnp.asarray(src), jnp.asarray(prev),
                                 coeffs, min_x, min_y, canvas_hw, mesh)
    a_e, b_e = compose.composite(jnp.asarray(src), jnp.asarray(prev),
                                 coeffs, min_x, min_y, canvas_hw)
    np.testing.assert_array_equal(np.asarray(a_s), np.asarray(a_e))
    np.testing.assert_array_equal(np.asarray(b_s), np.asarray(b_e))

    got = np.asarray(sharded_composite_and_blend(
        jnp.asarray(src), jnp.asarray(prev), coeffs, min_x, min_y,
        canvas_hw, mesh))
    expect = np.asarray(blend_two_images(a_e, b_e))
    np.testing.assert_allclose(got, expect, atol=2e-3)


def test_sharded_blend_bf16_matches_single_device_bf16(rng):
    """dtype='bf16' must behave the same sharded as on one device (the
    config knob can't silently mean f32 on the multi-chip path)."""
    from computervisionimagestich2_tpu.models.blender import blend_two_images
    from computervisionimagestich2_tpu.parallel.blend import (
        sharded_blend_two_images)

    mesh = make_mesh(8, sp=8)
    h, w = 128, 96
    a = np.zeros((h, w, 3), np.float32)
    b = np.zeros((h, w, 3), np.float32)
    a[8:-8, : 2 * w // 3] = rng.uniform(10, 250, (h - 16, 2 * w // 3, 3))
    b[8:-8, w // 3:] = rng.uniform(10, 250, (h - 16, w - w // 3, 3))
    got = np.asarray(sharded_blend_two_images(
        jnp.asarray(a), jnp.asarray(b), mesh, "sp", dtype="bf16"))
    single = np.asarray(blend_two_images(jnp.asarray(a), jnp.asarray(b),
                                         dtype="bf16"))
    # bf16 rounding differs slightly between the halo and padded formulations
    assert np.abs(got - single).max() < 4.0
    f32 = np.asarray(blend_two_images(jnp.asarray(a), jnp.asarray(b)))
    assert np.abs(got - f32).max() < 8.0  # still a faithful blend


def test_sharded_programs_are_cached_across_calls(rng):
    """Per-edge calls with the same geometry must reuse the compiled SPMD
    programs (the jit cache is keyed on the wrapper object, so a fresh
    jit(shard_map) per call would retrace every edge)."""
    from computervisionimagestich2_tpu.parallel import blend as pblend

    mesh = make_mesh(8, sp=8)
    h, w = 64, 96
    src = jnp.asarray(rng.uniform(10, 250, (h, w, 3)), jnp.float32)
    prev = jnp.asarray(rng.uniform(10, 250, (h, w - 16, 3)), jnp.float32)
    coeffs = jnp.asarray([1.0, 0.01, 1e-5, -0.005, 1.0, 2e-5, 0.0, 2.0],
                         jnp.float32)

    pblend._composite_program.cache_clear()
    pblend._blend_program.cache_clear()
    for min_x in (-3.5, -7.25):  # distinct per-edge offsets, same geometry
        pblend.sharded_composite_and_blend(
            src, prev, coeffs, min_x, -2.0, (h, w), mesh)
    assert pblend._composite_program.cache_info().misses == 1
    assert pblend._composite_program.cache_info().hits == 1
    assert pblend._blend_program.cache_info().misses == 1
    assert pblend._blend_program.cache_info().hits == 1


def test_sharded_blend_rejects_unshardable_height():
    from computervisionimagestich2_tpu.parallel.blend import (
        sharded_blend_two_images)

    mesh = make_mesh(8, sp=8)
    a = jnp.zeros((100, 64, 3), jnp.float32)  # 100 % 16 != 0
    with pytest.raises(ValueError):
        sharded_blend_two_images(a, a, mesh, "sp")


def test_batched_register_sharded(rng):
    """Sharded execution must agree with single-device execution — the
    invariant that matters for dp sharding (absolute registration quality is
    covered by test_match_ransac / test_integration)."""
    mesh = make_mesh(4, sp=1)
    b = mesh.shape["data"]
    # a registration-FRIENDLY scene (blobs -> strong distinctive keypoints):
    # blurred noise alone yields ~6 borderline inliers and an unstable fit,
    # where shard-vs-unshard comparison measures RANSAC noise, not sharding
    base = rng.uniform(60, 200, (48, 64)).astype(np.float32)
    for _ in range(2):
        base = (np.roll(base, 1, 0) + base + np.roll(base, -1, 0)) / 3
        base = (np.roll(base, 1, 1) + base + np.roll(base, -1, 1)) / 3
    ys_g, xs_g = np.mgrid[0:48, 0:64]
    for _ in range(18):
        cy, cx = rng.uniform(6, 42), rng.uniform(6, 58)
        r = rng.uniform(2, 5)
        m = ((ys_g - cy) ** 2 + (xs_g - cx) ** 2) < r * r
        base[m] = rng.uniform(0, 255)
    gray_a = jnp.asarray(np.stack([base] * b))
    gray_b = jnp.asarray(np.stack([np.roll(base, 5, axis=1)] * b))

    ref_coeffs, ref_inliers = batched_pairwise_register(gray_a, gray_b, TINY)
    a, bb = shard_batch(mesh, gray_a, gray_b)
    coeffs, inliers = batched_pairwise_register(a, bb, TINY)

    # GSPMD may partition reductions differently, flipping distance ties and
    # hence the exact match set / refit — compare the fitted warps where it
    # matters: reprojection agreement over the image (cf. test_projective),
    # plus agreement of BOTH with the known ground truth (x -> x - 5).
    from computervisionimagestich2_tpu.ops.warp import warp_points

    px, py = np.meshgrid(np.linspace(4, 60, 8), np.linspace(4, 44, 8))
    px = jnp.asarray(px.ravel().astype(np.float32))
    py = jnp.asarray(py.ravel().astype(np.float32))
    for k in range(b):
        xr, yr = warp_points(ref_coeffs[k], px, py)
        xs, ys = warp_points(coeffs[k], px, py)
        dev = np.hypot(np.asarray(xr - xs), np.asarray(yr - ys)).max()
        assert dev < 2.0, dev
        gt = np.hypot(np.asarray(xr) - (np.asarray(px) - 5),
                      np.asarray(yr) - np.asarray(py)).max()
        assert gt < 2.0, gt
    assert np.abs(np.asarray(inliers) - np.asarray(ref_inliers)).max() <= \
        0.1 * np.asarray(ref_inliers).max() + 2


def test_dryrun_multichip_entrypoint():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    mod.dryrun_multichip(8)
