"""Pallas per-keypoint kernels vs the XLA reference path (interpret mode).

The keypoint-walk kernels (ops/pallas_sift.py) must reproduce the XLA
formulation bit-closely; on TPU they replace it (SiftConfig.pallas="auto").
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from computervisionimagestich2_tpu.ops import pallas_sift as ps
from computervisionimagestich2_tpu.ops import sift_kernels as sk


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    h, w = 96, 80
    mod = jnp.asarray(rng.random((h, w), dtype=np.float32))
    ang = jnp.asarray((rng.random((h, w)) * 2 * np.pi).astype(np.float32))
    n, nv = 48, 31
    x = jnp.asarray((rng.random(n) * (w - 1) * 1.06 - 2).astype(np.float32))
    y = jnp.asarray((rng.random(n) * (h - 1) * 1.06 - 2).astype(np.float32))
    sig = jnp.asarray((1.2 + rng.random(n) * 2.5).astype(np.float32))
    a0 = jnp.asarray((rng.random(n) * 2 * np.pi).astype(np.float32))
    return h, w, mod, ang, n, nv, x, y, sig, a0


def test_orientation_matches_xla(scene):
    h, w, mod, ang, n, nv, x, y, sig, _ = scene
    r = 17
    grad = jnp.stack([mod, ang], axis=-1)[None]
    gp = jnp.pad(grad, ((0, 0), (r, r), (r, r), (0, 0)))
    valid = jnp.arange(n) < nv
    ang_ref, av_ref = sk.orientation_histograms(
        gp, jnp.zeros(n, jnp.int32), x, y, sig, valid, w, h, r, 36, 4)

    mp = ps.pad_for_patches(mod, r)
    ap = ps.pad_for_patches(ang, r)
    hist, ok = ps.orientation_hist_pallas(
        mp, ap, x, y, sig, jnp.asarray([nv], jnp.int32), w, h, r, 36,
        interpret=True)
    ang_p, av_p = sk.orientation_peaks(hist, ok & valid, 36, 4)
    np.testing.assert_array_equal(np.asarray(av_ref), np.asarray(av_p))
    np.testing.assert_allclose(np.asarray(ang_ref), np.asarray(ang_p),
                               atol=1e-5)


def test_descriptor_matches_xla(scene):
    h, w, mod, ang, n, nv, x, y, sig, a0 = scene
    r = 28
    grad = jnp.stack([mod, ang], axis=-1)[None]
    gp = jnp.pad(grad, ((0, 0), (r, r), (r, r), (0, 0)))
    valid = jnp.arange(n) < nv
    desc_ref, ok_ref = sk.descriptors(
        gp, jnp.zeros(n, jnp.int32), x, y, sig, a0, valid, w, h, r,
        3.0, 2.0, 4, 8)

    mp = ps.pad_for_patches(mod, r)
    ap = ps.pad_for_patches(ang, r)
    desc_p, ok_p = ps.descriptors_pallas(
        mp, ap, x, y, sig, a0, jnp.asarray([nv], jnp.int32), w, h, r,
        3.0, 2.0, 4, 8, interpret=True)
    np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(ok_p))
    np.testing.assert_allclose(np.asarray(desc_ref), np.asarray(desc_p),
                               atol=2e-6)


@pytest.mark.slow
def test_dead_slots_zeroed(scene):
    h, w, mod, ang, n, nv, x, y, sig, a0 = scene
    r = 10
    mp = ps.pad_for_patches(mod, r)
    ap = ps.pad_for_patches(ang, r)
    desc_p, ok_p = ps.descriptors_pallas(
        mp, ap, x, y, sig, a0, jnp.asarray([5], jnp.int32), w, h, r,
        3.0, 2.0, 4, 8, interpret=True)
    assert not np.asarray(ok_p)[5:].any()
    np.testing.assert_array_equal(np.asarray(desc_p)[5:], 0.0)


@pytest.mark.slow  # interpret-mode full pipeline, ~40s on CPU
def test_bucketed_walk_dispatch_matches_xla_pipeline():
    """Full sift_extract through the Pallas walk DISPATCH (wr buckets +
    ori scatter-back, round 4) in interpret mode vs the XLA path: the
    same keypoint set with the same descriptors. Bucket concatenation
    order differs from the XLA path's ordering, so rows are compared as
    sorted sets keyed by (x, y, sigma, first desc bin)."""
    from computervisionimagestich2_tpu.config import SiftConfig
    from computervisionimagestich2_tpu.models.sift import sift_extract

    rng = np.random.default_rng(3)
    img = (rng.random((80, 100)) * 255).astype(np.float32)
    base = dict(n_octaves=2, max_keypoints=1024,
                max_keypoints_per_octave=512)
    f_x = sift_extract(jnp.asarray(img), SiftConfig(pallas="off", **base))
    f_p = sift_extract(jnp.asarray(img),
                       SiftConfig(pallas="interpret", **base))

    def rows(f):
        v = np.asarray(f.valid)
        xy = np.asarray(f.xy)[v]
        sc = np.asarray(f.scale)[v]
        d = np.asarray(f.desc)[v]
        order = np.lexsort((np.round(d[:, 0], 3), sc, xy[:, 1], xy[:, 0]))
        return xy[order], sc[order], d[order]

    xa, sa, da = rows(f_x)
    xb, sb, db = rows(f_p)
    assert xa.shape == xb.shape, (xa.shape, xb.shape)
    np.testing.assert_allclose(xa, xb, atol=1e-4)
    np.testing.assert_allclose(sa, sb, atol=1e-4)
    np.testing.assert_allclose(da, db, atol=5e-5)


@pytest.mark.parametrize("hw", [(64, 96), (61, 130), (33, 40)])
def test_detect_compact_matches_xla(hw):
    """Fused streaming detect (ops/pallas_detect.py) vs
    compact_mask(extrema_mask(...)): identical coords, validity, and
    total count — including non-tile-aligned dims and the scan order."""
    from computervisionimagestich2_tpu.ops.pallas_detect import \
        detect_compact_pallas

    rng = np.random.default_rng(11)
    h, w = hw
    dog = jnp.asarray(rng.normal(size=(4, h, w)).astype(np.float32) * 2)
    tp = 1.0
    cap = 512
    mask = sk.extrema_mask(dog, tp)
    coords_ref, valid_ref = sk.compact_mask(mask, cap)
    n_ref = int(np.asarray(mask.sum()))

    coords_p, valid_p, n_p = detect_compact_pallas(dog, tp, cap,
                                                   interpret=True)
    assert int(np.asarray(n_p)) == n_ref
    np.testing.assert_array_equal(np.asarray(valid_ref),
                                  np.asarray(valid_p))
    np.testing.assert_array_equal(np.asarray(coords_ref),
                                  np.asarray(coords_p))


def test_detect_compact_capacity_truncation():
    """Capacity binding keeps the FIRST cap hits in scan order and
    reports the full count (scan-order truncation semantics of
    compact_mask)."""
    from computervisionimagestich2_tpu.ops.pallas_detect import \
        detect_compact_pallas

    rng = np.random.default_rng(5)
    dog = jnp.asarray(rng.normal(size=(4, 48, 64)).astype(np.float32) * 3)
    tp = 0.5
    mask = sk.extrema_mask(dog, tp)
    n_ref = int(np.asarray(mask.sum()))
    assert n_ref > 8
    cap = 8
    coords_ref, valid_ref = sk.compact_mask(mask, cap)
    coords_p, valid_p, n_p = detect_compact_pallas(dog, tp, cap,
                                                   interpret=True)
    assert int(np.asarray(n_p)) == n_ref
    np.testing.assert_array_equal(np.asarray(coords_ref),
                                  np.asarray(coords_p))
    np.testing.assert_array_equal(np.asarray(valid_ref),
                                  np.asarray(valid_p))
