"""Pallas 2-NN kernel vs the XLA reference path (interpret mode on CPU)."""
import jax
import numpy as np
import pytest

from computervisionimagestich2_tpu.ops import distance
from computervisionimagestich2_tpu.ops.pallas_distance import (
    two_nearest_l1_bidir_pallas, two_nearest_l1_pallas)

INTERPRET = jax.default_backend() != "tpu"


def test_pallas_two_nearest_matches_xla(rng):
    nb, na, f = 256, 512, 128
    qry = rng.normal(size=(nb, f)).astype(np.float32)
    ref = rng.normal(size=(na, f)).astype(np.float32)
    qv = np.ones(nb, bool)
    rv = np.ones(na, bool)
    rv[100:120] = False
    d1p, d2p, i1p = two_nearest_l1_pallas(qry, ref, qv, rv,
                                          tb=128, ta=256, kc=32,
                                          interpret=INTERPRET)
    d1x, d2x, i1x = distance.two_nearest(qry, ref, qv, rv, "l1")
    np.testing.assert_allclose(np.asarray(d1p), np.asarray(d1x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d2p), np.asarray(d2x), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1p), np.asarray(i1x))


def test_pallas_two_nearest_invalid_queries(rng):
    nb, na, f = 128, 256, 64
    qry = rng.normal(size=(nb, f)).astype(np.float32)
    ref = rng.normal(size=(na, f)).astype(np.float32)
    qv = np.zeros(nb, bool)
    qv[:10] = True
    rv = np.ones(na, bool)
    d1, d2, i1 = two_nearest_l1_pallas(qry, ref, qv, rv,
                                       tb=128, ta=128, kc=32,
                                       interpret=INTERPRET)
    assert np.all(np.asarray(d1)[10:] > 1e37)


def test_pallas_two_nearest_live_prefix_counts(rng):
    """Prefix-compacted masks (the sift_extract contract): the kernel skips
    dead query tiles and bounds the reference loop by the live count."""
    nb, na, f = 256, 512, 128
    qry = rng.normal(size=(nb, f)).astype(np.float32)
    ref = rng.normal(size=(na, f)).astype(np.float32)
    qv = np.arange(nb) < 130
    rv = np.arange(na) < 200
    d1p, d2p, i1p = two_nearest_l1_pallas(qry, ref, qv, rv,
                                          tb=128, ta=128, kc=32,
                                          interpret=INTERPRET)
    d1x, d2x, i1x = distance.two_nearest(qry, ref, qv, rv, "l1")
    np.testing.assert_allclose(np.asarray(d1p)[:130], np.asarray(d1x)[:130],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d2p)[:130], np.asarray(d2x)[:130],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1p)[:130],
                                  np.asarray(i1x)[:130])
    assert np.all(np.asarray(d1p)[130:] > 1e37)


def test_pallas_bidir_matches_two_directed_calls(rng):
    """The bidirectional kernel must reproduce BOTH directed calls
    bit-identically (shared distances, same tie-breaks) under live-prefix
    masks — the register_edge / match-graph fast path."""
    nb, na, f = 256, 384, 128
    qry = rng.normal(size=(nb, f)).astype(np.float32)
    ref = rng.normal(size=(na, f)).astype(np.float32)
    qv = np.arange(nb) < 170
    rv = np.arange(na) < 300
    (d1q, d2q, i1q), (d1r, d2r, i1r) = two_nearest_l1_bidir_pallas(
        qry, ref, qv, rv, interpret=INTERPRET)
    d1f, d2f, i1f = two_nearest_l1_pallas(qry, ref, qv, rv,
                                          interpret=INTERPRET)
    d1b, d2b, i1b = two_nearest_l1_pallas(ref, qry, rv, qv,
                                          interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(d1q), np.asarray(d1f))
    np.testing.assert_array_equal(np.asarray(d2q), np.asarray(d2f))
    np.testing.assert_array_equal(np.asarray(i1q)[:170],
                                  np.asarray(i1f)[:170])
    np.testing.assert_array_equal(np.asarray(d1r), np.asarray(d1b))
    np.testing.assert_array_equal(np.asarray(d2r), np.asarray(d2b))
    np.testing.assert_array_equal(np.asarray(i1r)[:300],
                                  np.asarray(i1b)[:300])


def test_xla_bidir_matches_two_directed_calls(rng):
    """The XLA fallback of two_nearest_bidir equals the two directed
    two_nearest calls (both L1 and L2, odd shapes) up to f32
    reduction-order ulps (XLA reassociates the feature reduce differently
    for the two matrix orientations); indices must agree wherever the
    nearest distance is not an ulp-tie."""
    nb, na, f = 90, 70, 32
    qry = rng.normal(size=(nb, f)).astype(np.float32)
    ref = rng.normal(size=(na, f)).astype(np.float32)
    qv = np.arange(nb) < 75
    rv = np.arange(na) < 60
    for metric in ("l1", "l2"):
        fwd, bwd = distance.two_nearest_bidir(qry, ref, qv, rv, metric,
                                              pallas="off")
        ref_f = distance.two_nearest(qry, ref, qv, rv, metric, pallas="off")
        ref_b = distance.two_nearest(ref, qry, rv, qv, metric, pallas="off")
        for got, want in ((fwd, ref_f), (bwd, ref_b)):
            d1g, d2g = np.asarray(got[0]), np.asarray(got[1])
            d1w, d2w = np.asarray(want[0]), np.asarray(want[1])
            np.testing.assert_allclose(d1g, d1w, rtol=1e-5)
            np.testing.assert_allclose(d2g, d2w, rtol=1e-5)
            live = d1w < 1e37
            clear = live & (d2w > d1w * (1 + 1e-4))  # not an ulp-tie
            np.testing.assert_array_equal(np.asarray(got[2])[clear],
                                          np.asarray(want[2])[clear])


def test_pair_match_counts_matches_scan_path(rng):
    """The one-dispatch (pair, query-tile) count kernel must reproduce the
    per-pair ratio_match_bidir counts over the whole i<j triangle."""
    from computervisionimagestich2_tpu.ops.pallas_distance import (
        pair_match_counts_pallas)

    n, cap, f = 4, 256, 128
    desc = rng.random(size=(n, cap, f)).astype(np.float32)
    # clustered descriptors so some ratio tests actually pass
    desc[1, :50] = desc[0, 10:60] + rng.normal(size=(50, f)) * 1e-3
    desc[3, :40] = desc[2, 5:45] + rng.normal(size=(40, f)) * 1e-3
    lives = [200, 130, 256, 77]
    valid = np.stack([np.arange(cap) < nv for nv in lives])
    pairs = np.asarray([(i, j) for i in range(n) for j in range(n)
                        if i < j], np.int32)
    got = np.asarray(pair_match_counts_pallas(
        desc, valid, pairs, 0.5, interpret=INTERPRET))
    for p, (i, j) in enumerate(pairs):
        okq, _, okr, _ = distance.ratio_match_bidir(
            desc[j], desc[i], valid[j], valid[i], 0.5, "l1", pallas="off")
        assert got[p, 0] == np.asarray(okq).sum(), (i, j)
        assert got[p, 1] == np.asarray(okr).sum(), (i, j)
