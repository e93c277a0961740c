"""Pallas 2-NN kernel vs the XLA reference path (interpret mode on CPU)."""
import jax
import numpy as np
import pytest

from computervisionimagestich2_tpu.ops import distance
from computervisionimagestich2_tpu.ops.pallas_distance import two_nearest_l1_pallas

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
