"""compact_indices must be bit-identical to jnp.nonzero(size=..., fill_value=0)."""
import jax.numpy as jnp
import numpy as np
import pytest

from computervisionimagestich2_tpu.ops.compaction import (
    compact_indices, compact_values)


@pytest.mark.parametrize("n,density,cap", [
    (1000, 0.01, 64),        # under-capacity
    (1000, 0.5, 64),         # over-capacity (truncates in scan order)
    (1000, 0.0, 16),         # empty mask
    (1000, 1.0, 2048),       # full mask, cap > n
    (128, 0.3, 128),         # exactly one lane block
    (127, 0.3, 64),          # non-multiple of 128
    (3 * 500 * 700, 0.002, 4096),  # octave-scale (histogram blk branch)
    (3 * 500 * 700, 0.002, 512),   # octave-scale (searchsorted blk branch)
    (2048 * 128, 0.9, 128),        # nb >> cap, heavy overflow (searchsorted)
    (2048 * 128, 0.9, 32768),      # cap >> nb (histogram)
])
def test_matches_nonzero(n, density, cap):
    rng = np.random.default_rng(n + cap)
    mask = jnp.asarray(rng.random(n) < density)
    idx, valid = compact_indices(mask, cap)
    ref_idx = jnp.nonzero(mask, size=cap, fill_value=0)[0]
    ref_valid = jnp.arange(cap) < jnp.sum(mask.astype(jnp.int32))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref_valid))


def test_multidim_scan_order():
    rng = np.random.default_rng(0)
    mask = jnp.asarray(rng.random((3, 40, 50)) < 0.05)
    idx, valid = compact_indices(mask, 512)
    ref = jnp.nonzero(mask.reshape(-1), size=512, fill_value=0)[0]
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref))


def test_compact_values_gathers_rows():
    rng = np.random.default_rng(1)
    mask = jnp.asarray(rng.random(300) < 0.1)
    vals = jnp.asarray(rng.random((300, 5), dtype=np.float32))
    valid, got = compact_values(mask, 64, vals)
    n = int(mask.sum())
    expect = np.asarray(vals)[np.asarray(mask)]
    np.testing.assert_allclose(np.asarray(got)[:n], expect[:64][:n])
    assert int(np.asarray(valid).sum()) == min(n, 64)
