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


def test_select_strongest_keeps_top_by_strength():
    import jax.numpy as jnp

    from computervisionimagestich2_tpu.ops.compaction import (
        compact_indices, select_strongest)

    rng = np.random.default_rng(7)
    n, cap = 500, 64
    valid = rng.random(n) < 0.7
    strength = np.where(valid, rng.random(n).astype(np.float32) + 0.01, 0.0)
    idx, ov = select_strongest(jnp.asarray(valid), jnp.asarray(strength), cap)
    idx, ov = np.asarray(idx), np.asarray(ov)
    assert ov.sum() == cap and ov.all()
    # exactly the cap strongest valid entries
    expected = set(np.argsort(-strength, kind="stable")[:cap].tolist())
    assert set(idx.tolist()) == expected
    # scan order preserved among the kept
    assert (np.diff(idx) > 0).all()

    # non-binding case: bit-identical to plain compaction
    idx2, ov2 = select_strongest(jnp.asarray(valid), jnp.asarray(strength),
                                 512)
    ref_idx, ref_ov = compact_indices(jnp.asarray(valid), 512)
    np.testing.assert_array_equal(np.asarray(idx2), np.asarray(ref_idx))
    np.testing.assert_array_equal(np.asarray(ov2), np.asarray(ref_ov))

    # binding with fewer valid than cap: prefix-compacted valid tail False
    few_valid = np.zeros(n, bool)
    few_valid[::20] = True
    s = np.where(few_valid, 1.0, 0.0).astype(np.float32)
    idx3, ov3 = select_strongest(jnp.asarray(few_valid), jnp.asarray(s), 64)
    idx3, ov3 = np.asarray(idx3), np.asarray(ov3)
    assert ov3.sum() == few_valid.sum()
    assert ov3[:few_valid.sum()].all() and not ov3[few_valid.sum():].any()
    np.testing.assert_array_equal(idx3[ov3], np.nonzero(few_valid)[0][:64])
