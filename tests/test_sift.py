"""Validate the vectorized SIFT kernels against the scalar NumPy oracle
(tests/sift_oracle.py, a transcription of vl/sift.c semantics)."""
import numpy as np
import pytest

import sift_oracle as oracle
from computervisionimagestich2_tpu.config import SiftConfig
from computervisionimagestich2_tpu.models.sift import sift_extract




def make_image(seed=42, shape=(48, 64)):
    r = np.random.default_rng(seed)
    img = r.uniform(0, 255, size=shape)
    # cheap separable box smoothing to create blobs
    for _ in range(3):
        img = (np.roll(img, 1, 0) + img + np.roll(img, -1, 0)) / 3
        img = (np.roll(img, 1, 1) + img + np.roll(img, -1, 1)) / 3
    return np.trunc(img).astype(np.float32)


@pytest.mark.parametrize("seed", [42, 7])
def test_sift_matches_oracle(seed):
    img = make_image(seed)
    ocfg = oracle.Cfg(n_octaves=2, n_levels=2)
    expected = oracle.extract(img.astype(np.float64), ocfg)
    assert len(expected) > 5, "oracle should find keypoints"

    cfg = SiftConfig(n_octaves=2, max_keypoints_per_octave=512,
                     max_keypoints=1024)
    feats = sift_extract(img, cfg)
    got_valid = np.asarray(feats.valid)
    got_xy = np.asarray(feats.xy)[got_valid]
    got_desc = np.asarray(feats.desc)[got_valid]
    got_sigma = np.asarray(feats.scale)[got_valid]

    exp_xy = np.array([(e[0], e[1]) for e in expected])
    exp_sigma = np.array([e[2] for e in expected])
    exp_desc = np.stack([e[4] for e in expected])

    # counts agree within float32-vs-float64 threshold jitter
    assert abs(len(exp_xy) - len(got_xy)) <= max(2, 0.05 * len(exp_xy)), \
        (len(exp_xy), len(got_xy))

    # match each oracle keypoint to its nearest extracted keypoint
    d = np.linalg.norm(exp_xy[:, None, :] - got_xy[None, :, :], axis=-1)
    nearest = d.argmin(axis=1)
    near_d = d[np.arange(len(exp_xy)), nearest]
    matched = near_d < 0.1
    assert matched.mean() > 0.9, f"only {matched.mean():.2f} matched"

    # sigma parity on the matched set
    np.testing.assert_allclose(got_sigma[nearest[matched]],
                               exp_sigma[matched], rtol=1e-3)
    # descriptor parity: a keypoint can emit several angles at the same xy,
    # so pair each oracle descriptor with the best cosine among co-located
    # extracted descriptors.
    cos_all = exp_desc @ got_desc.T                     # [E, G]
    colocated = d < 0.1
    cos_best = np.where(colocated, cos_all, -1.0).max(axis=1)[matched]
    assert cos_best.min() > 0.999, cos_best.min()


def test_sift_order_matches_scan_order():
    """Keypoint-angle output order should follow the reference's
    octave -> (s, y, x) scan -> angle nesting (needed only for debugging
    comparisons; not a contract)."""
    img = make_image(3)
    cfg = SiftConfig(n_octaves=1, max_keypoints_per_octave=512,
                     max_keypoints=512)
    feats = sift_extract(img, cfg)
    valid = np.asarray(feats.valid)
    xy = np.asarray(feats.xy)[valid]
    assert len(xy) > 0


def test_sift_empty_image():
    img = np.zeros((32, 32), np.float32)
    cfg = SiftConfig(n_octaves=2, max_keypoints_per_octave=128,
                     max_keypoints=256)
    feats = sift_extract(img, cfg)
    assert int(np.asarray(feats.count())) == 0
