"""Streaming stitcher + gain compensation tests."""
import dataclasses

import numpy as np

from computervisionimagestich2_tpu.models.gain import gain_compensate
from computervisionimagestich2_tpu.models.streaming import StreamingStitcher
from test_integration import SMALL, make_scene


def test_gain_compensate_matches_means(rng):
    h, w = 40, 60
    a = np.zeros((h, w, 3), np.float32)
    b = np.zeros((h, w, 3), np.float32)
    a[:, 20:] = 80.0    # darker incoming image
    b[:, :40] = 160.0   # brighter canvas; overlap x in [20, 40)
    out = np.asarray(gain_compensate(a, b))
    np.testing.assert_allclose(out[:, 20:], 160.0, atol=1.0)
    assert out[:, :20].sum() == 0


def test_gain_compensate_clamped(rng):
    a = np.full((10, 10, 3), 10.0, np.float32)
    b = np.full((10, 10, 3), 250.0, np.float32)
    out = np.asarray(gain_compensate(a, b))
    np.testing.assert_allclose(out, 20.0, atol=0.5)  # gain clamped to 2.0


def test_streaming_three_frames(rng):
    scene = make_scene(rng, h=140, w=320)
    frames = [scene[:, 0:140], scene[:, 60:200], scene[:, 120:260]]
    cfg = dataclasses.replace(SMALL, canvas_bucket=32)
    ss = StreamingStitcher(cfg, project=False)
    sizes = [ss.push(f) for f in frames]
    pano = ss.canvas()
    # canvas grows monotonically and ends wider than any single frame
    assert sizes[0][1] == 140
    assert sizes[-1][1] > 180
    assert pano.dtype == np.uint8
    assert pano.shape[1] == sizes[-1][1]


def test_streaming_rolling_window(rng):
    scene = make_scene(rng, h=140, w=420)
    frames = [scene[:, i * 60: i * 60 + 140] for i in range(5)]
    cfg = dataclasses.replace(SMALL, canvas_bucket=32)
    ss = StreamingStitcher(cfg, project=False, max_width=256)
    for f in frames:
        h, w = ss.push(f)
        assert w <= 256
    assert ss.canvas().shape[1] <= 256
