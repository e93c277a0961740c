"""Tests for the auxiliary subsystems: artifacts (checkpoint/resume),
observability, config."""
import numpy as np

from computervisionimagestich2_tpu.config import DEFAULT_CONFIG, RansacConfig
from computervisionimagestich2_tpu.core.types import Features
from computervisionimagestich2_tpu.utils import artifacts, obs
import pytest


def test_features_roundtrip(tmp_path, rng):
    feats = [
        Features(desc=rng.normal(size=(16, 128)).astype(np.float32),
                 xy=rng.normal(size=(16, 2)).astype(np.float32),
                 scale=rng.normal(size=16).astype(np.float32),
                 valid=rng.integers(0, 2, 16).astype(bool))
        for _ in range(3)
    ]
    p = str(tmp_path / "f.npz")
    artifacts.save_features(p, feats)
    back = artifacts.load_features(p)
    assert len(back) == 3
    for a, b in zip(feats, back):
        np.testing.assert_array_equal(np.asarray(a.desc), b.desc)
        np.testing.assert_array_equal(np.asarray(a.valid), b.valid)


def test_stage_roundtrip(tmp_path, rng):
    d = str(tmp_path)
    img = rng.integers(0, 255, (8, 8, 3))
    artifacts.save_stage(d, "canvas", canvas=img)
    back = artifacts.load_stage(d, "canvas")
    np.testing.assert_array_equal(back["canvas"], img)
    artifacts.save_manifest(d, n_images=4, ordering="graph")
    m = artifacts.load_manifest(d)
    assert m["n_images"] == 4


@pytest.mark.slow
def test_stitcher_artifact_dump(tmp_path, rng):
    import dataclasses
    from computervisionimagestich2_tpu.config import MatchConfig, SiftConfig
    from computervisionimagestich2_tpu.models.stitcher import Stitcher
    from test_integration import SMALL, make_scene

    scene = make_scene(rng)
    cfg = dataclasses.replace(SMALL, ordering="chain")
    st = Stitcher(cfg, artifact_dir=str(tmp_path / "run"))
    st.stitch([scene[:, :140], scene[:, 60:]])
    feats = artifacts.load_features(str(tmp_path / "run" / "features.npz"))
    assert len(feats) == 2
    canvas = artifacts.load_stage(str(tmp_path / "run"), "canvas")["canvas"]
    assert canvas.shape[1] > 150
    manifest = artifacts.load_manifest(str(tmp_path / "run"))
    assert manifest["canvas_hw"] == list(canvas.shape[:2])


def test_stage_timer_and_log(capsys):
    obs.set_verbose(True)
    t = obs.StageTimer()
    with t.stage("x"):
        pass
    obs.set_verbose(False)
    assert "x" in t.times
    err = capsys.readouterr().err
    assert "[panorama-tpu] x" in err


def test_reference_iterations_formula():
    # ceil(log(1-0.99)/log(1-0.5^4)) = 72 (ImageProcess.cpp:398)
    assert RansacConfig().reference_iterations == 72
