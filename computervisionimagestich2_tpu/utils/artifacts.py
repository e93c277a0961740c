"""Per-stage artifact dump / resume.

The reference has no checkpointing; its closest analog is the final
result.save() (src/ex6/ImageProcess.cpp:15-16) — SURVEY.md §5
"Checkpoint/resume". Here every pipeline stage (features, match graph, edge
models, canvas) can be dumped as npz and reloaded, which lets a stitch
resume after the feature stage or re-run blending without re-extracting —
cheap, and the building block for the streaming config.
"""
from __future__ import annotations

import json
import os

import numpy as np

from ..core.types import Features


def save_features(path: str, feats: list[Features]) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = {}
    for i, f in enumerate(feats):
        arrays[f"desc_{i}"] = np.asarray(f.desc)
        arrays[f"xy_{i}"] = np.asarray(f.xy)
        arrays[f"scale_{i}"] = np.asarray(f.scale)
        arrays[f"valid_{i}"] = np.asarray(f.valid)
    np.savez_compressed(path, n=len(feats), **arrays)


def load_features(path: str) -> list[Features]:
    z = np.load(path)
    n = int(z["n"])
    return [Features(desc=z[f"desc_{i}"], xy=z[f"xy_{i}"],
                     scale=z[f"scale_{i}"], valid=z[f"valid_{i}"])
            for i in range(n)]


def save_stage(run_dir: str, name: str, **arrays) -> str:
    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, f"{name}.npz")
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in arrays.items()})
    return path


def load_stage(run_dir: str, name: str) -> dict[str, np.ndarray]:
    path = os.path.join(run_dir, f"{name}.npz")
    return dict(np.load(path))


def save_manifest(run_dir: str, **meta) -> None:
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "manifest.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_manifest(run_dir: str) -> dict:
    with open(os.path.join(run_dir, "manifest.json")) as f:
        return json.load(f)
