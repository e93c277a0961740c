"""Dataset chain benchmarks (the reference's own performance table,
16340028.md:728-732): dataset3 (11 x 600x800) and dataset2 (18 x 600x800),
ex6 chain ordering, warm in-process best-of-3.

Run alone — single-client TPU tunnel.
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_MS = {"dataset3": 27600.0, "dataset2": 47600.0}
COUNTS = {"dataset3": 11, "dataset2": 18}


def main():
    import argparse

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--datasets", nargs="*",
                    default=["dataset3", "dataset2", "dataset3:graph"])
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    import dataclasses

    from computervisionimagestich2_tpu.cli import build_config, make_parser
    from computervisionimagestich2_tpu.models.stitcher import Stitcher
    from computervisionimagestich2_tpu.utils.io import load_image

    for spec in args.datasets:
        name, _, ordering = spec.partition(":")
        ordering = ordering or "chain"
        # graph ordering on an 11+-image set exercises the all-pairs
        # discovery triangle (55 directed-pair counts in ONE Pallas
        # dispatch, ops/pallas_distance.pair_match_counts_pallas)
        cli_cfg = build_config(make_parser().parse_args(
            ["--input", ".", "--ordering", ordering]))
        n = COUNTS[name]
        images = [load_image(f"/root/reference/src/ex6/{name}/{i}.bmp")
                  for i in range(1, n + 1)]
        st = Stitcher(cli_cfg)
        out = st.stitch(images)       # cold (persistent cache softens it)
        times = []
        for _ in range(args.runs):
            gc.collect()
            time.sleep(0.5)
            t0 = time.perf_counter()
            out = st.stitch(images)
            times.append((time.perf_counter() - t0) * 1e3)
        best = min(times)
        print(json.dumps({
            "metric": f"{name}_{ordering}_e2e_ms", "value": round(best, 1),
            "unit": "ms", "vs_baseline": round(REF_MS[name] / best, 1),
            "runs": [round(t) for t in times],
            "canvas": list(out.shape[:2]),
            "stage_s": {k: round(v, 3)
                        for k, v in st.stage_times.items()}}), flush=True)


if __name__ == "__main__":
    main()
