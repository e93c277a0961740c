"""Benchmark the BASELINE.json configs on the real TPU.

1. pairwise stitch Input/1+2 (registration + composite + blend)
2. full 4-image Input/ panorama (the bench.py headline)
3. batched panoramas: Input/ + Input2/ pairwise registrations as one
   sharded batch
4. high-res (Input2, 1210x907) with multi-band blend + gain compensation
5. streaming panorama: frame-by-frame incremental stitch

Prints one JSON line per config. Run alone — the TPU tunnel is
single-client (see .claude/skills/verify/SKILL.md).
"""
from __future__ import annotations

import dataclasses
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = "/root/reference"


def timed(fn, n=3):
    fn()
    times = []
    for _ in range(n):
        gc.collect()
        t0 = time.perf_counter()
        fn()
        times.append((time.perf_counter() - t0) * 1000)
    return min(times)


def main():
    from computervisionimagestich2_tpu.config import DEFAULT_CONFIG
    from computervisionimagestich2_tpu.models.stitcher import Stitcher
    from computervisionimagestich2_tpu.models.streaming import StreamingStitcher
    from computervisionimagestich2_tpu.utils.io import load_image

    input1 = [load_image(f"{REF}/Input/{i}.bmp") for i in range(1, 5)]
    input2 = [load_image(f"{REF}/Input2/{i}.bmp") for i in range(1, 5)]

    results = {}

    # config 1: pairwise stitch
    st = Stitcher(DEFAULT_CONFIG)
    results["pairwise_input12_ms"] = timed(lambda: st.stitch(input1[:2]))

    # config 2: full 4-image panorama
    st2 = Stitcher(DEFAULT_CONFIG)
    results["panorama4_input_ms"] = timed(lambda: st2.stitch(input1))

    # config 3 AS WRITTEN: "Input/ and Input2/ sets stitched in one vmapped
    # batch" — whole PANORAMAS batched (SIFT -> ordering-free chain plan ->
    # composites -> blends), not just registrations. The sets differ in
    # resolution, so Input/ is zero-padded up to Input2's frame (content
    # registers against content; the batch axis shards over a mesh's data
    # axis on multi-chip — single chip here).
    import jax.numpy as jnp

    from computervisionimagestich2_tpu.parallel.batched import (
        batched_pairwise_register, batched_stitch_chain)

    h2, w2 = np.asarray(input2[0]).shape[:2]

    def padded_batch():
        def pad(im):
            im = np.asarray(im)
            return np.pad(im, ((0, h2 - im.shape[0]),
                               (0, w2 - im.shape[1]), (0, 0)))
        return jnp.asarray(np.stack([
            np.stack([pad(im) for im in input1]),
            np.stack([np.asarray(im) for im in input2])]))

    batch = padded_batch()

    def batched_panoramas():
        canvases, plans = batched_stitch_chain(batch, DEFAULT_CONFIG)
        return float(np.asarray(canvases).sum())  # force readback

    results["batched_panoramas_input_input2_ms"] = timed(batched_panoramas,
                                                         n=2)

    # batched registration alone (the round-2 form, kept for comparison)
    from computervisionimagestich2_tpu.ops.color import to_gray
    from computervisionimagestich2_tpu.ops.warp import cylindrical_project

    def batched_register(images):
        grays = [to_gray(cylindrical_project(
            jnp.asarray(np.asarray(im), jnp.float32),
            DEFAULT_CONFIG.projection.angle_deg)) for im in images]
        a = jnp.stack(grays[:-1])
        b = jnp.stack(grays[1:])
        coeffs, inliers = batched_pairwise_register(a, b)
        return float(np.asarray(coeffs).sum())  # force readback

    results["batched_register_input_ms"] = timed(
        lambda: batched_register(input1))
    results["batched_register_input2_ms"] = timed(
        lambda: batched_register(input2))

    # config 4: high-res with gain compensation
    cfg4 = dataclasses.replace(
        DEFAULT_CONFIG,
        blend=dataclasses.replace(DEFAULT_CONFIG.blend,
                                  gain_compensation=True))
    st4 = Stitcher(cfg4)
    results["panorama4_input2_highres_gain_ms"] = timed(
        lambda: st4.stitch(input2))

    # config 5: streaming (per-frame latency over the 4 Input frames)
    def stream_run():
        ss = StreamingStitcher(DEFAULT_CONFIG)
        for f in input1:
            ss.push(f)
        ss.canvas()

    results["streaming4_total_ms"] = timed(stream_run, n=2)

    for k, v in results.items():
        print(json.dumps({"metric": k, "value": round(v, 1), "unit": "ms"}))


if __name__ == "__main__":
    main()
