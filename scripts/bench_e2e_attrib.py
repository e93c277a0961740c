"""Attribute the 1080p e2e wall clock (VERDICT r3 missing #5 / ask #4).

BENCH_r03 recorded 2037 ms min e2e for the 4-image 1440x1080 panorama vs
1451 ms in round 2f, with ~109 ms of device-side compute — leaving >1.3 s
unattributed. This script splits one warm run into:

  - per-stage walls from Stitcher.stage_times (features / ordering /
    stitching / enhance);
  - measured upload cost (device_put of the four u8 frames, blocked);
  - measured readback cost (np.asarray of a canvas-sized u8 buffer);
  - the RPC floor (trivial dispatch+readback), i.e. the per-sync tax;
  - host-only time = wall - sum(stages).

Run alone (single-client TPU tunnel):
    python scripts/bench_e2e_attrib.py
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from computervisionimagestich2_tpu.config import DEFAULT_CONFIG
    from computervisionimagestich2_tpu.models.stitcher import Stitcher
    from computervisionimagestich2_tpu.utils.io import load_image
    from scripts.bench_1080p import upscale

    cfg = DEFAULT_CONFIG
    images = [upscale(load_image(f"/root/reference/Input/{i}.bmp"),
                      1440, 1080) for i in range(1, 5)]

    st = Stitcher(cfg)
    out = st.stitch(images)            # cold (compile)
    runs = []
    for _ in range(4):
        gc.collect()
        time.sleep(0.3)
        t0 = time.perf_counter()
        out = st.stitch(images)
        wall = (time.perf_counter() - t0) * 1e3
        stages = {k: round(v * 1e3, 1) for k, v in st.stage_times.items()}
        stages["wall"] = round(wall, 1)
        stages["host_other"] = round(
            wall - sum(v * 1e3 for v in st.stage_times.values()), 1)
        runs.append(stages)
        print(json.dumps(stages), flush=True)

    # RPC floor
    f = jax.jit(lambda s: s + 1.0)
    float(np.asarray(f(jnp.float32(0.0))))
    t0 = time.perf_counter()
    for _ in range(5):
        float(np.asarray(f(jnp.float32(0.0))))
    floor = (time.perf_counter() - t0) / 5 * 1e3

    # upload: the exact per-image u8 arrays prepare() sends
    ups = []
    for r in range(3):
        t0 = time.perf_counter()
        devs = [jax.device_put(np.ascontiguousarray(im + r)) for im in images]
        jax.block_until_ready(devs)
        ups.append((time.perf_counter() - t0) * 1e3)
    upload_ms = min(ups)

    # readback: canvas-sized u8
    h, w = out.shape[:2]
    buf = jax.block_until_ready(
        jnp.zeros((h, w, 3), jnp.uint8) + jnp.uint8(1))
    rbs = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(buf)
        rbs.append((time.perf_counter() - t0) * 1e3)
    readback_ms = min(rbs)

    mb_up = sum(im.nbytes for im in images) / 1e6
    mb_down = h * w * 3 / 1e6
    print(json.dumps({
        "floor_ms": round(floor, 1),
        "upload_ms": round(upload_ms, 1), "upload_mb": round(mb_up, 1),
        "readback_ms": round(readback_ms, 1),
        "readback_mb": round(mb_down, 1),
        "canvas": [h, w],
        "runs": runs,
    }), flush=True)


if __name__ == "__main__":
    main()
