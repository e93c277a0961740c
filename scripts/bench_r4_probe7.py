"""Round-4 probe #7: SAME-SESSION A/Bs for the two round-4b redesigns.

Cross-session comparisons (floor drifts 26-33 ms through the tunnel)
misled twice this round — this probe answers both questions with one
floor:

  A. SIFT wr-bucketed walks ON vs OFF (OFF = single catch-all bucket per
     level = the round-4a behavior, still with the tightened _rows).
     Same jit cache is avoided by tracing OFF under pallas="on" and ON
     under pallas="auto" (both run Pallas on TPU, distinct static args).
  B. Blend downsweep unfused (blur_impl="fir") vs fused phase-
     decomposition ("fir_fused") at north-star canvas shapes.

Run alone (single-client TPU tunnel):
    python scripts/bench_r4_probe7.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(fn, args, reps=5):
    import jax
    import jax.numpy as jnp

    f = jax.jit(fn)
    float(np.asarray(f(jnp.float32(0.5), *args)))
    ts = []
    for r in range(reps):
        salt = jnp.float32(1.0 + r * 1e-3)
        t0 = time.perf_counter()
        float(np.asarray(f(salt, *args)))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    import dataclasses

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    from computervisionimagestich2_tpu.config import DEFAULT_CONFIG
    from computervisionimagestich2_tpu.models import sift as ms
    from computervisionimagestich2_tpu.ops.color import to_gray
    from computervisionimagestich2_tpu.ops.warp import cylindrical_project
    from computervisionimagestich2_tpu.utils.io import load_image
    from scripts.bench_1080p import upscale

    cfg = DEFAULT_CONFIG
    out = {}
    K = 8

    floor = measure(lambda s, z: s + z, (jnp.float32(1.0),))
    out["floor_ms"] = round(floor, 1)
    print(f"floor {floor:.1f} ms", flush=True)

    img = upscale(load_image("/root/reference/Input/1.bmp"), 1440, 1080)
    gray = to_gray(cylindrical_project(jnp.asarray(img, jnp.float32),
                                       cfg.projection.angle_deg))
    gray = jax.block_until_ready(gray)

    def sift_scanned(scfg):
        def outer(salt, g):
            def step(c, i):
                f, _ = ms.sift_extract_stats(
                    g * salt + i.astype(jnp.float32) * 1e-4, scfg)
                return c + f.desc.sum(), ()
            tot, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(K))
            return tot
        return outer

    # A1: buckets ON (as shipped)
    scfg_on = dataclasses.replace(cfg.sift, pallas="auto")
    wall = measure(sift_scanned(scfg_on), (gray,))
    out["sift_buckets_on"] = round(max(wall - floor, 0.0) / K, 2)
    print(f"sift buckets ON : {out['sift_buckets_on']:.2f} ms", flush=True)

    # A2: buckets OFF — monkeypatch the bucket list to empty for the trace
    # of the pallas="on" variant (distinct static arg -> distinct trace)
    scfg_off = dataclasses.replace(cfg.sift, pallas="on")
    orig = ms._walk_buckets
    ms._walk_buckets = lambda *a, **k: []
    try:
        wall = measure(sift_scanned(scfg_off), (gray,))
    finally:
        ms._walk_buckets = orig
    out["sift_buckets_off"] = round(max(wall - floor, 0.0) / K, 2)
    print(f"sift buckets OFF: {out['sift_buckets_off']:.2f} ms", flush=True)

    # B: blend unfused vs fused at north-star canvas shapes
    from computervisionimagestich2_tpu.models.blender import blend_two_images
    rng = np.random.default_rng(0)
    for hw in ((1488, 2902), (1484, 3010)):
        h, w = hw
        a = jnp.asarray(rng.integers(0, 256, (h, w, 3)).astype(np.float32))
        b = jnp.asarray(rng.integers(0, 256, (h, w, 3)).astype(np.float32))
        for impl in ("fir", "fir_fused"):
            def blend_scanned(salt, a, b, impl=impl, k=4):
                def step(c, i):
                    o = blend_two_images(a * salt + i.astype(jnp.float32),
                                         b, "max", 2.0, impl, None, "auto")
                    return c + o.sum(), ()
                tot, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(k))
                return tot
            wall = measure(blend_scanned, (a, b))
            key = f"blend_{h}x{w}_{impl}"
            out[key] = round(max(wall - floor, 0.0) / 4, 2)
            print(f"{key}: {out[key]:.2f} ms", flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
