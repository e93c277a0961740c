"""Tunnel transfer microbenchmarks (upload/readback rates, chunking).

The axon tunnel's upload (~45 MB/s) and readback (~17-30 MB/s) rates bound
the 1080p e2e number far more than device compute does. This measures:
  - single-buffer readback rate vs N-stripe async readback (does the
    tunnel pipeline concurrent fetches?),
  - upload rate for one buffer vs per-image buffers.

Run alone (single-client TPU tunnel).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    mb = 1024 * 1024
    size = 12 * mb  # ~final-canvas scale
    host = np.random.default_rng(0).integers(0, 255, size, dtype=np.uint8)

    # upload rate
    for reps in range(2):
        t0 = time.perf_counter()
        dev = jax.device_put(host)
        dev.block_until_ready()
        up = time.perf_counter() - t0
    print(f"upload {size/mb:.0f} MB: {up*1e3:.0f} ms "
          f"({size/mb/up:.1f} MB/s)")

    # perturb on device so the runtime can't dedupe
    dev = (dev.astype(jnp.int32) + 1).astype(jnp.uint8)
    dev.block_until_ready()

    # single readback
    for reps in range(2):
        t0 = time.perf_counter()
        _ = np.asarray(dev)
        single = time.perf_counter() - t0
    print(f"readback single {size/mb:.0f} MB: {single*1e3:.0f} ms "
          f"({size/mb/single:.1f} MB/s)")

    results = {"upload_mb_s": round(size / mb / up, 1),
               "readback_single_mb_s": round(size / mb / single, 1)}

    # N-stripe async readback
    for n in (2, 4, 8):
        stripes = [dev[i * size // n:(i + 1) * size // n] for i in range(n)]
        for s in stripes:
            s.block_until_ready()
        t0 = time.perf_counter()
        for s in stripes:
            s.copy_to_host_async()
        outs = [np.asarray(s) for s in stripes]
        t = time.perf_counter() - t0
        print(f"readback {n}-stripe async: {t*1e3:.0f} ms "
              f"({size/mb/t:.1f} MB/s)")
        results[f"readback_{n}stripe_mb_s"] = round(size / mb / t, 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
