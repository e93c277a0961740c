"""North-star metrics for the driver bench (VERDICT r2 next-step #8).

BASELINE.json's headline metric is "4-img 1080p panorama end-to-end ms"
with a <50 ms device-side target; bench.py's primary line measures only
the 384x512 dataset. This module produces the second JSON line:

- ``e2e_ms``: wall-clock 4-image 1080p (1440x1080 inputs) end-to-end
  through the tunnel (min + median of warm runs). The tunnel transfer
  floor (~1.2 s at this size, scripts/bench_tunnel.py) dominates it.
- ``device_stage_sum_ms``: the tunnel-independent device-side cost — each
  pipeline stage re-timed with the amortized lax.scan trick (K iterations
  inside ONE dispatch on perturbed inputs, minus the measured RPC floor),
  then summed per the real per-panorama dispatch counts:
  4 x sift + edge plan + per-edge composites+blends + enhance (chain
  semantics = BASELINE config 2, the ex6 variant behind the reference's
  1.83 s; graph-mode all-pairs discovery is reported separately). This is
  the number the <50 ms target judges.

Importable (bench.py calls ``northstar_line``) and runnable alone.
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _measure(fn, args, reps=3):
    import jax

    f = jax.jit(fn)
    float(np.asarray(f(*args)))          # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(f(*args)))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def _scanned(body, k):
    import jax.numpy as jnp
    from jax import lax

    def outer(x, *rest):
        def step(carry, i):
            return carry + body(x + i.astype(jnp.float32) * 1e-3, *rest), ()
        tot, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(k))
        return tot
    return outer


def northstar_line(k: int = 4, e2e_runs: int = 3) -> dict:
    """Returns the metrics dict for the second bench.py JSON line."""
    import jax
    import jax.numpy as jnp

    from computervisionimagestich2_tpu.config import DEFAULT_CONFIG
    from computervisionimagestich2_tpu.models import compose
    from computervisionimagestich2_tpu.models.equalization import (
        equalize_and_mix)
    from computervisionimagestich2_tpu.models.registration import (
        all_pairs_match_counts, plan_edges)
    from computervisionimagestich2_tpu.models.sift import sift_extract
    from computervisionimagestich2_tpu.models.stitcher import (
        Stitcher, _composite_and_blend, bfs_edge_seq)
    from computervisionimagestich2_tpu.ops.color import to_gray
    from computervisionimagestich2_tpu.ops.warp import (cylindrical_project,
                                                        plan_edge_warp)
    from computervisionimagestich2_tpu.utils.io import load_image
    from scripts.bench_1080p import upscale

    cfg = DEFAULT_CONFIG
    images = [upscale(load_image(f"/root/reference/Input/{i}.bmp"),
                      1440, 1080) for i in range(1, 5)]

    # ---- e2e wall (tunnel-dominated). CHAIN ordering: the headline
    # stage sum below uses chain semantics (BASELINE config 2 — the ex6
    # variant behind the reference's 1.83 s), so the e2e wall measures
    # the same pipeline; the graph variant's all-pairs discovery cost is
    # reported separately as ordering_counts_graph_mode.
    import dataclasses

    cfg_chain = dataclasses.replace(cfg, ordering="chain")
    st = Stitcher(cfg_chain)
    out = st.stitch(images)             # cold
    times = []
    for _ in range(e2e_runs):
        gc.collect()
        time.sleep(0.3)
        t0 = time.perf_counter()
        out = st.stitch(images)
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    e2e_min = times[0]
    e2e_med = times[len(times) // 2]

    # ---- device-side stage sum (amortized scans, floor-subtracted)
    floor = _measure(lambda s: s + 1.0, (jnp.float32(1.0),))

    def dev_ms(body, args, kk=None):
        kk = kk or k
        wall = _measure(_scanned(body, kk), args)
        return max(wall - floor, 0.0) / kk

    proj = [cylindrical_project(jnp.asarray(im, jnp.float32),
                                cfg.projection.angle_deg) for im in images]
    gray = jax.block_until_ready(to_gray(proj[0]))
    # k=12: sift is the 4x-weighted headline term and bounced +-1.5 ms
    # between k=4 sessions (round 5) — deeper amortization divides the
    # per-dispatch jitter without touching the measured program
    sift_ms = dev_ms(lambda g: sift_extract(g, cfg.sift).desc.sum(),
                     (gray,), kk=12)

    # capacity honesty at north-star scale (VERDICT r3 ask #2): the
    # headline is only valid if NO keypoints were dropped by the static
    # capacities on these exact inputs
    from computervisionimagestich2_tpu.models.sift import sift_extract_stats
    dropped = int(sum(
        np.asarray(sift_extract_stats(to_gray(p), cfg.sift)[1]).sum()
        for p in proj))

    feats = st._matching_feats()
    # graph-mode all-pairs discovery cost, reported but NOT in the headline
    # sum: BASELINE.json config 2 ("full 4-image panorama: SEQUENTIAL
    # PAIRWISE registration") is the ex6 chain variant — the one that
    # produced the 1.83 s reference number and the golden — which builds
    # the chain adjacency directly (src/ex6/ImageProcess.cpp:150-159).
    order_ms = dev_ms(
        lambda d: all_pairs_match_counts(d, feats.valid, cfg)
        .sum().astype(jnp.float32), (feats.desc,))

    adj = Stitcher._chain_adjacency(len(images))
    start = Stitcher._middle_index(adj)
    edge_seq = bfs_edge_seq(adj, start)
    edges = jnp.asarray(np.asarray(edge_seq, np.int32))
    img_hw = tuple(proj[0].shape[:2])
    plan_ms = dev_ms(
        lambda d: plan_edges(feats._replace(desc=d), edges, img_hw, img_hw,
                             cfg).sum(), (feats.desc,))

    # composites: replay the planned stitch geometry, timing each edge's
    # fused composite+blend dispatch with its real inputs
    plan = np.asarray(plan_edges(feats, edges, img_hw, img_hw, cfg))
    n_coef = 9 if cfg.warp_model == "projective" else 8
    result = proj[start]
    comp_ms = []
    for e, (_s, dst_i, _p) in enumerate(edge_seq):
        bwd = jnp.asarray(plan[e, 9:9 + n_coef])
        min_x, min_y = float(plan[e, 18]), float(plan[e, 19])
        new_w, new_h = int(plan[e, 20]), int(plan[e, 21])
        if cfg.exact_canvas:
            comp_hw = (new_h, new_w)
        else:
            comp_hw = (compose.bucket_size(new_h, cfg.canvas_bucket),
                       compose.bucket_size(new_w, cfg.canvas_bucket))
        wplan = plan_edge_warp(plan[e, 9:9 + n_coef], comp_hw, min_x,
                               min_y, proj[dst_i].shape[:2], cfg.warp_model,
                               allow_onehot=jax.default_backend() == "tpu")
        starts = None
        if wplan is not None and wplan[0] == "onehot":
            starts = wplan[1]
            wplan = ("onehot",) + tuple(wplan[2:])
        args = (result, proj[dst_i], bwd)
        comp_ms.append(dev_ms(
            lambda res, pd, bw: _composite_and_blend(
                pd, res, bw, jnp.float32(min_x), jnp.float32(min_y),
                comp_hw, (new_h, new_w), cfg, wplan, starts).sum()
            .astype(jnp.float32), args))
        result = jax.block_until_ready(_composite_and_blend(
            proj[dst_i], result, bwd, jnp.float32(min_x),
            jnp.float32(min_y), comp_hw, (new_h, new_w), cfg, wplan,
            starts))

    enhance_ms = dev_ms(
        lambda r: equalize_and_mix(r, cfg.enhance.compat_luma,
                                   cfg.enhance.mix_weight).sum(), (result,))

    # headline = chain semantics (BASELINE config 2 / the ex6 1.83 s
    # variant); graph discovery is reported separately
    stage_sum = (len(images) * sift_ms + plan_ms
                 + float(np.sum(comp_ms)) + enhance_ms)
    return {
        "metric": "panorama_4img_1080p_northstar",
        "value": round(stage_sum, 1),
        "unit": "ms (device-side stage sum; target <50)",
        "e2e_ms": round(e2e_min, 1),
        "e2e_median_ms": round(e2e_med, 1),
        "canvas": list(out.shape[:2]),
        "floor_ms": round(floor, 1),
        "dropped_keypoints": dropped,
        "stages_ms": {
            "sift_per_image": round(sift_ms, 2),
            "ordering_counts_graph_mode": round(order_ms, 2),
            "edge_plan": round(plan_ms, 2),
            "composites": [round(c, 2) for c in comp_ms],
            "enhance": round(enhance_ms, 2),
        },
    }


if __name__ == "__main__":
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(json.dumps(northstar_line()))
