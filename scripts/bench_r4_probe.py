"""Round-4 probe: edge_plan internals + keypoint densities at north-star
scale (1440x1080), at the current auto cap and at an honest (no-drop) cap.

Answers VERDICT r3 asks #1/#2/#5 with measurements before touching code:
  - real per-image keypoint finds on the bench inputs (capacity sizing);
  - match_features_bidir / ransac_warp / plan_edges cost split;
  - pair_match_counts_pallas cost at both caps.

Run alone (single-client TPU tunnel):
    python scripts/bench_r4_probe.py
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(fn, args, reps=3):
    import jax

    f = jax.jit(fn)
    float(np.asarray(f(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(f(*args)))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    from computervisionimagestich2_tpu.config import DEFAULT_CONFIG
    from computervisionimagestich2_tpu.models.registration import (
        all_pairs_match_counts, plan_edges, register_edge)
    from computervisionimagestich2_tpu.models.matcher import (
        match_features_bidir)
    from computervisionimagestich2_tpu.models.ransac import ransac_warp
    from computervisionimagestich2_tpu.models.sift import (
        sift_extract_stats, total_keypoint_capacity)
    from computervisionimagestich2_tpu.models.stitcher import (
        Stitcher, bfs_edge_seq)
    from computervisionimagestich2_tpu.ops.color import to_gray
    from computervisionimagestich2_tpu.ops.warp import cylindrical_project
    from computervisionimagestich2_tpu.utils.io import load_image
    from scripts.bench_1080p import upscale

    cfg = DEFAULT_CONFIG
    images = [upscale(load_image(f"/root/reference/Input/{i}.bmp"),
                      1440, 1080) for i in range(1, 5)]
    K = 4

    floor = measure(lambda s: s + 1.0, (jnp.float32(1.0),))
    print(f"floor {floor:.1f} ms", flush=True)

    def scanned(body, k=K):
        def outer(x, *rest):
            def step(carry, i):
                return carry + body(x + i.astype(jnp.float32) * 1e-3,
                                    *rest), ()
            tot, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(k))
            return tot
        return outer

    out = {}

    def add(name, body, args_, k=K):
        wall = measure(scanned(body, k), args_)
        dev_ms = max(wall - floor, 0.0) / k
        out[name] = round(dev_ms, 3)
        print(f"{name:36s} {dev_ms:8.2f} ms", flush=True)

    # ---- keypoint finds per image at a non-binding cap (density truth)
    big_sift = dataclasses.replace(cfg.sift, max_keypoints=16384)
    finds = []
    for i, im in enumerate(images):
        proj = cylindrical_project(jnp.asarray(im, jnp.float32),
                                   cfg.projection.angle_deg)
        f, st = sift_extract_stats(to_gray(proj), big_sift)
        n = int(np.asarray(jnp.sum(f.valid.astype(jnp.int32))))
        d = np.asarray(st)
        finds.append(n + int(d[3]))
        print(f"image {i}: live={n} dropped={d.tolist()}", flush=True)
    h, w = 1440, 1080
    out["finds"] = finds
    out["auto_cap"] = total_keypoint_capacity(h, w, 0)
    print(f"finds {finds}  auto_cap {out['auto_cap']}  "
          f"density 1/{(h * w) / max(finds):.0f} px", flush=True)

    # ---- stage costs at two caps
    for tag, cap in (("auto", 0),):
        scfg = dataclasses.replace(cfg, sift=dataclasses.replace(
            cfg.sift, max_keypoints=cap))
        st = Stitcher(scfg)
        projected, feats = st.prepare(images)
        feats_stacked = st._feats_stacked
        jax.block_until_ready(feats_stacked)
        capn = feats_stacked.desc.shape[1]
        lives = np.asarray(jnp.sum(feats_stacked.valid.astype(jnp.int32),
                                   axis=1))
        print(f"[{tag}] cap={capn} lives={lives.tolist()}", flush=True)

        f0 = jax.tree.map(lambda a: a[0], feats_stacked)
        f1 = jax.tree.map(lambda a: a[1], feats_stacked)

        # bidir match alone
        add(f"{tag}/match_bidir",
            lambda d: match_features_bidir(
                f0._replace(desc=d), f1, scfg.match.ratio_threshold,
                scfg.match.distance, scfg.match.max_matches,
                scfg.match.pallas)[0].src_xy.sum(), (f0.desc,))

        # register_edge (match + 2x ransac + swap)
        add(f"{tag}/register_edge",
            lambda d: register_edge(f0._replace(desc=d), f1, scfg)[0].sum(),
            (f0.desc,))

        # ransac alone on a realistic pair set
        ab, _ = match_features_bidir(f0, f1, scfg.match.ratio_threshold,
                                     scfg.match.distance,
                                     scfg.match.max_matches,
                                     scfg.match.pallas)
        jax.block_until_ready(ab)
        key = jax.random.PRNGKey(0)
        add(f"{tag}/ransac_one",
            lambda sxy: ransac_warp(ab._replace(src_xy=sxy), key,
                                    scfg.ransac.n_hypotheses,
                                    scfg.ransac.threshold,
                                    scfg.ransac.n_sample,
                                    scfg.warp_model)[0].sum(),
            (ab.src_xy,))

        # plan_edges (3 edges)
        adj = Stitcher._chain_adjacency(4)
        start = Stitcher._middle_index(adj)
        edge_seq = bfs_edge_seq(adj, start)
        edges = jnp.asarray(np.asarray(edge_seq, np.int32))
        img_hw = (1440, 1080)
        add(f"{tag}/plan_edges_3",
            lambda d: plan_edges(feats_stacked._replace(desc=d), edges,
                                 img_hw, img_hw, scfg).sum(),
            (feats_stacked.desc,))

        # graph ordering counts (6 unordered pairs, one dispatch)
        add(f"{tag}/ordering_counts",
            lambda d: all_pairs_match_counts(
                d, feats_stacked.valid, scfg).sum().astype(jnp.float32),
            (feats_stacked.desc,))

    print(json.dumps({"floor_ms": round(floor, 2), "stages": out}),
          flush=True)


if __name__ == "__main__":
    main()
