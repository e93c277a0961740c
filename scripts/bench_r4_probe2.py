"""Round-4 probe #2: register_edge internals, composite/blend breakdown,
and matmul-precision sensitivity of the l2pre matcher.

Attributes the ~5 ms gap between register_edge and match+2xRANSAC seen in
probe #1, times each composite sub-stage at the real north-star canvas
shapes, and measures the l2pre candidate matmul at HIGHEST vs DEFAULT
precision (selection-only — the rescore is exact either way).

Run alone (single-client TPU tunnel):
    python scripts/bench_r4_probe2.py
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
    from computervisionimagestich2_tpu.core.types import MatchPairs
    from computervisionimagestich2_tpu.models import compose
    from computervisionimagestich2_tpu.models.blender import blend_edge
    from computervisionimagestich2_tpu.models.matcher import (
        match_features_bidir)
    from computervisionimagestich2_tpu.models.ransac import ransac_warp
    from computervisionimagestich2_tpu.models.registration import (
        plan_edges, register_edge)
    from computervisionimagestich2_tpu.models.stitcher import (
        Stitcher, bfs_edge_seq, _composite_and_blend)
    from computervisionimagestich2_tpu.ops import distance as D
    from computervisionimagestich2_tpu.ops.warp import (
        cylindrical_project, plan_edge_warp, shift_image, warp_image)
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
        print(f"{name:40s} {dev_ms:8.2f} ms", flush=True)

    st = Stitcher(cfg)
    projected, feats = st.prepare(images)
    fs = st._feats_stacked
    jax.block_until_ready(fs.desc)
    f0 = jax.tree.map(lambda a: a[0], fs)
    f1 = jax.tree.map(lambda a: a[1], fs)
    mcfg = cfg.match

    # --- register_edge attribution
    add("match_bidir_full",
        lambda d: match_features_bidir(
            f0._replace(desc=d), f1, mcfg.ratio_threshold, mcfg.distance,
            mcfg.max_matches, mcfg.pallas, mcfg.method,
            mcfg.l2pre_m)[0].src_xy.sum(), (f0.desc,))

    # raw bidir 2-NN only (no pick/compaction/gather)
    add("two_nearest_bidir_only",
        lambda d: sum(x.sum() for t in D.two_nearest_bidir(
            d, f1.desc, f0.valid, f1.valid, mcfg.distance, mcfg.pallas,
            mcfg.method, mcfg.l2pre_m) for x in t[:2]), (f0.desc,))

    # matmul-precision sensitivity (selection matmul only)
    def l2sel(d, prec):
        qn = jnp.sum(d * d, axis=1, keepdims=True)
        rn = jnp.sum(f1.desc * f1.desc, axis=1)[None, :]
        cross = jnp.dot(d, f1.desc.T, preferred_element_type=jnp.float32,
                        precision=prec)
        d2 = jnp.maximum(qn + rn - 2.0 * cross, 0.0)
        _, idx = jax.lax.approx_min_k(d2, 32)
        return idx.sum().astype(jnp.float32)
    add("l2sel_highest",
        lambda d: l2sel(d, jax.lax.Precision.HIGHEST), (f0.desc,))
    add("l2sel_default",
        lambda d: l2sel(d, jax.lax.Precision.DEFAULT), (f0.desc,))

    # match + pick (no ransac): replicate register_edge minus ransac
    def match_pick(d):
        s2d, d2s = match_features_bidir(
            f0._replace(desc=d), f1, mcfg.ratio_threshold, mcfg.distance,
            mcfg.max_matches, mcfg.pallas, mcfg.method, mcfg.l2pre_m)
        use = s2d.n_raw > d2s.n_raw
        pick = lambda a, b: jax.tree.map(
            lambda x, y: jnp.where(use, x, y), a, b)
        sf = pick(s2d, d2s.swapped())
        df = pick(s2d.swapped(), d2s)
        return sf.src_xy.sum() + df.src_xy.sum()
    add("match_plus_pick", match_pick, (f0.desc,))

    add("register_edge_full",
        lambda d: register_edge(f0._replace(desc=d), f1, cfg)[0].sum(),
        (f0.desc,))

    # ransac alone, fresh pairs each step (no dedupe)
    ab, _ = match_features_bidir(f0, f1, mcfg.ratio_threshold,
                                 mcfg.distance, mcfg.max_matches,
                                 mcfg.pallas, mcfg.method, mcfg.l2pre_m)
    jax.block_until_ready(ab.src_xy)
    key = jax.random.PRNGKey(0)
    add("ransac_one_fresh",
        lambda sxy: ransac_warp(ab._replace(src_xy=sxy), key,
                                cfg.ransac.n_hypotheses,
                                cfg.ransac.threshold, cfg.ransac.n_sample,
                                cfg.warp_model)[0].sum(), (ab.src_xy,))

    # sampling alone (the weighted no-replacement choice)
    def sample_only(vf):
        n_cap = ab.src_xy.shape[0]
        p = vf / jnp.maximum(jnp.sum(vf), 1.0)
        keys = jax.random.split(key, cfg.ransac.n_hypotheses)
        idx = jax.vmap(lambda k: jax.random.choice(
            k, n_cap, shape=(4,), replace=False, p=p))(keys)
        return idx.sum().astype(jnp.float32)
    add("ransac_sampling_only",
        lambda vf: sample_only(vf), (ab.valid.astype(jnp.float32),))

    # --- composite breakdown at the real north-star canvas geometry
    adj = Stitcher._chain_adjacency(4)
    start = Stitcher._middle_index(adj)
    edge_seq = bfs_edge_seq(adj, start)
    edges = jnp.asarray(np.asarray(edge_seq, np.int32))
    img_hw = (1440, 1080)
    plan = np.asarray(plan_edges(fs, edges, img_hw, img_hw, cfg))
    n_coef = 8
    result = projected[start]
    for e, (_s, dst_i, _p) in enumerate(edge_seq):
        bwd = jnp.asarray(plan[e, 9:9 + n_coef])
        min_x, min_y = float(plan[e, 18]), float(plan[e, 19])
        new_w, new_h = int(plan[e, 20]), int(plan[e, 21])
        comp_hw = (new_h, new_w)
        wplan = plan_edge_warp(plan[e, 9:9 + n_coef], comp_hw, min_x,
                               min_y, projected[dst_i].shape[:2],
                               cfg.warp_model, allow_onehot=True)
        starts = None
        if wplan is not None and wplan[0] == "onehot":
            starts = wplan[1]
            wplan = ("onehot",) + tuple(wplan[2:])
        pd = projected[dst_i]

        # full fused composite
        add(f"edge{e}_fused_{new_h}x{new_w}",
            lambda res, pdp=pd, bw=bwd, mx=min_x, my=min_y, ch=comp_hw,
            oh=(new_h, new_w), wp=wplan, stt=starts:
            _composite_and_blend(pdp, res, bw, jnp.float32(mx),
                                 jnp.float32(my), ch, oh, cfg, wp,
                                 stt).sum().astype(jnp.float32), (result,))
        # warp alone (gather fallback form measures the generic path)
        add(f"edge{e}_warp_only",
            lambda pdp, bw=bwd, mx=min_x, my=min_y, ch=comp_hw:
            warp_image(pdp, bw, jnp.float32(mx), jnp.float32(my),
                       out_shape=ch).sum(), (pd,))
        add(f"edge{e}_shift_only",
            lambda res, mx=min_x, my=min_y, ch=comp_hw:
            shift_image(res, jnp.int32(mx), jnp.int32(my),
                        out_shape=ch).sum(), (result,))
        # blend alone on same-shape operands
        a_img = warp_image(pd, bwd, jnp.float32(min_x), jnp.float32(min_y),
                           out_shape=comp_hw)
        b_img = shift_image(result, jnp.int32(min_x), jnp.int32(min_y),
                            out_shape=comp_hw)
        jax.block_until_ready(b_img)
        add(f"edge{e}_blend_only",
            lambda a, b=b_img, nh=new_h:
            blend_edge(a, b, cfg.blend, nh).sum(), (a_img,))
        result = jax.block_until_ready(_composite_and_blend(
            pd, result, bwd, jnp.float32(min_x), jnp.float32(min_y),
            comp_hw, (new_h, new_w), cfg, wplan, starts))

    print(json.dumps({"floor_ms": round(floor, 2), "stages": out}),
          flush=True)


if __name__ == "__main__":
    main()
