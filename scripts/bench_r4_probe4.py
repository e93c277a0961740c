"""Round-4 probe #4: validate the matcher/warp changes on TPU and break
down the SIFT tail + blend tap count.

  A. plan_edges / ordering counts / register_edge at the new defaults
     (DEFAULT-precision selection, m=16 edges / m=8 counts).
  B. Composite timing with the dead-tile one-hot warp skip.
  C. SIFT: real extrema/candidate counts per octave on the bench images
     (for honest candidate-capacity right-sizing) and the final-stage
     micro-costs (select_strongest + gathers at real sizes).
  D. Blend: 17-tap vs 13-tap FIR blur inside the full blend.

Run alone (single-client TPU tunnel):
    python scripts/bench_r4_probe4.py
"""
from __future__ import annotations

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
    from computervisionimagestich2_tpu.models import sift as ms
    from computervisionimagestich2_tpu.models.registration import (
        all_pairs_match_counts, plan_edges, register_edge)
    from computervisionimagestich2_tpu.models.stitcher import (
        Stitcher, _composite_and_blend, bfs_edge_seq)
    from computervisionimagestich2_tpu.ops import sift_kernels as sk
    from computervisionimagestich2_tpu.ops.color import to_gray
    from computervisionimagestich2_tpu.ops.compaction import select_strongest
    from computervisionimagestich2_tpu.ops.warp import (cylindrical_project,
                                                        plan_edge_warp)
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

    # ---- C1. real candidate/extrema counts per octave (honesty data)
    first_sigma, _ = ms.scale_space_sigmas(cfg.sift)
    for i, im in enumerate(images):
        g = to_gray(cylindrical_project(jnp.asarray(im, jnp.float32),
                                        cfg.projection.angle_deg))
        base = g.astype(jnp.float32)
        counts = []
        for o in range(cfg.sift.n_octaves):
            if min(base.shape[-2:]) < 8:
                break
            octv = ms.build_octave(base, cfg.sift,
                                   first_sigma if o == 0 else None)
            mask = sk.extrema_mask(sk.dog_stack(octv), cfg.sift.peak_thresh)
            h, w = octv.shape[-2:]
            counts.append((int(jnp.sum(mask.astype(jnp.int32))),
                           ms.candidate_capacity(h, w)))
            if o + 1 < cfg.sift.n_octaves:
                from computervisionimagestich2_tpu.ops.resize import (
                    vlfeat_downsample)
                base = vlfeat_downsample(octv[cfg.sift.n_levels], 1)
        print(f"C1 image {i}: extrema (found, cap) per octave: {counts}",
              flush=True)

    # ---- A. matcher stages at new defaults
    st = Stitcher(cfg)
    projected, feats = st.prepare(images)
    mf = st._matching_feats()
    jax.block_until_ready(mf.desc)
    lives = np.asarray(jnp.sum(mf.valid.astype(jnp.int32), axis=1))
    print(f"A lives={lives.tolist()} opcap={mf.desc.shape[1]}", flush=True)

    f0 = jax.tree.map(lambda a: a[0], mf)
    f1 = jax.tree.map(lambda a: a[1], mf)
    add("register_edge_m16",
        lambda d: register_edge(f0._replace(desc=d), f1, cfg)[0].sum(),
        (f0.desc,))

    adj = Stitcher._chain_adjacency(4)
    start = Stitcher._middle_index(adj)
    edges = jnp.asarray(np.asarray(bfs_edge_seq(adj, start), np.int32))
    img_hw = tuple(projected[0].shape[:2])
    add("plan_edges_m16",
        lambda d: plan_edges(mf._replace(desc=d), edges, img_hw, img_hw,
                             cfg).sum(), (mf.desc,))
    add("ordering_counts_m8",
        lambda d: all_pairs_match_counts(d, mf.valid, cfg)
        .sum().astype(jnp.float32), (mf.desc,))

    # ---- B. composites with the dead-tile warp skip
    plan = np.asarray(plan_edges(mf, edges, img_hw, img_hw, cfg))
    result = projected[start]
    edge_seq = bfs_edge_seq(Stitcher._chain_adjacency(4), start)
    for e, (_s, dst_i, _p) in enumerate(edge_seq):
        bwd = jnp.asarray(plan[e, 9:17])
        min_x, min_y = float(plan[e, 18]), float(plan[e, 19])
        new_w, new_h = int(plan[e, 20]), int(plan[e, 21])
        comp_hw = (new_h, new_w)
        wplan = plan_edge_warp(plan[e, 9:17], comp_hw, min_x, min_y,
                               projected[dst_i].shape[:2], cfg.warp_model,
                               allow_onehot=True)
        starts = None
        kind = None if wplan is None else wplan[0]
        if wplan is not None and wplan[0] == "onehot":
            starts = wplan[1]
            wplan = ("onehot",) + tuple(wplan[2:])
            live = int(np.asarray(jnp.sum(starts & 1)))
            print(f"B edge{e} onehot tiles live={live}/{starts.shape[0]}",
                  flush=True)
        pd = projected[dst_i]
        add(f"edge{e}_fused_{new_h}x{new_w}_{kind}",
            lambda res, pdp=pd, bw=bwd, mx=min_x, my=min_y, ch=comp_hw,
            oh=(new_h, new_w), wp=wplan, stt=starts:
            _composite_and_blend(pdp, res, bw, jnp.float32(mx),
                                 jnp.float32(my), ch, oh, cfg, wp,
                                 stt).sum().astype(jnp.float32), (result,))
        result = jax.block_until_ready(_composite_and_blend(
            pd, result, bwd, jnp.float32(min_x), jnp.float32(min_y),
            comp_hw, (new_h, new_w), cfg, wplan, starts))

    # ---- C2. SIFT tail micro-costs at real sizes
    rng = np.random.default_rng(0)
    ntot = 13824
    capf = ms.total_keypoint_capacity(1440, 1080, 0)
    resp = jnp.asarray(rng.random(ntot, dtype=np.float32))
    vmask = jnp.asarray(rng.random(ntot) < 0.6)
    descs = jnp.asarray(rng.random((ntot, 128), dtype=np.float32))
    add("select_strongest_13k_to_cap",
        lambda r: select_strongest(vmask, r, capf)[0]
        .sum().astype(jnp.float32), (resp,))

    def tail(r):
        idx, ok = select_strongest(vmask, r, capf)
        return descs[idx].sum() + ok.sum()
    add("tail_select_plus_desc_gather", tail, (resp,))

    # ---- D. blend tap count
    from computervisionimagestich2_tpu.models.blender import blend_two_images
    from computervisionimagestich2_tpu.ops import gaussian as G

    H, W = 1488, 2914
    a_np = (rng.random((H, W, 3), dtype=np.float32) * 255.0)
    a_np[:, W // 2:] = 0.0
    b_np = (rng.random((H, W, 3), dtype=np.float32) * 255.0)
    b_np[:, :W // 3] = 0.0
    a = jnp.asarray(a_np)
    b = jax.block_until_ready(jnp.asarray(b_np))
    add("blend_full_17tap", lambda x: blend_two_images(
        x, b, "max", 2.0, "fir", None, "auto").sum(), (a,), 2)

    orig = G.gauss_taps

    def taps13(sigma):
        t = orig(sigma)
        if t.shape[0] >= 17:
            t = t[2:-2]
            t = t / t.sum()
        return t
    G.gauss_taps = taps13
    try:
        import computervisionimagestich2_tpu.models.blender as BL
        add("blend_full_13tap", lambda x: BL.blend_two_images(
            x, b, "max", 2.0, "fir", jnp.int32(H), "auto").sum(), (a,), 2)
    finally:
        G.gauss_taps = orig

    print(json.dumps({"floor_ms": round(floor, 2), "stages": out}),
          flush=True)


if __name__ == "__main__":
    main()
