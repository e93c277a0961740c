"""Round-4 probe #5: edge-2 one-hot warp regression, blend internals,
select_strongest re-measurement, golden hypotheses sweep.

Run alone (single-client TPU tunnel):
    python scripts/bench_r4_probe5.py
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
    from computervisionimagestich2_tpu.models.registration import plan_edges
    from computervisionimagestich2_tpu.models.stitcher import (
        Stitcher, bfs_edge_seq)
    from computervisionimagestich2_tpu.ops import pallas_warp as PW
    from computervisionimagestich2_tpu.ops.warp import (shift_image,
                                                        warp_image)
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
        print(f"{name:44s} {dev_ms:8.2f} ms", flush=True)

    st = Stitcher(cfg)
    projected, _ = st.prepare(images)
    mf = st._matching_feats()
    adj = Stitcher._chain_adjacency(4)
    start = Stitcher._middle_index(adj)
    edge_seq = bfs_edge_seq(adj, start)
    edges = jnp.asarray(np.asarray(edge_seq, np.int32))
    img_hw = tuple(projected[0].shape[:2])
    plan = np.asarray(plan_edges(mf, edges, img_hw, img_hw, cfg))

    # ---- A. per-edge warp envelope + warp-alone timings
    result = projected[start]
    for e, (_s, dst_i, _p) in enumerate(edge_seq):
        bwd = plan[e, 9:17]
        min_x, min_y = float(plan[e, 18]), float(plan[e, 19])
        new_w, new_h = int(plan[e, 20]), int(plan[e, 21])
        comp_hw = (new_h, new_w)
        pd = projected[dst_i]
        prm = PW.onehot_warp_params(bwd, comp_hw, min_x, min_y,
                                    pd.shape[:2], cfg.warp_model)
        if prm is None:
            print(f"A edge{e}: onehot REJECTED (coeffs={bwd.tolist()})",
                  flush=True)
        else:
            starts, winr, winc, d = prm
            live = int(np.asarray(jnp.sum(starts & 1)))
            print(f"A edge{e}: canvas={comp_hw} winr={winr} winc={winc} "
                  f"d={d} live={live}/{starts.shape[0]}", flush=True)
            add(f"warp_onehot_edge{e}",
                lambda p, bw=jnp.asarray(bwd), mx=min_x, my=min_y,
                ch=comp_hw, stt=starts, wr=winr, wc=winc, dd=d:
                PW.warp_image_onehot(p, bw, jnp.float32(mx),
                                     jnp.float32(my), ch, stt, wr, wc,
                                     dd).sum(), (pd,))
        b_img = shift_image(result, jnp.int32(min_x), jnp.int32(min_y),
                            out_shape=comp_hw)
        a_img = warp_image(pd, jnp.asarray(bwd), jnp.float32(min_x),
                           jnp.float32(min_y), out_shape=comp_hw)
        result = jax.block_until_ready(
            jnp.clip(a_img + b_img * (a_img.sum(-1, keepdims=True) == 0),
                     0, 255))

    # ---- B. blend internals at edge2 canvas, properly perturbed
    from computervisionimagestich2_tpu.models.blender import (
        _blur_hwc, blend_two_images, half_plane_mask, n_levels)
    from computervisionimagestich2_tpu.ops.resize import cimg_resize

    H, W = 1488, 2902
    rng = np.random.default_rng(0)
    a_np = (rng.random((H, W, 3), dtype=np.float32) * 255.0)
    a_np[:, W // 2:] = 0.0
    b_np = (rng.random((H, W, 3), dtype=np.float32) * 255.0)
    b_np[:, :W // 3] = 0.0
    a = jnp.asarray(a_np)
    b = jax.block_until_ready(jnp.asarray(b_np))
    levels = n_levels(H, W, "max")

    add("blend_full", lambda x: blend_two_images(
        x, b, "max", 2.0, "fir", None, "auto").sum(), (a,), 2)

    # level-0 blur+shrink alone (the downsweep's first step), bf16
    mask0 = half_plane_mask(a, b, None)
    s0 = jnp.concatenate([a, b, mask0[..., None]], axis=-1)
    s0_bf = jax.block_until_ready(s0.astype(jnp.bfloat16))
    add("lvl0_blur", lambda s: _blur_hwc(s, 2.0, "fir").sum()
        .astype(jnp.float32), (s0_bf,), 2)
    add("lvl0_blur_shrink", lambda s: cimg_resize(
        _blur_hwc(s, 2.0, "fir"), H // 2, W // 2).sum()
        .astype(jnp.float32), (s0_bf,), 2)

    def downsweep(s):
        pyr = [s]
        tot = jnp.float32(0.0)
        for i in range(1, levels):
            hp = max(pyr[-1].shape[0] // 2, 1)
            wp = max(pyr[-1].shape[1] // 2, 1)
            pyr.append(cimg_resize(_blur_hwc(pyr[-1], 2.0, "fir"), hp, wp))
        return pyr[-1].sum().astype(jnp.float32) + pyr[3].sum().astype(
            jnp.float32)
    add("downsweep_lastonly", downsweep, (s0_bf,), 2)

    # ---- C. select_strongest re-measurement (top_k path)
    from computervisionimagestich2_tpu.ops.compaction import (
        compact_indices, select_strongest)

    ntot, capf = 14158, 9728
    resp = jnp.asarray(rng.random(ntot, dtype=np.float32))
    vmask = jax.block_until_ready(jnp.asarray(rng.random(ntot) < 0.6))
    add("select_strongest_topk",
        lambda r: select_strongest(vmask, r, capf)[0]
        .sum().astype(jnp.float32), (resp,))
    add("topk_alone",
        lambda r: lax.top_k(r, capf)[1].sum().astype(jnp.float32), (resp,))
    add("sort_alone",
        lambda r: jnp.sort(r).sum(), (resp,))
    add("argsort_alone",
        lambda r: jnp.argsort(r).sum().astype(jnp.float32), (resp,))

    print(json.dumps({"floor_ms": round(floor, 2), "stages": out}),
          flush=True)


if __name__ == "__main__":
    main()
