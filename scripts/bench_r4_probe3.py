"""Round-4 probe #3: matcher precision/m fidelity at scale, true bidir
match timings (DCE-proofed), and blend cost-center attribution.

Questions this answers (VERDICT r3 asks #1/#5):
  A. Are l2pre ratio-test decisions still identical to the exact L1
     kernel when the SELECTION matmul runs at DEFAULT (single-pass bf16)
     precision instead of HIGHEST, and at m=16 instead of 32?  Evidence
     base: all 6 north-star directions (1440x1080, ~8k live) plus all 34
     dataset2 adjacent directions (600x800, 18 images).
  B. Where do the 11.4 ms of a true bidirectional match go —
     selection matmul, approx_min_k, candidate gather, L1 rescore?
  C. Where do the 7.2 ms of the edge-2 blend go — level-0 blur,
     downsweep, laplacian+lerp+reconstruct — and does a channel-major
     layout change the blur cost?

Run alone (single-client TPU tunnel):
    python scripts/bench_r4_probe3.py
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
    from computervisionimagestich2_tpu.models.sift import sift_extract
    from computervisionimagestich2_tpu.ops import distance as D
    from computervisionimagestich2_tpu.ops.color import to_gray
    from computervisionimagestich2_tpu.ops.warp import cylindrical_project
    from computervisionimagestich2_tpu.utils.io import load_image
    from scripts.bench_1080p import upscale

    cfg = DEFAULT_CONFIG
    ratio = cfg.match.ratio_threshold
    P_HI = jax.lax.Precision.HIGHEST
    P_DF = jax.lax.Precision.DEFAULT

    def extract(im):
        g = to_gray(cylindrical_project(jnp.asarray(im, jnp.float32),
                                        cfg.projection.angle_deg))
        return sift_extract(g, cfg.sift)

    # ---------------- A. decision fidelity (production internals) --------
    @jax.jit
    def exact_decisions(q, r, qv, rv):
        # chunked exact L1 (oracle)
        nq = q.shape[0]
        oks, i1s = [], []
        for s in range(0, nq, 512):
            qc = q[s:s + 512]
            d = jnp.sum(jnp.abs(qc[:, None, :] - r[None, :, :]), axis=-1)
            d = jnp.where(rv[None, :], d, 3e38)
            i1 = jnp.argmin(d, axis=1)
            d1 = jnp.min(d, axis=1)
            cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
            d2 = jnp.min(jnp.where(cols == i1[:, None], 3e38, d), axis=1)
            oks.append((d1 / d2) < ratio)
            i1s.append(i1)
        ok = jnp.concatenate(oks) & qv
        return ok, jnp.concatenate(i1s)

    from functools import partial

    @partial(jax.jit, static_argnames=("m", "prec"))
    def l2pre_decisions(q, r, qv, rv, m, prec):
        p = P_HI if prec == "hi" else P_DF
        d1, d2, i1 = D._l2pre_one_direction(q, r, qv, rv, m, p)
        ok = ((d1 / d2) < ratio) & qv & (d2 < 3e38)
        return ok, i1

    def diff_count(dec_a, dec_b):
        ok_a, i_a = dec_a
        ok_b, i_b = dec_b
        return int(np.asarray(jnp.sum(
            ((ok_a != ok_b) | (ok_a & (i_a != i_b))).astype(jnp.int32))))

    variants = [("hi", 32), ("df", 32), ("df", 16), ("df", 8)]
    totals = {f"{p}_m{m}": 0 for p, m in variants}
    n_dirs = 0

    def run_pairs(feats, pairs, tag):
        nonlocal n_dirs
        for (a, b) in pairs:
            for (qi, ri) in ((a, b), (b, a)):
                q, r = feats[qi].desc, feats[ri].desc
                qv, rv = feats[qi].valid, feats[ri].valid
                ref_dec = exact_decisions(q, r, qv, rv)
                row = {}
                for p, m in variants:
                    d = diff_count(ref_dec, l2pre_decisions(q, r, qv, rv,
                                                            m, p))
                    totals[f"{p}_m{m}"] += d
                    row[f"{p}_m{m}"] = d
                n_dirs += 1
                print(f"A[{tag}] {qi}->{ri}: {row}", flush=True)

    # north-star set
    ns_feats = [extract(upscale(
        load_image(f"/root/reference/Input/{i}.bmp"), 1440, 1080))
        for i in range(1, 5)]
    run_pairs(ns_feats, [(0, 1), (1, 2), (2, 3)], "ns")

    # dataset2: all adjacent pairs
    d2_feats = [extract(load_image(
        f"/root/reference/src/ex6/dataset2/{i}.bmp")) for i in range(1, 19)]
    run_pairs(d2_feats, [(i, i + 1) for i in range(17)], "d2")

    print(f"A TOTALS over {n_dirs} directions: {totals}", flush=True)

    # ---------------- B. true bidir timings (consume both) ---------------
    floor = measure(lambda s: s + 1.0, (jnp.float32(1.0),))
    K = 4

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
        print(f"B {name:36s} {dev_ms:8.2f} ms", flush=True)

    f0, f1 = ns_feats[0], ns_feats[1]

    def bidir(prec, m):
        def body(d):
            fwd = D._l2pre_one_direction(d, f1.desc, f0.valid, f1.valid,
                                         m, prec)
            bwd = D._l2pre_one_direction(f1.desc, d, f1.valid, f0.valid,
                                         m, prec)
            return sum(x.sum() for x in fwd[:2]) + sum(
                x.sum() for x in bwd[:2])
        return body

    add("bidir_hi_m32", bidir(P_HI, 32), (f0.desc,))
    add("bidir_df_m32", bidir(P_DF, 32), (f0.desc,))
    add("bidir_df_m16", bidir(P_DF, 16), (f0.desc,))
    add("bidir_df_m8", bidir(P_DF, 8), (f0.desc,))

    # selection alone / gather alone / rescore alone (one direction, m=32)
    def sel_only(d, m=32):
        qn = jnp.sum(d * d, axis=1, keepdims=True)
        rn = jnp.sum(f1.desc * f1.desc, axis=1)[None, :]
        cross = jnp.dot(d, f1.desc.T, preferred_element_type=jnp.float32,
                        precision=P_DF)
        dd = jnp.maximum(qn + rn - 2.0 * cross, 0.0)
        dd = jnp.where(f1.valid[None, :], dd, 3e38)
        _, idx = jax.lax.approx_min_k(dd, m)
        return idx
    add("sel_df_m32_only",
        lambda d: sel_only(d).sum().astype(jnp.float32), (f0.desc,))

    def matmul_only(d):
        cross = jnp.dot(d, f1.desc.T, preferred_element_type=jnp.float32,
                        precision=P_DF)
        return cross.sum()
    add("matmul_df_only", matmul_only, (f0.desc,))

    idx32 = jax.block_until_ready(sel_only(f0.desc))

    add("gather_rows_m32",
        lambda d: f1.desc[idx32].sum() + d.sum() * 0.0, (f0.desc,))
    add("rescore_m32",
        lambda d: sum(x.sum() for x in D._l1_rescore(
            d, f1.desc[idx32], idx32, f1.valid[idx32])[:2]), (f0.desc,))

    # gather formulation variants
    add("gather_take_axis0",
        lambda d: jnp.take(f1.desc, idx32.reshape(-1), axis=0).sum()
        + d.sum() * 0.0, (f0.desc,))
    add("gather_onehot_sorted",
        lambda d: jnp.take(f1.desc, jnp.sort(idx32, axis=1).reshape(-1),
                           axis=0).sum() + d.sum() * 0.0, (f0.desc,))

    # ---------------- C. blend attribution at edge-2 canvas --------------
    from computervisionimagestich2_tpu.models.blender import (
        _blur_hwc, blend_stacked, blend_two_images, half_plane_mask,
        n_levels)

    H, W = 1488, 2914
    rng = np.random.default_rng(0)
    a_np = (rng.random((H, W, 3), dtype=np.float32) * 255.0)
    a_np[:, W // 2:] = 0.0
    b_np = (rng.random((H, W, 3), dtype=np.float32) * 255.0)
    b_np[:, :W // 3] = 0.0
    a = jnp.asarray(a_np)
    b = jnp.asarray(b_np)
    jax.block_until_ready(b)
    levels = n_levels(H, W, cfg.blend.level_mode)

    add("blend_full", lambda x: blend_two_images(
        x, b, cfg.blend.level_mode, cfg.blend.blur_sigma,
        cfg.blend.blur_impl, None, "auto").sum(), (a,), 2)

    mask0 = half_plane_mask(a, b, None)
    s0 = jnp.concatenate([a, b, mask0[..., None]], axis=-1)
    s0_bf = jax.block_until_ready(s0.astype(jnp.bfloat16))

    def downsweep(s):
        from computervisionimagestich2_tpu.ops.resize import cimg_resize
        pyr = [s]
        tot = jnp.float32(0.0)
        for i in range(1, levels):
            hp = max(pyr[-1].shape[0] // 2, 1)
            wp = max(pyr[-1].shape[1] // 2, 1)
            pyr.append(cimg_resize(
                _blur_hwc(pyr[-1], cfg.blend.blur_sigma, "fir"), hp, wp))
            tot = tot + pyr[-1].sum().astype(jnp.float32)
        return tot
    add("downsweep_bf16", downsweep, (s0_bf,), 2)

    add("blur0_bf16",
        lambda s: _blur_hwc(s, cfg.blend.blur_sigma, "fir").sum()
        .astype(jnp.float32), (s0_bf,), 2)

    # channel-major level-0 blur (excl. relayout)
    from computervisionimagestich2_tpu.ops.gaussian import (_conv1d_axis,
                                                            gauss_taps)
    taps = jnp.asarray(gauss_taps(cfg.blend.blur_sigma))
    s0_cm = jax.block_until_ready(jnp.moveaxis(s0_bf, -1, 0))
    add("blur0_chanmajor_bf16",
        lambda s: _conv1d_axis(_conv1d_axis(
            s, taps.astype(s.dtype), -1), taps.astype(s.dtype), -2).sum()
        .astype(jnp.float32), (s0_cm,), 2)
    add("relayout_to_chanmajor",
        lambda s: jnp.moveaxis(s, -1, 0).sum().astype(jnp.float32),
        (s0_bf,), 2)

    print(json.dumps({"floor_ms": round(floor, 2),
                      "fidelity_totals": totals, "n_dirs": n_dirs,
                      "stages": out}), flush=True)


if __name__ == "__main__":
    main()
