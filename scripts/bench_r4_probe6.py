"""Round-4 probe #6: the north-star redesign batch.

  A. bf16 rescore-gather fidelity: l2pre decisions (DEFAULT selection,
     m=16/8) with the bf16 candidate gather vs the exact-L1 oracle, over
     the same 40 directed pairs as probe3 (6 north-star + 34 dataset2).
  B. match_features_bidir timing at m=16: f32 vs bf16 rescore gather.
  C. blend_two_images timing at the north-star edge-2 canvas with the
     fused blur+shrink downsweep (ops.resize.blur_shrink_hwc).
  D. sift_extract timing + overflow telemetry at 1440x1080 with the
     round-4 walk redesign (tight _rows, finer wr buckets, ori buckets).

Run alone (single-client TPU tunnel):
    python scripts/bench_r4_probe6.py [--skip-a]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(fn, args, reps=5):
    """First positional arg must be a scalar salt (defeats execution
    dedupe — the runtime skips executions with identical input buffers)."""
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
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax
    from functools import partial

    from computervisionimagestich2_tpu.config import DEFAULT_CONFIG
    from computervisionimagestich2_tpu.models.sift import sift_extract_stats
    from computervisionimagestich2_tpu.ops import distance as D
    from computervisionimagestich2_tpu.ops.color import to_gray
    from computervisionimagestich2_tpu.ops.warp import cylindrical_project
    from computervisionimagestich2_tpu.utils.io import load_image
    from scripts.bench_1080p import upscale

    cfg = DEFAULT_CONFIG
    ratio = cfg.match.ratio_threshold
    out = {}

    def extract(im):
        g = to_gray(cylindrical_project(jnp.asarray(im, jnp.float32),
                                        cfg.projection.angle_deg))
        return sift_extract_stats(g, cfg.sift)

    # ---------------- D. sift timing + telemetry -------------------------
    floor = measure(lambda s, z: s + z, (jnp.float32(1.0),))
    print(f"floor {floor:.1f} ms", flush=True)
    K = 8

    imgs = [upscale(load_image(f"/root/reference/Input/{i}.bmp"), 1440, 1080)
            for i in range(1, 5)]
    grays = []
    feats = []
    for i, im in enumerate(imgs):
        f, stats = extract(im)
        feats.append(jax.tree.map(np.asarray, f))
        s = np.asarray(stats)
        nlive = int(np.asarray(jnp.sum(f.valid.astype(jnp.int32))))
        print(f"img{i}: live={nlive} dropped(cand,kp,desc,final)="
              f"{s.tolist()}", flush=True)
        out[f"img{i}_dropped"] = s.tolist()
        g = to_gray(cylindrical_project(jnp.asarray(im, jnp.float32),
                                        cfg.projection.angle_deg))
        grays.append(jax.block_until_ready(g))

    def sift_scanned(salt, g):
        def step(c, i):
            f, _ = sift_extract_stats(g * salt + i.astype(jnp.float32) * 1e-4,
                                      cfg.sift)
            return c + f.desc.sum(), ()
        tot, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(K))
        return tot

    wall = measure(sift_scanned, (grays[0],))
    out["sift_ms"] = round(max(wall - floor, 0.0) / K, 2)
    print(f"sift_extract @1440x1080: {out['sift_ms']:.2f} ms", flush=True)

    # ---------------- B. bidir match timing ------------------------------
    from computervisionimagestich2_tpu.models.matcher import \
        match_features_bidir
    from computervisionimagestich2_tpu.core.types import Features

    fa = jax.tree.map(jnp.asarray, feats[1])
    fb = jax.tree.map(jnp.asarray, feats[2])

    # round-4 note: the "l2pre_f32" method alias was removed after this
    # probe's A/B showed the bf16 gather slower and lossier — production
    # l2pre always gathers f32 now
    for meth in ("l2pre",):
        def bidir_scanned(salt, da, db, meth=meth, k=4):
            def step(c, i):
                a = Features(desc=da * salt + i.astype(jnp.float32) * 1e-5,
                             xy=fa.xy, scale=fa.scale, valid=fa.valid)
                b = Features(desc=db, xy=fb.xy, scale=fb.scale,
                             valid=fb.valid)
                ab, ba = match_features_bidir(
                    a, b, ratio, "l1", cfg.match.max_matches, "auto",
                    meth, cfg.match.l2pre_m)
                return c + ab.src_xy.sum() + ba.src_xy.sum() \
                    + ab.valid.sum() + ba.valid.sum(), ()
            tot, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(k))
            return tot
        wall = measure(bidir_scanned, (fa.desc, fb.desc))
        out[f"bidir_m16_{meth}"] = round(max(wall - floor, 0.0) / 4, 2)
        print(f"bidir m16 {meth}: {out[f'bidir_m16_{meth}']:.2f} ms",
              flush=True)

    # ---------------- C. blend timing ------------------------------------
    from computervisionimagestich2_tpu.models.blender import blend_two_images
    rng = np.random.default_rng(0)
    H, W = 1488, 2902
    a = jnp.asarray(rng.integers(0, 256, (H, W, 3)).astype(np.float32))
    b = jnp.asarray(rng.integers(0, 256, (H, W, 3)).astype(np.float32))

    def blend_scanned(salt, a, b, k=4):
        def step(c, i):
            o = blend_two_images(a * salt + i.astype(jnp.float32), b,
                                 "max", 2.0, "fir", None, "auto")
            return c + o.sum(), ()
        tot, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(k))
        return tot
    wall = measure(blend_scanned, (a, b))
    out["blend_edge2"] = round(max(wall - floor, 0.0) / 4, 2)
    print(f"blend 1488x2902 bf16-auto fused: {out['blend_edge2']:.2f} ms",
          flush=True)

    # ---------------- A. bf16 rescore fidelity ---------------------------
    if "--skip-a" not in sys.argv:
        @jax.jit
        def exact_decisions(q, r, qv, rv):
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
            return jnp.concatenate(oks) & qv, jnp.concatenate(i1s)

        @partial(jax.jit, static_argnames=("m", "f32"))
        def l2pre_decisions(q, r, qv, rv, m, f32):
            d1, d2, i1 = D._l2pre_one_direction(
                q, r, qv, rv, m, jax.lax.Precision.DEFAULT, rescore_f32=f32)
            ok = ((d1 / d2) < ratio) & qv & (d2 < 3e38)
            return ok, i1

        def diff_count(da, db):
            ok_a, i_a = da
            ok_b, i_b = db
            return int(np.asarray(jnp.sum(
                ((ok_a != ok_b) | (ok_a & (i_a != i_b))).astype(jnp.int32))))

        variants = [(16, True), (16, False), (8, False)]
        totals = {f"m{m}_{'f32' if f else 'bf16'}": 0 for m, f in variants}
        n_dirs = 0

        def run_pairs(fset, pairs, tag):
            nonlocal n_dirs
            for (ai, bi) in pairs:
                for (qi, ri) in ((ai, bi), (bi, ai)):
                    q = jnp.asarray(fset[qi].desc)
                    r = jnp.asarray(fset[ri].desc)
                    qv = jnp.asarray(fset[qi].valid)
                    rv = jnp.asarray(fset[ri].valid)
                    ref_dec = exact_decisions(q, r, qv, rv)
                    row = {}
                    for m, f in variants:
                        key = f"m{m}_{'f32' if f else 'bf16'}"
                        d = diff_count(ref_dec,
                                       l2pre_decisions(q, r, qv, rv, m, f))
                        totals[key] += d
                        row[key] = d
                    n_dirs += 1
                    print(f"A[{tag}] {qi}->{ri}: {row}", flush=True)

        run_pairs(feats, [(0, 1), (1, 2), (2, 3)], "ns")
        d2_feats = []
        for i in range(1, 19):
            f, _ = extract(load_image(
                f"/root/reference/src/ex6/dataset2/{i}.bmp"))
            d2_feats.append(jax.tree.map(np.asarray, f))
        run_pairs(d2_feats, [(i, i + 1) for i in range(17)], "d2")
        print(f"A TOTALS over {n_dirs} directions: {totals}", flush=True)
        out["fidelity"] = totals

    print(json.dumps(out))


if __name__ == "__main__":
    main()
