"""SIFT sub-stage device timing at 1080p (north-star push, VERDICT r1 #4).

Times each internal stage of sift_extract separately with the same
amortized lax.scan trick as bench_device_stages.py (K iterations inside
one jit, input perturbed per step, scalar readback), so the ~30 ms tunnel
floor divides out. Stages nest (each includes its inputs' compute being
re-run? NO — each stage times ONLY its own op by taking precomputed
device inputs), so the numbers are additive approximations of the fused
program's cost centers.

Run alone (single-client TPU tunnel):
    python scripts/bench_sift_breakdown.py [--hw 1080]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(fn, args, reps=5):
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=1080)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    from computervisionimagestich2_tpu.config import DEFAULT_CONFIG
    from computervisionimagestich2_tpu.models import sift as ms
    from computervisionimagestich2_tpu.ops import sift_kernels as sk
    from computervisionimagestich2_tpu.ops.color import to_gray
    from computervisionimagestich2_tpu.ops.warp import cylindrical_project
    from computervisionimagestich2_tpu.utils.io import load_image
    from scripts.bench_1080p import upscale

    cfg = DEFAULT_CONFIG.sift
    H = args.hw
    W = int(H * 3 / 4)
    img = upscale(load_image("/root/reference/Input/1.bmp"), H, W)
    dev = jnp.asarray(img.astype(np.float32))
    gray = to_gray(cylindrical_project(dev, DEFAULT_CONFIG.projection.angle_deg))
    gray = jax.block_until_ready(gray)
    K = args.k

    floor = measure(lambda s: s + 1.0, (jnp.float32(1.0),))
    print(f"floor {floor:.1f} ms")

    def scanned(body):
        def outer(x, *rest):
            def step(carry, i):
                return carry + body(x + i.astype(jnp.float32) * 1e-3,
                                    *rest), ()
            tot, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(K))
            return tot
        return outer

    out = {}

    def add(name, body, args_):
        wall = measure(scanned(body), args_)
        dev_ms = max(wall - floor, 0.0) / K
        out[name] = round(dev_ms, 3)
        print(f"{name:28s} {dev_ms:8.2f} ms")

    first_sigma, _ = ms.scale_space_sigmas(cfg)

    # full extraction for reference
    add("sift_extract_total",
        lambda g: ms.sift_extract(g, cfg).desc.sum(), (gray,))

    # octave-0 pyramid build (the dominant-area octave)
    add("pyramid_oct0",
        lambda g: ms.build_octave(g, cfg, first_sigma).sum(), (gray,))

    # full pyramid: all octaves chained
    def all_octaves(g):
        base = g
        tot = jnp.float32(0.0)
        for o in range(cfg.n_octaves):
            if min(base.shape[-2:]) < 8:
                break
            octv = ms.build_octave(base, cfg, first_sigma if o == 0 else None)
            tot = tot + octv.sum()
            if o + 1 < cfg.n_octaves:
                from computervisionimagestich2_tpu.ops.resize import (
                    vlfeat_downsample)
                base = vlfeat_downsample(octv[cfg.n_levels], 1)
        return tot
    add("pyramid_all", all_octaves, (gray,))

    octave = jax.block_until_ready(ms.build_octave(gray, cfg, first_sigma))
    dog = jax.block_until_ready(sk.dog_stack(octave))

    add("dog+extrema_oct0",
        lambda o: sk.extrema_mask(sk.dog_stack(o), cfg.peak_thresh)
        .astype(jnp.float32).sum(), (octave,))

    h, w = gray.shape
    cap_cand = ms.candidate_capacity(h, w)
    add("compact_mask_oct0",
        lambda o: sk.compact_mask(
            sk.extrema_mask(sk.dog_stack(o), cfg.peak_thresh),
            cap_cand)[0].sum().astype(jnp.float32), (octave,))

    mask = sk.extrema_mask(dog, cfg.peak_thresh)
    coords, cvalid = sk.compact_mask(mask, cap_cand)
    coords = jax.block_until_ready(coords)

    def refine_only(d, coords, cvalid):
        ok, x, y, s, l, _ = sk.refine_keypoints(
            d, coords, cvalid, w, h, cfg.peak_thresh, cfg.edge_thresh,
            cfg.s_min, cfg.s_max, 1.0, cfg.sigma0, cfg.n_levels)
        return x.sum() + y.sum()
    add("refine_oct0", refine_only, (dog, coords, cvalid))

    add("polar_gradient_oct0",
        lambda o: sk.polar_gradient(o[1:1 + cfg.n_levels]).sum(), (octave,))

    # per-octave totals: run _process_octave per octave alone
    def proc_oct(o_arr, o_idx):
        d = ms._process_octave(o_arr, cfg, o_idx)[0]
        return d.sum()
    base = gray
    for o in range(cfg.n_octaves):
        if min(base.shape[-2:]) < 8:
            break
        octv = jax.block_until_ready(
            ms.build_octave(base, cfg, first_sigma if o == 0 else None))
        add(f"process_octave_{o}",
            lambda oa, oi=o: proc_oct(oa, oi), (octv,))
        if o + 1 < cfg.n_octaves:
            from computervisionimagestich2_tpu.ops.resize import (
                vlfeat_downsample)
            base = jax.block_until_ready(
                vlfeat_downsample(octv[cfg.n_levels], 1))

    print(json.dumps({"floor_ms": round(floor, 2), "hw": [H, W], "k": K,
                      "stages": out}))


if __name__ == "__main__" and "--walks" not in sys.argv:
    main()
    sys.exit(0)


def walk_slopes(hw=1080, k=8):
    """Per-keypoint slopes of the lane-packed walk kernels: time the ori
    and desc Pallas calls alone at octave-0 level geometry for two live
    counts, report (us/kp, intercept). Run via --walks."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from computervisionimagestich2_tpu.config import DEFAULT_CONFIG
    from computervisionimagestich2_tpu.ops import pallas_sift as ps
    from computervisionimagestich2_tpu.ops import sift_kernels as sk

    cfg = DEFAULT_CONFIG.sift
    H = hw
    W = int(H * 3 / 4)
    rng = np.random.default_rng(0)
    mod = jnp.asarray(rng.random((H, W), dtype=np.float32))
    ang = jnp.asarray(rng.random((H, W), dtype=np.float32) * 6.28)

    floor = measure(lambda s: s + 1.0, (jnp.float32(1.0),))
    out = {}
    for l in range(cfg.n_levels):
        r_ori = sk.ori_patch_radius(cfg.sigma0, cfg.n_levels, cfg.s_max, l)
        r_desc = sk.desc_patch_radius(cfg.sigma0, cfg.n_levels, cfg.s_max,
                                      cfg.magnif, cfg.n_spatial_bins, l)
        for name, r, fn in (
            ("ori", r_ori, lambda mp, ap, x, y, s, a, nv, r=r_ori:
                ps.orientation_hist_pallas(mp, ap, x, y, s, nv, W, H,
                                           r)[0].sum()),
            ("desc", r_desc, lambda mp, ap, x, y, s, a, nv, r=r_desc:
                ps.descriptors_pallas(mp, ap, x, y, s, a, nv, W, H,
                                      r)[0].sum()),
        ):
            mp = jax.block_until_ready(ps.pad_for_patches(mod, r))
            ap = ps.pad_for_patches(ang, r)
            cap = 4096
            x = jnp.asarray(rng.uniform(2, W - 3, cap), jnp.float32)
            y = jnp.asarray(rng.uniform(2, H - 3, cap), jnp.float32)
            sig = jnp.asarray(
                rng.uniform(1.2, 1.2 * 2 ** ((l + 1.4) / 2), cap),
                jnp.float32)
            a0 = jnp.asarray(rng.uniform(0, 6.28, cap), jnp.float32)
            ts = {}
            for nv in (1024, 3072):
                nva = jnp.asarray([nv], jnp.int32)

                def scanned(mpx):
                    def step(c, i):
                        return c + fn(mpx + i * 1e-6, ap, x, y, sig, a0,
                                      nva), ()
                        # noqa
                    tot, _ = lax.scan(step, jnp.float32(0.0),
                                      jnp.arange(k).astype(jnp.float32))
                    return tot
                wall = measure(scanned, (mp,))
                ts[nv] = max(wall - floor, 0.0) / k
            slope_us = (ts[3072] - ts[1024]) / 2048.0 * 1e3
            out[f"{name}_l{l}"] = {
                "radius": r, "pack": ps._pack(2 * r + 1),
                "ms@1024": round(ts[1024], 3), "ms@3072": round(ts[3072], 3),
                "us_per_kp": round(slope_us, 3)}
            print(f"{name} l{l} r={r} pack={ps._pack(2 * r + 1)}: "
                  f"{ts[1024]:.3f} ms @1024, {ts[3072]:.3f} ms @3072 "
                  f"-> {slope_us:.3f} us/kp")
    print(json.dumps(out))


if __name__ == "__main__":
    sys.argv.remove("--walks")
    walk_slopes()
