"""Consolidated perf probe (replaces the round-4 bench_r4_probe*.py
family — VERDICT r4 ask #8). One parameterized tool, subcommands:

    python scripts/probe.py sift-stages [--hw 1440]   # stage attribution
    python scripts/probe.py desc-ab     [--hw 1440]   # pallas vs XLA desc
    python scripts/probe.py detect-ab   [--hw 1440]   # XLA vs pallas detect
    python scripts/probe.py stitch-sum  [--hw 1440]   # quick stage-sum view

All timings use the amortized lax.scan trick (K iterations inside ONE
dispatch on perturbed inputs, scalar readback) so the ~25-30 ms tunnel
RPC floor divides out; every A/B is same-session (RESULTS round 4: the
floor drifts 26-33 ms between sessions and cross-session comparisons
inverted the truth twice).

``sift-stages`` attributes sift_extract's cost by STUBBING stages from
the back (descriptor walks, then orientation walks, then refine, then
gradient) and differencing fresh-jitted variants — each stub keeps every
earlier stage's work identical, so differences are honest in-context
costs including XLA fusion effects.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


_FLOOR = [0.0]


def measure(fn, args, reps=5, k=4):
    """Amortized device ms/iteration of fn(*args) (scalar-returning),
    with the RPC floor (set by rpc_floor()) subtracted per outer call."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def outer(*a):
        def step(carry, i):
            pert = (a[0] + i.astype(a[0].dtype) * 1e-3,) + a[1:]
            return carry + fn(*pert), ()
        tot, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(k))
        return tot

    f = jax.jit(outer)
    float(np.asarray(f(*args)))          # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(f(*args)))
        ts.append((time.perf_counter() - t0) * 1e3)
    return max(float(np.median(ts)) - _FLOOR[0], 0.0) / k


def rpc_floor():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda s: s + 1.0)
    float(np.asarray(f(jnp.float32(0.0))))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(f(jnp.float32(0.0))))
        ts.append((time.perf_counter() - t0) * 1e3)
    _FLOOR[0] = float(np.median(ts))
    return _FLOOR[0]


def load_gray(hw: int):
    import jax
    import jax.numpy as jnp

    from computervisionimagestich2_tpu.config import DEFAULT_CONFIG
    from computervisionimagestich2_tpu.ops.color import to_gray
    from computervisionimagestich2_tpu.ops.warp import cylindrical_project
    from computervisionimagestich2_tpu.utils.io import load_image
    from scripts.bench_1080p import upscale

    h, w = (hw, hw * 3 // 4)
    img = upscale(load_image("/root/reference/Input/1.bmp"), h, w)
    proj = cylindrical_project(jnp.asarray(img, jnp.float32),
                               DEFAULT_CONFIG.projection.angle_deg)
    return jax.block_until_ready(to_gray(proj))


# --------------------------------------------------------------- sift-stages
def cmd_sift_stages(args):
    import jax
    import jax.numpy as jnp

    from computervisionimagestich2_tpu.config import DEFAULT_CONFIG
    from computervisionimagestich2_tpu.models import sift as ms
    from computervisionimagestich2_tpu.ops import pallas_sift as ps
    from computervisionimagestich2_tpu.ops import sift_kernels as sk

    cfg = DEFAULT_CONFIG.sift
    gray = load_gray(args.hw)
    floor = rpc_floor()
    print(f"floor {floor:.1f} ms", flush=True)

    raw = ms.sift_extract_stats.__wrapped__

    def timed(tag):
        # inner jits cache traces that captured the PREVIOUS stubs —
        # flush them so each variant re-traces against current module
        # attributes
        for f in (ms._process_octave, ms.sift_extract_stats):
            try:
                f.clear_cache()
            except Exception:
                pass
        fn = lambda g: raw(g, cfg)[0].desc.sum()
        ms_t = measure(fn, (gray,), k=args.k)
        print(f"{tag:28s} {ms_t:7.2f} ms", flush=True)
        return ms_t

    orig = dict(
        desc=ps.descriptors_pallas, ori=ps.orientation_hist_pallas,
        refine=sk.refine_keypoints, grad=sk.polar_gradient,
        extrema=sk.extrema_mask, compact=sk.compact_mask)

    def stub_desc(mod_pad, ang_pad, x, y, sigma, angle, n_valid, w, h,
                  radius, magnif=3.0, window_size=2.0, nbp=4, nbo=8,
                  interpret=False, walk_dtype="f32"):
        n = x.shape[0]
        return (jnp.zeros((n, 128), jnp.float32) + mod_pad[0, 0],
                jnp.arange(n) < n_valid[0])

    def stub_ori(mod_pad, ang_pad, x, y, sigma, n_valid, w, h, radius,
                 n_bins=36, interpret=False):
        n = x.shape[0]
        return (jnp.zeros((n, n_bins), jnp.float32)
                .at[:, 0].set(1.0) + mod_pad[0, 0] * 0.0,
                jnp.arange(n) < n_valid[0])

    def stub_refine(dog, coords, cvalid, w, h, pt, et, smin, smax, xper,
                    sigma0, S):
        n = coords.shape[0]
        x = coords[:, 2].astype(jnp.float32) * xper
        y = coords[:, 1].astype(jnp.float32) * xper
        sn = coords[:, 0].astype(jnp.float32)
        sig = sigma0 * 2.0 ** (sn / S) * xper
        return (cvalid, x, y, sig, jnp.clip(coords[:, 0], 0, S - 1),
                jnp.abs(dog[0, 0, 0]) + jnp.zeros(n))

    def stub_grad(oct_lvls):
        s, h, w = oct_lvls.shape
        return jnp.zeros((s, 2, h, w), jnp.float32) + oct_lvls[0, 0, 0]

    results = {}
    results["full"] = timed("full")
    ps.descriptors_pallas = stub_desc
    results["no_desc"] = timed("no_desc")
    ps.orientation_hist_pallas = stub_ori
    results["no_ori"] = timed("no_ori+desc")
    sk.refine_keypoints = stub_refine
    results["no_refine"] = timed("no_refine+ori+desc")
    sk.polar_gradient = stub_grad
    results["no_grad"] = timed("no_grad+refine+ori+desc")
    ps.descriptors_pallas = orig["desc"]
    ps.orientation_hist_pallas = orig["ori"]
    sk.refine_keypoints = orig["refine"]
    sk.polar_gradient = orig["grad"]

    out = {
        "hw": list(np.asarray(gray).shape), "floor_ms": round(floor, 1),
        "desc_ms": round(results["full"] - results["no_desc"], 2),
        "ori_ms": round(results["no_desc"] - results["no_ori"], 2),
        "refine_ms": round(results["no_ori"] - results["no_refine"], 2),
        "grad_ms": round(results["no_refine"] - results["no_grad"], 2),
        "base_ms": round(results["no_grad"], 2),
        "full_ms": round(results["full"], 2),
    }
    print(json.dumps(out), flush=True)


# ------------------------------------------------------------------- desc-ab
def cmd_desc_ab(args):
    """Pallas walk descriptors vs the XLA einsum batch, per real bucket.

    Reconstructs the exact desc-walk dispatch of models/sift.py octave 0
    (buckets, radii, live counts) on the real image, then times each
    bucket's descriptors_pallas against sk.descriptors at the same
    [cap_b] shapes and live counts.
    """
    import jax
    import jax.numpy as jnp

    from computervisionimagestich2_tpu.config import DEFAULT_CONFIG
    from computervisionimagestich2_tpu.models import sift as ms
    from computervisionimagestich2_tpu.ops import pallas_sift as ps
    from computervisionimagestich2_tpu.ops import sift_kernels as sk

    cfg = DEFAULT_CONFIG.sift
    gray = load_gray(args.hw)
    floor = rpc_floor()
    print(f"floor {floor:.1f} ms", flush=True)

    # --- replicate octave-0 front end to get honest keypoint lists
    first_sigma, _ = ms.scale_space_sigmas(cfg)
    octave = ms.build_octave(gray.astype(jnp.float32), cfg, first_sigma)
    n_lvl, h, w = octave.shape
    xper = 1.0
    dog = sk.dog_stack(octave)
    cap_cand = ms.candidate_capacity(h, w)
    mask = sk.extrema_mask(dog, cfg.peak_thresh)
    coords, cvalid = sk.compact_mask(mask, cap_cand)
    ok, x, y, sigma, lvl, resp = sk.refine_keypoints(
        dog, coords, cvalid, w, h, cfg.peak_thresh, cfg.edge_thresh,
        cfg.s_min, cfg.s_max, xper, cfg.sigma0, cfg.n_levels)
    grad = sk.polar_gradient(octave[1:1 + cfg.n_levels])
    cap_kp = ms.keypoint_capacity(h, w, cfg.max_keypoints_per_octave)

    import math as pymath
    for l in range(cfg.n_levels):
        cap_l = max(128, (2 * cap_kp) // ((cfg.n_levels + 1)
                                          * (2 if l else 1)))
        sel = ok & (lvl == l)
        kp_idx, kp_valid = sk.compact_indices(sel, cap_l)
        xl, yl, sl = x[kp_idx], y[kp_idx], sigma[kp_idx]
        r_ori = sk.ori_patch_radius(cfg.sigma0, cfg.n_levels, cfg.s_max, l)
        mod_o = ps.pad_for_patches(grad[l, 0], r_ori)
        ang_o = ps.pad_for_patches(grad[l, 1], r_ori)
        n_l = jnp.sum(kp_valid.astype(jnp.int32))[None]
        hist, o_ok = ps.orientation_hist_pallas(
            mod_o, ang_o, xl, yl, sl, n_l, w, h, r_ori, cfg.n_ori_bins)
        angles, a_valid = sk.orientation_peaks(
            hist, o_ok & kp_valid, cfg.n_ori_bins, cfg.max_angles)
        cap_d = cap_l + cap_l // 2
        ka_valid = a_valid.reshape(-1)
        rep = lambda a: jnp.repeat(a, cfg.max_angles, axis=0)
        ka_x, ka_y, ka_sigma = map(rep, (xl, yl, sl))
        ka_angle = angles.reshape(-1)

        r_desc = sk.desc_patch_radius(cfg.sigma0, cfg.n_levels, cfg.s_max,
                                      cfg.magnif, cfg.n_spatial_bins, l)
        sbp_kp = cfg.magnif * ka_sigma + 2.220446049250313e-16
        wr_kp = jnp.floor(pymath.sqrt(2.0) * sbp_kp
                          * (cfg.n_spatial_bins + 1) / 2.0 + 0.5)
        dsegs = ms._walk_buckets(cfg, l, ms._desc_radius_for_sn, r_desc)
        buckets = []
        sn_prev, wr_prev = l - 0.5, 0.0
        for r_b, sn_hi in dsegs:
            cap_b = min(cap_d, ms._bucket_cap(cap_l, sn_prev, sn_hi, l))
            buckets.append((r_b, ka_valid & (wr_kp > wr_prev)
                            & (wr_kp <= r_b), cap_b))
            sn_prev, wr_prev = sn_hi, float(r_b)
        buckets.append((r_desc, ka_valid & (wr_kp > wr_prev),
                        max(128, cap_l // 4)))

        grad_l_pad = {}
        for r_b, sel_b, cap_b in buckets:
            db_idx, b_valid = sk.compact_indices(sel_b, cap_b)
            b_x, b_y, b_sigma, b_angle = (
                ka_x[db_idx], ka_y[db_idx], ka_sigma[db_idx],
                ka_angle[db_idx])
            n_b = jax.block_until_ready(
                jnp.sum(b_valid.astype(jnp.int32))[None])
            mod_d = ps.pad_for_patches(grad[l, 0], r_b)
            ang_d = ps.pad_for_patches(grad[l, 1], r_b)
            args_p = tuple(map(jax.block_until_ready,
                               (mod_d, ang_d, b_x, b_y, b_sigma, b_angle)))

            t_pallas = measure(
                lambda m, *a: ps.descriptors_pallas(
                    m, *a, n_b, w, h, r_b, cfg.magnif,
                    cfg.n_spatial_bins / 2.0, cfg.n_spatial_bins,
                    cfg.n_desc_ori_bins)[0].sum(),
                args_p, k=args.k)

            if r_b not in grad_l_pad:
                grad_l_pad[r_b] = jax.block_until_ready(jnp.pad(
                    jnp.moveaxis(grad[l:l + 1], 1, -1),
                    ((0, 0), (r_b, r_b), (r_b, r_b), (0, 0))))
            gp = grad_l_pad[r_b]
            zl = jnp.zeros(cap_b, jnp.int32)
            t_xla = measure(
                lambda g, bx: sk.descriptors(
                    g, zl, bx, b_y, b_sigma, b_angle, b_valid, w, h, r_b,
                    cfg.magnif, cfg.n_spatial_bins / 2.0,
                    cfg.n_spatial_bins, cfg.n_desc_ori_bins)[0].sum(),
                (gp, b_x), k=args.k)
            print(json.dumps({
                "level": l, "radius": r_b, "cap": cap_b,
                "live": int(n_b[0]), "pallas_ms": round(t_pallas, 3),
                "xla_ms": round(t_xla, 3)}), flush=True)


# ---------------------------------------------------------------- refine-ab
def cmd_refine_ab(args):
    """Dense-field refine: current packed-row tail vs per-field gathers.

    The acceptance record is packed as a [.,5] minor-dim array before the
    final row gather (sift_kernels.py:262-266) — a relayout of five
    (8,128)-tiled fields into minor-5 layout that may cost more than the
    4 point-gathers it saves. Measures refine in isolation both ways.
    """
    import jax
    import jax.numpy as jnp

    from computervisionimagestich2_tpu.config import DEFAULT_CONFIG
    from computervisionimagestich2_tpu.models import sift as ms
    from computervisionimagestich2_tpu.ops import sift_kernels as sk

    cfg = DEFAULT_CONFIG.sift
    gray = load_gray(args.hw)
    floor = rpc_floor()
    print(f"floor {floor:.1f} ms", flush=True)

    first_sigma, _ = ms.scale_space_sigmas(cfg)
    octave = ms.build_octave(gray.astype(jnp.float32), cfg, first_sigma)
    dog = jax.block_until_ready(sk.dog_stack(octave))
    h, w = dog.shape[1:]
    cap = ms.candidate_capacity(h, w)
    mask = sk.extrema_mask(dog, cfg.peak_thresh)
    coords, cvalid = map(jax.block_until_ready,
                         sk.compact_mask(mask, cap))

    t_cur = measure(
        lambda d: sk.refine_keypoints(
            d, coords, cvalid, w, h, cfg.peak_thresh, cfg.edge_thresh,
            cfg.s_min, cfg.s_max, 1.0, cfg.sigma0,
            cfg.n_levels)[1].sum(), (dog,), k=args.k)
    print(json.dumps({"refine_packed_ms": round(t_cur, 3)}), flush=True)

    def refine_unpacked(d):
        step_code, okf, xf, yf, sigmaf, respf = sk._refine_fields(
            d, w, h, cfg.peak_thresh, cfg.edge_thresh, cfg.s_min,
            cfg.s_max, 1.0, cfg.sigma0, cfg.n_levels)
        n_s, hh, ww = d.shape
        sc_flat = step_code.reshape(-1)
        y = coords[:, 1]
        x = coords[:, 2]
        base = coords[:, 0] * (hh * ww)

        def chase(_, carry):
            x, y = carry
            code = sc_flat[base + y * ww + x]
            return x + code % 3 - 1, y + code // 3 - 1

        x, y = jax.lax.fori_loop(0, 5, chase, (x, y))
        flat = base + y * ww + x
        ok = okf.reshape(-1)[flat] & cvalid
        return (ok, xf.reshape(-1)[flat], yf.reshape(-1)[flat],
                sigmaf.reshape(-1)[flat], respf.reshape(-1)[flat])

    t_un = measure(lambda d: refine_unpacked(d)[1].sum(), (dog,),
                   k=args.k)
    print(json.dumps({"refine_unpacked_ms": round(t_un, 3)}), flush=True)


# ----------------------------------------------------------------- sift-base
def cmd_sift_base(args):
    """Direct decomposition of the walk-free 'base' cost: pyramid,
    extrema, compaction, per-level keypoint compactions, peaks,
    select_strongest."""
    import jax
    import jax.numpy as jnp

    from computervisionimagestich2_tpu.config import DEFAULT_CONFIG
    from computervisionimagestich2_tpu.models import sift as ms
    from computervisionimagestich2_tpu.ops import sift_kernels as sk
    from computervisionimagestich2_tpu.ops.compaction import (
        compact_indices, select_strongest)

    cfg = DEFAULT_CONFIG.sift
    gray = load_gray(args.hw)
    floor = rpc_floor()
    print(f"floor {floor:.1f} ms", flush=True)
    out = {}

    first_sigma, _ = ms.scale_space_sigmas(cfg)
    out["pyramid_oct0"] = measure(
        lambda g: ms.build_octave(g, cfg, first_sigma).sum(), (gray,),
        k=args.k)

    octave = jax.block_until_ready(
        ms.build_octave(gray.astype(jnp.float32), cfg, first_sigma))
    h, w = octave.shape[1:]
    cap = ms.candidate_capacity(h, w)

    def all_octave_pyramids(g):
        tot = jnp.float32(0.0)
        base = g
        for o in range(cfg.n_octaves):
            oc = ms.build_octave(base, cfg, first_sigma if o == 0 else None)
            tot = tot + oc.sum()
            if o + 1 < cfg.n_octaves:
                base = ms.vlfeat_downsample(oc[cfg.n_levels], 1)
        return tot

    out["pyramid_all"] = measure(all_octave_pyramids, (gray,), k=args.k)

    dog = jax.block_until_ready(sk.dog_stack(octave))
    out["extrema_oct0"] = measure(
        lambda d: sk.extrema_mask(d, cfg.peak_thresh).sum()
        .astype(jnp.float32), (dog,), k=args.k)
    out["extrema+compact_oct0"] = measure(
        lambda d: sk.compact_mask(sk.extrema_mask(d, cfg.peak_thresh),
                                  cap)[0].sum().astype(jnp.float32),
        (dog,), k=args.k)

    # per-level keypoint compaction + peaks + select at real shapes
    mask = sk.extrema_mask(dog, cfg.peak_thresh)
    coords, cvalid = sk.compact_mask(mask, cap)
    ok, x, y, sigma, lvl, resp = map(jax.block_until_ready, sk.refine_keypoints(
        dog, coords, cvalid, w, h, cfg.peak_thresh, cfg.edge_thresh,
        cfg.s_min, cfg.s_max, 1.0, cfg.sigma0, cfg.n_levels))
    cap_kp = ms.keypoint_capacity(h, w, cfg.max_keypoints_per_octave)
    cap_l = max(128, (2 * cap_kp) // (cfg.n_levels + 1))
    out["compact_lvl0"] = measure(
        lambda r: compact_indices((r > -1.0) & ok & (lvl == 0),
                                  cap_l)[0].sum().astype(jnp.float32),
        (resp,), k=args.k)

    hist = jax.block_until_ready(
        jnp.ones((cap_l, cfg.n_ori_bins), jnp.float32))
    okl = jnp.ones((cap_l,), bool)
    out["peaks_lvl0"] = measure(
        lambda hh2: sk.orientation_peaks(hh2, okl, cfg.n_ori_bins,
                                         cfg.max_angles)[0].sum(),
        (hist,), k=args.k)

    n_all = 15872
    vr = jax.block_until_ready(jnp.ones((n_all,), jnp.float32))
    va = jnp.arange(n_all) < 9000
    capf = ms.total_keypoint_capacity(gray.shape[0], gray.shape[1],
                                      cfg.max_keypoints)
    out["select_strongest"] = measure(
        lambda r: select_strongest(va, r, capf)[0].sum()
        .astype(jnp.float32), (vr,), k=args.k)

    print(json.dumps({k: round(v, 3) for k, v in out.items()}),
          flush=True)


# ------------------------------------------------------------------- plan-ab
def cmd_plan_ab(args):
    """Edge-plan cost split at north-star features: bidir match (l2pre at
    several m), one ransac_warp pair, full plan_edges."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from computervisionimagestich2_tpu.config import DEFAULT_CONFIG
    from computervisionimagestich2_tpu.models.matcher import (
        match_features_bidir)
    from computervisionimagestich2_tpu.models.ransac import ransac_warp
    from computervisionimagestich2_tpu.models.registration import plan_edges
    from computervisionimagestich2_tpu.models.sift import sift_extract
    from computervisionimagestich2_tpu.models.stitcher import (
        Stitcher, bfs_edge_seq)
    from computervisionimagestich2_tpu.ops.color import to_gray
    from computervisionimagestich2_tpu.ops.warp import cylindrical_project
    from computervisionimagestich2_tpu.utils.io import load_image
    from scripts.bench_1080p import upscale

    cfg = DEFAULT_CONFIG
    h, w = (args.hw, args.hw * 3 // 4)
    images = [upscale(load_image(f"/root/reference/Input/{i}.bmp"), h, w)
              for i in range(1, 5)]
    st = Stitcher(cfg)
    proj, feats = st.prepare(images)
    jax.block_until_ready(st._feats_stacked)
    floor = rpc_floor()
    print(f"floor {floor:.1f} ms", flush=True)

    fa, fb = feats[1], feats[2]
    for m in (8, 12, 16, 32):
        t = measure(
            lambda d: match_features_bidir(
                fa._replace(desc=d), fb, cfg.match.ratio_threshold,
                cfg.match.distance, cfg.match.max_matches,
                cfg.match.pallas, "l2pre", m)[0].src_xy.sum(),
            (fa.desc,), k=args.k)
        print(json.dumps({"match_bidir_m": m, "ms": round(t, 3)}),
              flush=True)
    t = measure(
        lambda d: match_features_bidir(
            fa._replace(desc=d), fb, cfg.match.ratio_threshold,
            cfg.match.distance, cfg.match.max_matches,
            cfg.match.pallas, "exact", 16)[0].src_xy.sum(),
        (fa.desc,), k=args.k)
    print(json.dumps({"match_bidir_exact": True, "ms": round(t, 3)}),
          flush=True)

    pairs = match_features_bidir(
        fa, fb, cfg.match.ratio_threshold, cfg.match.distance,
        cfg.match.max_matches, cfg.match.pallas, cfg.match.method,
        cfg.match.l2pre_m)[0]
    pairs = jax.block_until_ready(pairs)
    key = jax.random.PRNGKey(0)
    t = measure(
        lambda sxy: ransac_warp(
            pairs._replace(src_xy=sxy), key, cfg.ransac.n_hypotheses,
            cfg.ransac.threshold, cfg.ransac.n_sample, cfg.warp_model,
            cfg.ransac.lo_iters)[0].sum(), (pairs.src_xy,), k=args.k)
    print(json.dumps({"ransac_one_dir_ms": round(t, 3)}), flush=True)

    from computervisionimagestich2_tpu.models.registration import (
        register_edge)

    t = measure(
        lambda d: sum(jnp.sum(x) for x in register_edge(
            fa._replace(desc=d), fb, cfg, 7)[:2]), (fa.desc,), k=args.k)
    print(json.dumps({"register_edge_ms": round(t, 3)}), flush=True)

    adj = Stitcher._chain_adjacency(4)
    fs = st._feats_stacked
    img_hw = tuple(proj[0].shape[:2])
    edges_all = np.asarray(bfs_edge_seq(adj, 2), np.int32).reshape(-1, 3)
    for ne in (1, 3):
        edges = jnp.asarray(edges_all[:ne])
        t = measure(
            lambda d: plan_edges(fs._replace(desc=d), edges, img_hw,
                                 img_hw, cfg).sum(), (fs.desc,), k=args.k)
        print(json.dumps({"plan_edges_n": ne, "ms": round(t, 3)}),
              flush=True)


# -------------------------------------------------------------- match-fidelity
def cmd_match_fidelity(args):
    """l2pre decision diffs vs the exact-L1 oracle over the round-4
    evidence base (6 north-star 1440x1080 directions + 34 dataset2
    adjacent directions), at m in {8, 12, 16} with the DEFAULT-precision
    selection matmul (the production path). Port of the round-4
    bench_r4_probe3 section A with m=12 added."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from computervisionimagestich2_tpu.config import DEFAULT_CONFIG
    from computervisionimagestich2_tpu.models.sift import sift_extract
    from computervisionimagestich2_tpu.ops import distance as D
    from computervisionimagestich2_tpu.ops.color import to_gray
    from computervisionimagestich2_tpu.ops.warp import cylindrical_project
    from computervisionimagestich2_tpu.utils.io import load_image
    from scripts.bench_1080p import upscale

    cfg = DEFAULT_CONFIG
    ratio = cfg.match.ratio_threshold

    def extract(im):
        g = to_gray(cylindrical_project(jnp.asarray(im, jnp.float32),
                                        cfg.projection.angle_deg))
        return sift_extract(g, cfg.sift)

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

    @partial(jax.jit, static_argnames=("m",))
    def l2pre_decisions(q, r, qv, rv, m):
        d1, d2, i1 = D._l2pre_one_direction(
            q, r, qv, rv, m, jax.lax.Precision.DEFAULT)
        ok = ((d1 / d2) < ratio) & qv & (d2 < 3e38)
        return ok, i1

    def diff_count(a, b):
        (ok_a, i_a), (ok_b, i_b) = a, b
        return int(np.asarray(jnp.sum(
            ((ok_a != ok_b) | (ok_a & (i_a != i_b))).astype(jnp.int32))))

    ms_list = (8, 12, 16)
    totals = {m: 0 for m in ms_list}
    n_dirs = 0

    def run_pairs(feats, pairs, tag):
        nonlocal n_dirs
        for (a, b) in pairs:
            for (qi, ri) in ((a, b), (b, a)):
                q, r = feats[qi].desc, feats[ri].desc
                qv, rv = feats[qi].valid, feats[ri].valid
                ref = exact_decisions(q, r, qv, rv)
                row = {}
                for m in ms_list:
                    d = diff_count(ref, l2pre_decisions(q, r, qv, rv, m))
                    totals[m] += d
                    row[m] = d
                n_dirs += 1
                print(f"[{tag}] {qi}->{ri}: {row}", flush=True)

    ns = [extract(upscale(load_image(f"/root/reference/Input/{i}.bmp"),
                          1440, 1080)) for i in range(1, 5)]
    run_pairs(ns, [(0, 1), (1, 2), (2, 3)], "ns")
    d2f = [extract(load_image(
        f"/root/reference/src/ex6/dataset2/{i}.bmp")) for i in range(1, 19)]
    run_pairs(d2f, [(i, i + 1) for i in range(17)], "d2")
    print(json.dumps({"n_directions": n_dirs,
                      "diff_totals": {str(k): v
                                      for k, v in totals.items()}}),
          flush=True)


# ------------------------------------------------------------------- comp-ab
def cmd_comp_ab(args):
    """Composite cost split at north-star canvases: one-hot warp vs blend
    vs seam-band blend per edge."""
    import numpy as np_

    import jax
    import jax.numpy as jnp

    from computervisionimagestich2_tpu.config import DEFAULT_CONFIG
    from computervisionimagestich2_tpu.models.blender import (
        blend_seam_band, blend_two_images, resolve_dtype)
    from computervisionimagestich2_tpu.models.stitcher import Stitcher
    from computervisionimagestich2_tpu.utils.io import load_image
    from scripts.bench_1080p import upscale

    cfg = DEFAULT_CONFIG
    h, w = (args.hw, args.hw * 3 // 4)
    images = [upscale(load_image(f"/root/reference/Input/{i}.bmp"), h, w)
              for i in range(1, 5)]
    st = Stitcher(cfg)
    out = st.stitch(images)
    floor = rpc_floor()
    print(f"floor {floor:.1f} ms", flush=True)

    # biggest-canvas blend A/B: reuse the final canvas vs itself shifted
    a = jnp.asarray(out, jnp.float32)
    b = jnp.roll(a, w // 3, axis=1)
    ch, cw = a.shape[:2]
    dt = resolve_dtype("auto", ch, cw)
    t_full = measure(
        lambda x: blend_two_images(x, b, cfg.blend.level_mode,
                                   cfg.blend.blur_sigma, "fir", None,
                                   dt).sum(), (a,), k=args.k)
    print(json.dumps({"canvas": [ch, cw], "blend_full_ms": round(t_full, 3),
                      "dtype": dt}), flush=True)
    for band in (128, 256):
        t_band = measure(
            lambda x: blend_seam_band(x, b, band, cfg.blend.level_mode,
                                      cfg.blend.blur_sigma, "fir", None,
                                      "bf16").sum(), (a,), k=args.k)
        print(json.dumps({"blend_seam_band": band,
                          "ms": round(t_band, 3)}), flush=True)

    # fused composite+blend per real planned edge, seam-auto ON vs OFF —
    # the exact dispatch bench_northstar times
    import dataclasses

    import numpy as np_r

    from computervisionimagestich2_tpu.models import compose
    from computervisionimagestich2_tpu.models.registration import plan_edges
    from computervisionimagestich2_tpu.models.stitcher import (
        _composite_and_blend, bfs_edge_seq)
    from computervisionimagestich2_tpu.ops.warp import (cylindrical_project,
                                                        plan_edge_warp)

    proj = [cylindrical_project(jnp.asarray(im, jnp.float32),
                                cfg.projection.angle_deg) for im in images]
    feats = st._matching_feats()
    adj = Stitcher._chain_adjacency(len(images))
    edge_seq = bfs_edge_seq(adj, Stitcher._middle_index(adj))
    edges = jnp.asarray(np_r.asarray(edge_seq, np_r.int32).reshape(-1, 3))
    img_hw = tuple(proj[0].shape[:2])
    plan = np_r.asarray(plan_edges(feats, edges, img_hw, img_hw, cfg))
    cfg_off = dataclasses.replace(cfg, blend=dataclasses.replace(
        cfg.blend, seam_auto_area=0))

    result = proj[Stitcher._middle_index(adj)]
    for e, (_s, dst_i, _p) in enumerate(edge_seq):
        bwd = jnp.asarray(plan[e, 9:17])
        min_x, min_y = float(plan[e, 18]), float(plan[e, 19])
        new_w, new_h = int(plan[e, 20]), int(plan[e, 21])
        comp_hw = (new_h, new_w)
        wplan = plan_edge_warp(plan[e, 9:17], comp_hw, min_x, min_y,
                               proj[dst_i].shape[:2], cfg.warp_model,
                               allow_onehot=True)
        starts = None
        if wplan is not None and wplan[0] == "onehot":
            starts = wplan[1]
            wplan = ("onehot",) + tuple(wplan[2:])
        row = {}
        for tag, c in (("auto", cfg), ("off", cfg_off)):
            row[tag] = round(measure(
                lambda res, pd, bw: _composite_and_blend(
                    pd, res, bw, jnp.float32(min_x), jnp.float32(min_y),
                    comp_hw, (new_h, new_w), c, wplan, starts).sum()
                .astype(jnp.float32),
                (result, proj[dst_i], bwd), k=args.k), 3)
        print(json.dumps({"edge": e, "canvas": [new_h, new_w],
                          "composite_ms": row}), flush=True)
        result = jax.block_until_ready(_composite_and_blend(
            proj[dst_i], result, bwd, jnp.float32(min_x),
            jnp.float32(min_y), comp_hw, (new_h, new_w), cfg, wplan,
            starts))


# ----------------------------------------------------------------- detect-ab
def cmd_detect_ab(args):
    import jax
    import jax.numpy as jnp

    from computervisionimagestich2_tpu.config import DEFAULT_CONFIG
    from computervisionimagestich2_tpu.models import sift as ms
    from computervisionimagestich2_tpu.ops import sift_kernels as sk

    cfg = DEFAULT_CONFIG.sift
    gray = load_gray(args.hw)
    floor = rpc_floor()
    print(f"floor {floor:.1f} ms", flush=True)

    first_sigma, _ = ms.scale_space_sigmas(cfg)
    octave = ms.build_octave(gray.astype(jnp.float32), cfg, first_sigma)
    dog = jax.block_until_ready(sk.dog_stack(octave))
    h, w = dog.shape[1:]
    cap = ms.candidate_capacity(h, w)

    t_xla = measure(
        lambda d: sk.compact_mask(sk.extrema_mask(d, cfg.peak_thresh),
                                  cap)[0].sum().astype(jnp.float32),
        (dog,), k=args.k)
    print(json.dumps({"xla_extrema_compact_ms": round(t_xla, 3),
                      "cap": cap, "hw": [h, w]}), flush=True)

    try:
        from computervisionimagestich2_tpu.ops.pallas_detect import (
            detect_compact_pallas)

        t_p = measure(
            lambda d: detect_compact_pallas(d, cfg.peak_thresh, cap)[0]
            .sum().astype(jnp.float32), (dog,), k=args.k)
        # parity spot check
        c0, v0 = sk.compact_mask(sk.extrema_mask(dog, cfg.peak_thresh), cap)
        c1, v1, _n = detect_compact_pallas(dog, cfg.peak_thresh, cap)
        same = bool(jnp.all(jnp.where(v0[:, None], c0, 0)
                            == jnp.where(v1[:, None], c1, 0))
                    & jnp.all(v0 == v1))
        print(json.dumps({"pallas_detect_ms": round(t_p, 3),
                          "match_xla": same}), flush=True)
    except Exception as e:  # noqa: BLE001 — probe must report, not die
        print(json.dumps({"pallas_detect_error": repr(e)[:300]}),
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["sift-stages", "desc-ab", "detect-ab",
                                    "refine-ab", "sift-base", "plan-ab",
                                    "comp-ab", "match-fidelity"])
    ap.add_argument("--hw", type=int, default=1440)
    ap.add_argument("--k", type=int, default=4)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    {"sift-stages": cmd_sift_stages, "desc-ab": cmd_desc_ab,
     "detect-ab": cmd_detect_ab, "refine-ab": cmd_refine_ab,
     "sift-base": cmd_sift_base, "plan-ab": cmd_plan_ab,
     "comp-ab": cmd_comp_ab,
     "match-fidelity": cmd_match_fidelity}[args.cmd](args)


if __name__ == "__main__":
    main()
