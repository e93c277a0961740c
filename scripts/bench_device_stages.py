"""Device-only per-stage timing (VERDICT r1 'weak #2').

The axon tunnel adds a ~30 ms dispatch+readback floor (measured: a jitted
scalar add round-trips in 30.9 ms median), so wall-clock timings of
sub-30ms kernels measure the tunnel, not the device. This script amortizes:
each stage runs K iterations inside ONE jitted lax.scan (inputs perturbed
per iteration so the runtime's identical-buffer dedup can't elide work,
output reduced to a scalar so only one readback happens), and

    device_ms = (wall_ms - floor_ms) / K

Also prints a naive roofline estimate per stage: bytes touched / ~1.2 TB/s
HBM and flops / ~200 TFLOP/s bf16 (~50 f32) for v5-class hardware — only
to flag stages that sit far from either bound.

Run alone (single-client TPU tunnel):
    python scripts/bench_device_stages.py [--hw 1080]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(fn, arg, k=8, reps=5):
    """Median wall ms of fn(arg) (one readback), minus the measured floor."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(fn)
    float(np.asarray(f(arg)))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(f(arg)))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=1080)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    import jax
    # persistent compile cache: 1080p cold compiles run minutes; repeat
    # invocations of this script should only pay them once
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    from computervisionimagestich2_tpu.config import DEFAULT_CONFIG
    from computervisionimagestich2_tpu.models.blender import blend_two_images
    from computervisionimagestich2_tpu.models.equalization import (
        equalize_and_mix)
    from computervisionimagestich2_tpu.models.sift import sift_extract
    from computervisionimagestich2_tpu.ops.color import to_gray
    from computervisionimagestich2_tpu.ops.warp import cylindrical_project
    from computervisionimagestich2_tpu.utils.io import load_image
    from scripts.bench_1080p import upscale

    cfg = DEFAULT_CONFIG
    H = args.hw
    W = int(H * 3 / 4)  # portrait like Input/
    img = upscale(load_image("/root/reference/Input/1.bmp"), H, W)
    dev_img = jnp.asarray(img.astype(np.float32))
    K = args.k

    # measured tunnel floor for this session
    floor = measure(lambda s: s + 1.0, jnp.float32(1.0))

    def scanned(body):
        """Run body K times inside one jit, perturbing input each step."""
        def outer(x):
            def step(carry, i):
                out = body(x + i.astype(jnp.float32) * 1e-3)
                return carry + out, ()
            tot, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(K))
            return tot
        return outer

    stages = {}

    def add(name, body, arg, bytes_touched, flops):
        wall = measure(scanned(body), arg)
        dev = max(wall - floor, 0.0) / K
        stages[name] = {
            "device_ms": round(dev, 3),
            "hbm_bound_ms": round(bytes_touched / 1.2e12 * 1e3, 3),
            "flops_bound_ms": round(flops / 50e12 * 1e3, 4),
        }
        print(f"{name:24s} {dev:8.2f} ms   (hbm bound "
              f"{stages[name]['hbm_bound_ms']:.2f} ms, f32 flops bound "
              f"{stages[name]['flops_bound_ms']:.3f} ms)")

    npix = H * W
    # cylindrical projection: read f32 rgb + write f32 rgb
    add("cylindrical_project",
        lambda x: cylindrical_project(x, cfg.projection.angle_deg).sum(),
        dev_img, npix * 3 * 4 * 2, npix * 3 * 20)
    # grayscale
    proj = cylindrical_project(dev_img, cfg.projection.angle_deg)
    add("to_gray", lambda x: to_gray(x).sum(), proj,
        npix * 4 * 4, npix * 5)
    # SIFT end-to-end on luma (descriptor flops dominated by conv pyramid)
    gray = to_gray(proj)
    add("sift_extract",
        lambda x: sift_extract(x, cfg.sift).desc.sum(), gray,
        npix * 4 * 40, npix * 500)
    # blend of a 2x-wide canvas
    ch, cw = H + 80, int(W * 1.8)
    a = jnp.zeros((ch, cw, 3), jnp.float32).at[:H, :W].set(proj)
    b = jnp.zeros((ch, cw, 3), jnp.float32).at[:H, -W:].set(proj)
    add("blend_two_images",
        lambda x: blend_two_images(x, b, cfg.blend.level_mode,
                                   cfg.blend.blur_sigma,
                                   cfg.blend.blur_impl).sum(), a,
        ch * cw * 3 * 4 * 8, ch * cw * 3 * 200)
    # bytes: the f32 inputs are read and the f32 result written once each
    # (3 x 4B passes); the ~6 interior pyramid passes run at 2B
    add("blend_two_images_bf16",
        lambda x: blend_two_images(x, b, cfg.blend.level_mode,
                                   cfg.blend.blur_sigma,
                                   cfg.blend.blur_impl,
                                   dtype="bf16").sum(), a,
        ch * cw * 3 * (3 * 4 + 6 * 2), ch * cw * 3 * 200)
    # enhance tail
    add("equalize_and_mix",
        lambda x: equalize_and_mix(x, cfg.enhance.compat_luma,
                                   cfg.enhance.mix_weight).sum(), a,
        ch * cw * 3 * 4 * 6, ch * cw * (256 + 60))

    # matcher: one directed 2-NN vs the bidirectional pass at the live
    # keypoint counts this resolution actually produces
    feats = sift_extract(gray, cfg.sift)
    live = int(np.asarray(feats.valid.sum()))
    cap = feats.desc.shape[0]
    print(f"matcher operands: cap={cap} live={live}")
    from computervisionimagestich2_tpu.ops import distance as dist_ops

    add("two_nearest (1 dir)",
        lambda x: sum(jnp.sum(t) for t in dist_ops.two_nearest(
            x, feats.desc, feats.valid, feats.valid)[:2]),
        feats.desc, cap * 128 * 4 * 2, live * live * 128 * 3)
    add("two_nearest_bidir",
        lambda x: sum(jnp.sum(t) for pair in dist_ops.two_nearest_bidir(
            x, feats.desc, feats.valid, feats.valid) for t in pair[:2]),
        feats.desc, cap * 128 * 4 * 2, live * live * 128 * 3)

    # full edge registration (match both dirs + 2x RANSAC + solves)
    from computervisionimagestich2_tpu.models.registration import (
        register_edge)

    def reg(x):
        fa = feats._replace(desc=x)
        fwd, bwd, n, _ = register_edge(fa, feats, cfg)
        return jnp.sum(fwd) + jnp.sum(bwd) + n.astype(jnp.float32)
    add("register_edge", reg, feats.desc,
        cap * 128 * 4 * 2, live * live * 128 * 3)

    # per-edge composite path at panorama-canvas scale: banded warp vs
    # gather warp, offset copy, u8 truncation, and the fused per-edge
    # program the stitcher actually dispatches (stitcher._composite_and_blend)
    from computervisionimagestich2_tpu.models.blender import blend_edge
    from computervisionimagestich2_tpu.ops.warp import (
        banded_warp_params, shift_image, trunc_u8, warp_image,
        warp_image_banded)

    ch2, cw2 = H + 64, int(W * 2.15)   # ~4-image chain canvas
    canvas = jnp.zeros((ch2, cw2, 3), jnp.float32).at[:H, :W].set(proj)
    bwd = jnp.asarray(np.array([1.0, 0.02, 0.0, -0.32 * W,
                                0.01, 1.0, 0.0, 12.0], np.float32))
    minx, miny = jnp.float32(-0.33 * W), jnp.float32(-20.0)
    bands = banded_warp_params(np.asarray(bwd), (ch2, cw2), float(minx),
                               float(miny), (H, W))
    cbytes = ch2 * cw2 * 3 * 4
    if bands is not None:
        add("warp_banded (canvas)",
            lambda x: warp_image_banded(x, bwd, minx, miny, (ch2, cw2),
                                        bands[0], bands[1]).sum(),
            proj, npix * 3 * 4 + cbytes, ch2 * cw2 * 3 * 20)
    add("warp_gather (canvas)",
        lambda x: warp_image(x, bwd, minx, miny,
                             out_shape=(ch2, cw2)).sum(),
        proj, npix * 3 * 4 + cbytes, ch2 * cw2 * 3 * 20)
    add("shift_image (canvas)",
        lambda x: shift_image(x, jnp.int32(-106), jnp.int32(-20),
                              out_shape=(ch2, cw2)).sum(),
        canvas, cbytes * 2, 0)
    add("trunc_u8 (canvas)",
        lambda x: trunc_u8(x).astype(jnp.float32).sum(), canvas,
        cbytes + ch2 * cw2 * 3, ch2 * cw2 * 3 * 2)

    def fused_composite(x):
        a = (warp_image_banded(x, bwd, minx, miny, (ch2, cw2),
                               bands[0], bands[1]) if bands is not None
             else warp_image(x, bwd, minx, miny, out_shape=(ch2, cw2)))
        bsh = shift_image(canvas, jnp.int32(-106), jnp.int32(-20),
                          out_shape=(ch2, cw2))
        blended = blend_edge(a, bsh, cfg.blend, ch2)
        return trunc_u8(blended[:ch2, :cw2]).astype(jnp.float32).sum()
    add("fused_composite (edge)", fused_composite, proj,
        cbytes * 10, ch2 * cw2 * 3 * 220)

    print(json.dumps({"floor_ms": round(floor, 2), "hw": [H, W],
                      "k": K, "stages": stages}))


if __name__ == "__main__":
    main()
