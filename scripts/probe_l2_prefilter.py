"""Measure whether an L2 (MXU) prefilter can serve the exact-L1 2-NN.

Question (round-4 matcher redesign): for real SIFT descriptors, is the
exact-L1 top-2 of every query contained in its L2 top-m candidate set —
and if the containment ever fails, does the resulting ratio-test MATCH SET
actually change? The L1 kernel is VPU-bound (12.9 ms/edge at honest caps,
scripts/bench_r4_probe.py); an L2 prefilter moves ~98% of the distance
math onto the MXU.

Extracts features from the four north-star images (1440x1080), then for
each chain edge and direction reports, for m in {4, 8, 16, 32}:
  - top2_miss: queries whose exact L1 top-2 is not within the L2 top-m;
  - set_diff:  queries whose (ratio<0.5, nearest index) decision differs
    when d1/d2 come from rescoring only the L2 top-m by exact L1.

Run alone (single-client TPU tunnel); compute runs on CPU arrays is fine
but slow — everything stays on device.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from computervisionimagestich2_tpu.config import DEFAULT_CONFIG
    from computervisionimagestich2_tpu.models.sift import sift_extract
    from computervisionimagestich2_tpu.ops.color import to_gray
    from computervisionimagestich2_tpu.ops.warp import cylindrical_project
    from computervisionimagestich2_tpu.utils.io import load_image
    from scripts.bench_1080p import upscale

    cfg = DEFAULT_CONFIG
    feats = []
    for i in range(1, 5):
        im = upscale(load_image(f"/root/reference/Input/{i}.bmp"), 1440, 1080)
        g = to_gray(cylindrical_project(jnp.asarray(im, jnp.float32),
                                        cfg.projection.angle_deg))
        f = sift_extract(g, cfg.sift)
        feats.append(jax.tree.map(np.asarray, f))
        print(f"image {i}: live={int(f.valid.sum())}", flush=True)

    MS = (4, 8, 16, 32)
    ratio = cfg.match.ratio_threshold

    @jax.jit
    def analyze(q, r, qv, rv):
        # exact L1 top-2 (chunked over queries to bound the [c, NR] block)
        def l1_chunk(qc):
            d = jnp.sum(jnp.abs(qc[:, None, :] - r[None, :, :]), axis=-1)
            return jnp.where(rv[None, :], d, 3e38)

        def l2_chunk(qc):
            qn = jnp.sum(qc * qc, axis=1, keepdims=True)
            rn = jnp.sum(r * r, axis=1)[None, :]
            d = qn + rn - 2.0 * jnp.dot(qc, r.T,
                                        preferred_element_type=jnp.float32)
            return jnp.where(rv[None, :], d, 3e38)

        nq = q.shape[0]
        c = 512
        outs = []
        for s in range(0, nq, c):
            qc = q[s:s + c]
            d1 = l1_chunk(qc)
            i1 = jnp.argmin(d1, axis=1)
            v1 = jnp.min(d1, axis=1)
            cols = jax.lax.broadcasted_iota(jnp.int32, d1.shape, 1)
            d1b = jnp.where(cols == i1[:, None], 3e38, d1)
            i2 = jnp.argmin(d1b, axis=1)
            v2 = jnp.min(d1b, axis=1)

            d2 = l2_chunk(qc)
            per_m = []
            for m in MS:
                _, idx_m = jax.lax.top_k(-d2, m)          # L2 top-m indices
                # exact-L1 rescore of the candidate set
                cand = r[idx_m]                            # [c, m, 128]
                dl1 = jnp.sum(jnp.abs(qc[:, None, :] - cand), axis=-1)
                dl1 = jnp.where(jnp.take_along_axis(
                    jnp.broadcast_to(rv[None, :], d2.shape), idx_m, 1),
                    dl1, 3e38)
                j1 = jnp.argmin(dl1, axis=1)
                w1 = jnp.min(dl1, axis=1)
                colm = jax.lax.broadcasted_iota(jnp.int32, dl1.shape, 1)
                dl1b = jnp.where(colm == j1[:, None], 3e38, dl1)
                w2 = jnp.min(dl1b, axis=1)
                g1 = jnp.take_along_axis(idx_m, j1[:, None], 1)[:, 0]

                has1 = jnp.any(idx_m == i1[:, None], axis=1)
                has2 = jnp.any(idx_m == i2[:, None], axis=1)
                top2_miss = ~(has1 & has2)
                ok_ref = (v1 / v2) < ratio
                ok_new = (w1 / w2) < ratio
                set_diff = (ok_ref != ok_new) | (ok_ref & (g1 != i1))
                per_m.append(jnp.stack([jnp.sum(top2_miss.astype(jnp.int32)),
                                        jnp.sum(set_diff.astype(jnp.int32))]))
            outs.append(jnp.stack(per_m))
        return sum(outs)

    report = {}
    for (a, b) in ((0, 1), (1, 2), (2, 3)):
        for (qi, ri) in ((a, b), (b, a)):
            q = jnp.asarray(feats[qi].desc)
            r = jnp.asarray(feats[ri].desc)
            qv = jnp.asarray(feats[qi].valid)
            rv = jnp.asarray(feats[ri].valid)
            res = np.asarray(analyze(q, r, qv, rv))
            nq = int(feats[qi].valid.sum())
            key = f"{qi}->{ri}"
            report[key] = {f"m{m}": {"top2_miss": int(res[k, 0]),
                                     "set_diff": int(res[k, 1])}
                           for k, m in enumerate(MS)}
            print(key, report[key], f"(nq={nq})", flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
