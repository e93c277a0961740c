"""SIFT tail micro-probe (round-4 north-star push): what does the
final-capacity stage cost at north-star scale, and is lax.top_k the wall?

The tail after per-octave processing (models/sift.py:306-327):
concatenates ~15.8k slots across octaves, select_strongest (lax.top_k with
k=9728 of n~15.8k) and four row gathers (desc [n,128] + xy/scale/valid).

Candidates measured here, all on device with the amortized-scan trick:
  A. select_strongest as-is (top_k based)
  B. sort-based selection: one argsort by (-strength keyed), slice, re-sort
  C. threshold-based: kth value via sort of strengths only, then
     compact_indices of (strength >= thr) — exact modulo ties
  D. the 4 output gathers alone
Run alone (single-client TPU tunnel):  python scripts/bench_r4_tail.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(fn, args, reps=5):
    """fn's first arg must be a scalar salt; a fresh value per rep defeats
    the runtime's identical-buffer execution dedupe."""
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

    from computervisionimagestich2_tpu.ops.compaction import (
        compact_indices, select_strongest)

    N, CAP = 15872, 9728
    rng = np.random.default_rng(0)
    valid = jnp.asarray(rng.random(N) < 0.65)
    resp = jnp.asarray(rng.random(N).astype(np.float32) + 0.01)
    desc = jnp.asarray(rng.random((N, 128), dtype=np.float32))

    K = 8
    floor = measure(lambda s, z: s + z, (jnp.float32(1.0),))
    print(f"floor {floor:.1f} ms")

    def scanned(body):
        def outer(salt, r, *rest):
            def step(c, i):
                return c + body(r * salt + i.astype(jnp.float32) * 1e-6,
                                *rest), ()
            tot, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(K))
            return tot
        return outer

    out = {}

    def add(name, body, args_):
        wall = measure(scanned(body), args_)
        out[name] = round(max(wall - floor, 0.0) / K, 3)
        print(f"{name:24s} {out[name]:8.3f} ms")

    # A: current
    def cur(r, v):
        idx, ov = select_strongest(v, r, CAP)
        return idx.sum().astype(jnp.float32) + ov.sum()
    add("A_select_strongest", cur, (resp, valid))

    # B: sort-based: argsort keys descending, take first CAP, re-sort asc
    def sort_based(r, v):
        s = jnp.where(v, r, -1.0)
        order = jnp.argsort(-s)[:CAP]
        keep = s[order] > 0.0
        idx = jnp.sort(jnp.where(keep, order, N))
        ov = idx < N
        return (jnp.where(ov, idx, 0).sum().astype(jnp.float32)
                + ov.sum())
    add("B_argsort", sort_based, (resp, valid))

    # C: threshold via sorted strengths + index tiebreak packing.
    # pack (strength, index) into one f64-free sortable key? strengths are
    # arbitrary f32 — use sort of s only, threshold at kth, tie-tail via
    # compact of (s > thr) then fill from (s == thr) — two compactions.
    def thresh(r, v):
        s = jnp.where(v, r, -1.0)
        thr = jnp.sort(s)[N - CAP]          # kth largest
        idx, ov = compact_indices(s >= thr, CAP)
        return idx.sum().astype(jnp.float32) + ov.sum()
    add("C_threshold", thresh, (resp, valid))

    # D: the four output gathers (fixed idx)
    idxs = jnp.asarray(rng.integers(0, N, CAP, dtype=np.int32))

    def gathers(r, d, idx):
        # fold the perturbed r into d so the gather can't hoist out of the
        # scan (costs one [N,128] broadcast add, ~2M elements)
        g = (d + r[:1])[idx]
        return g.sum()
    add("D_desc_gather", gathers, (resp, desc, idxs))

    # E: top_k alone (no re-sort)
    def topk_only(r, v):
        s = jnp.where(v, r, -1.0)
        vals, ti = lax.top_k(s, CAP)
        return vals.sum() + ti.sum().astype(jnp.float32)
    add("E_topk_alone", topk_only, (resp, valid))

    # F: full sort alone at N
    add("F_sort_alone", lambda r: jnp.sort(r).sum(), (resp,))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
