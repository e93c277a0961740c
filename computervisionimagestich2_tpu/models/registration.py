"""Fused per-edge registration — one device program, one host readback.

The reference's stitch step does matching, the direction-swap bookkeeping,
and two RANSACs as separate host-driven stages (ImageProcess.cpp:176-202).
On a TPU behind an RPC tunnel every host<->device synchronization costs
~tens of ms, so the whole edge registration is fused into ONE jitted
program returning just the two 8-coefficient models (16 floats) — the only
values the host needs (for canvas planning).

The direction swap (keep whichever match direction found more pairs,
ImageProcess.cpp:185-198) becomes a jnp.where on the padded pair arrays.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import StitchConfig
from ..core.types import Features, MatchPairs
from .matcher import match_features
from .ransac import ransac_warp


@partial(jax.jit, static_argnames=("cfg",))
def register_edge(feats_src: Features, feats_dst: Features,
                  cfg: StitchConfig):
    """Returns (forward, backward, n_matches): forward maps dst-image coords
    into the src/result frame; backward maps canvas coords into dst-image
    coords. n_matches is the larger direction's match count."""
    mcfg = cfg.match
    s2d = match_features(feats_src, feats_dst, mcfg.ratio_threshold,
                         mcfg.distance, mcfg.max_matches)
    d2s = match_features(feats_dst, feats_src, mcfg.ratio_threshold,
                         mcfg.distance, mcfg.max_matches)
    n_s2d = s2d.count()
    n_d2s = d2s.count()

    use_s2d = n_s2d > n_d2s

    def pick(a, b):
        return jax.tree.map(lambda x, y: jnp.where(use_s2d, x, y), a, b)

    s2d_final = pick(s2d, d2s.swapped())
    d2s_final = pick(s2d.swapped(), d2s)

    key = jax.random.PRNGKey(cfg.ransac.seed)
    forward, _, _ = ransac_warp(d2s_final, key, cfg.ransac.n_hypotheses,
                                cfg.ransac.threshold, cfg.ransac.n_sample,
                                cfg.warp_model)
    backward, _, _ = ransac_warp(s2d_final, key, cfg.ransac.n_hypotheses,
                                 cfg.ransac.threshold, cfg.ransac.n_sample,
                                 cfg.warp_model)
    return forward, backward, jnp.maximum(n_s2d, n_d2s)


@partial(jax.jit, static_argnames=("cfg",))
def all_pairs_match_counts(desc: jnp.ndarray, valid: jnp.ndarray,
                           cfg: StitchConfig) -> jnp.ndarray:
    """Match counts for every ordered image pair in one program.

    desc: [N, CAP, 128] stacked descriptors; valid: [N, CAP].
    Returns [N, N] counts with count[i, j] = |getImgPair(i, j)| for i != j
    (queries = j's descriptors against i's reference set,
    ImageProcess.cpp:117-137). The diagonal is 0.
    """
    from ..ops.distance import ratio_match

    n = desc.shape[0]

    def count_one(i, j):
        ok, _ = ratio_match(desc[j], desc[i], valid[j], valid[i],
                            cfg.match.ratio_threshold, cfg.match.distance)
        return jnp.where(i == j, 0, jnp.sum(ok.astype(jnp.int32)))

    ii = jnp.arange(n)
    return jax.vmap(lambda i: jax.vmap(lambda j: count_one(i, j))(ii))(ii)
