"""Batched / sharded panorama kernels (BASELINE.json config 3).

Panoramas (and registration pairs) are independent, so the batch axis shards
cleanly over the ``data`` mesh axis with zero cross-image communication —
the TPU-native form of "stitch many panoramas at once". The whole pairwise
registration (SIFT x2 -> exact match -> vmapped RANSAC) runs as ONE jitted
SPMD program over the mesh.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import StitchConfig, DEFAULT_CONFIG
from ..models.matcher import match_features
from ..models.ransac import ransac_warp
from ..models.sift import sift_extract
from ..ops.color import to_gray
from ..ops.warp import cylindrical_project


def _register_one(gray_a: jnp.ndarray, gray_b: jnp.ndarray,
                  cfg: StitchConfig):
    """Pairwise registration: features of a and b -> warp coeffs b->a."""
    import dataclasses

    # this path is vmapped over the pair batch; the Pallas keypoint-walk
    # and 2-NN kernels don't batch (and may target non-default devices, e.g.
    # a virtual CPU mesh), so pin the XLA backends
    sift_cfg = dataclasses.replace(cfg.sift, pallas="off")
    fa = sift_extract(gray_a, sift_cfg)
    fb = sift_extract(gray_b, sift_cfg)
    pairs = match_features(fb, fa, cfg.match.ratio_threshold,
                           cfg.match.distance, cfg.match.max_matches,
                           pallas="off")
    key = jax.random.PRNGKey(cfg.ransac.seed)
    coeffs, _, n_inliers = ransac_warp(pairs, key, cfg.ransac.n_hypotheses,
                                       cfg.ransac.threshold,
                                       cfg.ransac.n_sample)
    return coeffs, n_inliers


@partial(jax.jit, static_argnames=("cfg",))
def batched_pairwise_register(gray_a: jnp.ndarray, gray_b: jnp.ndarray,
                              cfg: StitchConfig = DEFAULT_CONFIG):
    """vmapped registration over a batch of pairs.

    gray_a, gray_b: [B, H, W] float32 luma. Returns (coeffs [B, 8],
    inliers [B]). Shard the batch axis over the mesh's ``data`` axis.
    """
    return jax.vmap(lambda a, b: _register_one(a, b, cfg))(gray_a, gray_b)


@partial(jax.jit, static_argnames=("cfg",))
def _project_and_extract_one(image: jnp.ndarray,
                             cfg: StitchConfig = DEFAULT_CONFIG):
    from ..models.sift import sift_extract_stats

    proj = cylindrical_project(image.astype(jnp.float32),
                               cfg.projection.angle_deg)
    feats, stats = sift_extract_stats(to_gray(proj), cfg.sift)
    return feats, proj, stats


@partial(jax.jit, static_argnames=("cfg",))
def _project_and_extract_vmapped(images: jnp.ndarray,
                                 cfg: StitchConfig = DEFAULT_CONFIG):
    return jax.vmap(lambda im: _project_and_extract_one(im, cfg))(images)


def batched_project_and_extract(images: jnp.ndarray,
                                cfg: StitchConfig = DEFAULT_CONFIG):
    """Cylindrical projection + luma + SIFT over a batch of images
    [B, H, W, 3] — the batched form of readFile (ImageProcess.cpp:11-24),
    the parallelism the reference's per-image threads only attempted
    (src/ex6/ImageProcess.cpp:44-50 creates-then-joins inside the loop).

    With the Pallas per-keypoint kernels enabled the batch runs as B
    pipelined dispatches of ONE compiled per-image program (the kernels
    don't vmap, and B inlined copies would compile B times slower; each
    image's keypoint walk sizes itself to the live count instead of the
    static batch cap). The vmapped single-program form is kept for
    CPU/mesh paths.
    """
    from ..models.sift import _pallas_enabled
    from ..utils import obs

    if _pallas_enabled(cfg.sift):
        outs = [_project_and_extract_one(images[i], cfg)
                for i in range(images.shape[0])]
        feats, proj, stats = jax.tree.map(lambda *xs: jnp.stack(xs), *outs)
    else:
        feats, proj, stats = _project_and_extract_vmapped(images, cfg)
    # capacity truncation must be reported, never silent (VERDICT r1 #8) —
    # but logging must not force a host sync before the caller can enqueue
    # downstream work (the whole point of the pipelined dispatches above),
    # so the tiny [B, 4] stats readback happens on a side thread
    obs.log_sift_overflow_async(stats)
    return feats, proj


def shard_batch(mesh: Mesh, *arrays):
    """Place arrays with the batch axis sharded over the data axis."""
    sharding = NamedSharding(mesh, P("data"))
    return tuple(jax.device_put(a, sharding) for a in arrays)
