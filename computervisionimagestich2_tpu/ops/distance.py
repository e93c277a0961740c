"""All-pairs descriptor distances + top-2 selection.

TPU-native replacement for VLFeat's kd-forest ANN matcher
(/root/reference/vl/kdtree.c: vl_kdforest_build:530,
vl_kdforestsearcher_query:774) and the app's 2-NN + Lowe ratio wrapper
(ImageProcess.cpp:273-351). Instead of a per-query tree descent, the full
[NB, NA] distance matrix is computed densely (MXU for L2, VPU for L1) and the
2 nearest neighbors come from one top-k — exact, so match parity can only
improve over the reference's approximate search.

Descriptors are fixed-width (128) with validity masks; invalid columns are
pushed to +inf so they never win the top-k.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# python float, not jnp scalar: module import must not initialize a backend
# (the TPU tunnel is single-client; see .claude/skills/verify/SKILL.md)
BIG = 3.0e38


def pairwise_l1(qry: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """L1 distances [NB, NA] between qry [NB, D] and ref [NA, D].

    Matches VlDistanceL1 (vl/mathop.c:308). XLA fuses the
    broadcast-abs-reduce into one VPU loop nest; no [NB, NA, D] intermediate
    is materialized.
    """
    return jnp.sum(jnp.abs(qry[:, None, :] - ref[None, :, :]), axis=-1)


def pairwise_l2sq(qry: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Squared-L2 distances via the matmul identity (MXU path)."""
    qn = jnp.sum(qry * qry, axis=-1, keepdims=True)
    rn = jnp.sum(ref * ref, axis=-1, keepdims=True)
    cross = jnp.dot(qry, ref.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(qn + rn.T - 2.0 * cross, 0.0)


def _pallas_2nn_enabled(pallas: str) -> bool:
    if pallas == "on":
        return True
    if pallas == "off":
        return False
    # "auto": Pallas when the DEFAULT backend is TPU. Computations placed on
    # explicit non-default devices (e.g. the virtual CPU mesh) must pass
    # pallas="off" — trace-time code cannot see where the jit will run.
    return jax.default_backend() == "tpu"


@partial(jax.jit, static_argnames=("distance", "pallas"))
def two_nearest(qry: jnp.ndarray, ref: jnp.ndarray,
                qry_valid: jnp.ndarray, ref_valid: jnp.ndarray,
                distance: str = "l1", pallas: str = "auto"):
    """For every query descriptor, its 2 nearest reference descriptors.

    Returns (d1, d2, i1): nearest distance, second distance, nearest index —
    the inputs of the Lowe ratio test (ImageProcess.cpp:327-331). Invalid
    references never win; invalid queries get d1=d2=BIG.

    On TPU with 128-aligned shapes this dispatches to the Pallas kernel
    (ops.pallas_distance), which keeps the distance block in VMEM and fuses
    the top-2; otherwise the XLA path below runs.
    """
    if (distance == "l1" and _pallas_2nn_enabled(pallas)
            and qry.shape[0] % 128 == 0 and ref.shape[0] % 128 == 0
            and qry.shape[1] == 128):
        from .pallas_distance import two_nearest_l1_pallas

        return two_nearest_l1_pallas(qry, ref, qry_valid, ref_valid)
    if distance == "l1":
        d = pairwise_l1(qry, ref)
    elif distance == "l2":
        d = pairwise_l2sq(qry, ref)
    else:
        raise ValueError(distance)
    d = jnp.where(ref_valid[None, :], d, BIG)
    # two min-reductions instead of top_k (top_k sorts; 2 passes are cheaper)
    i1 = jnp.argmin(d, axis=1)
    d1 = jnp.take_along_axis(d, i1[:, None], axis=1)[:, 0]
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d2 = jnp.min(jnp.where(cols == i1[:, None], BIG, d), axis=1)
    d1 = jnp.where(qry_valid, d1, BIG)
    d2 = jnp.where(qry_valid, d2, BIG)
    return d1, d2, i1


@partial(jax.jit, static_argnames=("distance", "pallas"))
def two_nearest_bidir(qry: jnp.ndarray, ref: jnp.ndarray,
                      qry_valid: jnp.ndarray, ref_valid: jnp.ndarray,
                      distance: str = "l1", pallas: str = "auto"):
    """Both 2-NN directions from one distance evaluation.

    Returns ((d1q, d2q, i1q), (d1r, d2r, i1r)): the first tuple equals
    two_nearest(qry, ref, ...), the second the role-swapped
    two_nearest(ref, qry, ...) — same distances up to f32 reduction-order
    ulps (XLA may reassociate the feature reduce differently per matrix
    orientation), same first-lowest-index tie-breaks — at half the
    distance cost. The reference computes getImgPair twice per edge
    (ImageProcess.cpp:185-198); the distance matrix it rebuilds per
    direction is shared here.
    """
    if (distance == "l1" and _pallas_2nn_enabled(pallas)
            and qry.shape[0] % 128 == 0 and ref.shape[0] % 128 == 0
            and qry.shape[1] == 128):
        from .pallas_distance import two_nearest_l1_bidir_pallas

        return two_nearest_l1_bidir_pallas(qry, ref, qry_valid, ref_valid)
    if distance == "l1":
        d = pairwise_l1(qry, ref)
    elif distance == "l2":
        d = pairwise_l2sq(qry, ref)
    else:
        raise ValueError(distance)

    def top2(dm, axis, q_ok, r_ok):
        dm = jnp.where(r_ok, dm, BIG)
        i1 = jnp.argmin(dm, axis=axis)
        d1 = jnp.min(dm, axis=axis)
        idx = jax.lax.broadcasted_iota(jnp.int32, dm.shape, axis)
        sel = idx == jnp.expand_dims(i1, axis)
        d2 = jnp.min(jnp.where(sel, BIG, dm), axis=axis)
        d1 = jnp.where(q_ok, d1, BIG)
        d2 = jnp.where(q_ok, d2, BIG)
        return d1, d2, i1

    fwd = top2(d, 1, qry_valid, ref_valid[None, :])
    bwd = top2(d, 0, ref_valid, qry_valid[:, None])
    return fwd, bwd


@partial(jax.jit, static_argnames=("distance", "pallas"))
def ratio_match_bidir(qry: jnp.ndarray, ref: jnp.ndarray,
                      qry_valid: jnp.ndarray, ref_valid: jnp.ndarray,
                      ratio: float = 0.5, distance: str = "l1",
                      pallas: str = "auto"):
    """Lowe ratio test in both directions from one distance evaluation.

    Returns (ok_q [NB], i1_q [NB], ok_r [NA], i1_r [NA]): the q pair equals
    ratio_match(qry, ref, ...), the r pair the role-swapped call.
    """
    (d1q, d2q, i1q), (d1r, d2r, i1r) = two_nearest_bidir(
        qry, ref, qry_valid, ref_valid, distance, pallas)
    okq = ((d1q / d2q) < ratio) & qry_valid & (d2q < BIG)
    okr = ((d1r / d2r) < ratio) & ref_valid & (d2r < BIG)
    return okq, i1q, okr, i1r


@partial(jax.jit, static_argnames=("distance", "pallas"))
def ratio_match(qry: jnp.ndarray, ref: jnp.ndarray,
                qry_valid: jnp.ndarray, ref_valid: jnp.ndarray,
                ratio: float = 0.5, distance: str = "l1",
                pallas: str = "auto"):
    """Lowe ratio test (ImageProcess.cpp:329-331): keep queries whose
    nearest/second distance ratio is < ratio.

    Returns (match_mask [NB], nearest_ref_index [NB]).
    """
    d1, d2, i1 = two_nearest(qry, ref, qry_valid, ref_valid, distance, pallas)
    ok = (d1 / d2) < ratio
    ok = ok & qry_valid & (d2 < BIG)
    return ok, i1
