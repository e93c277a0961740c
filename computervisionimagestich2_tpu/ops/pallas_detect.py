"""Fused SIFT detection: DoG 26-neighbor extrema + candidate compaction
in ONE streaming Pallas kernel.

The XLA formulation (ops/sift_kernels.py::extrema_mask + compact_mask)
materializes a [S, H, W] bool mask and compacts it with a bitonic
per-block sort — together ~2.5 ms per 1440x1080 octave, dominated by the
sort's O(domain) passes for a result that is ~6k sparse indices. This
kernel streams the DoG stack once (row slabs, double-buffered DMA),
tests the strict 26-neighborhood on the VPU, and APPENDS hit indices to
the output list in scan order with an SMEM cursor — the common all-miss
slab costs only its DMA + compares.

Semantics are identical to compact_mask(extrema_mask(dog, tp), cap):
same strict max/min with the 0.8*tp pre-gate (vl_sift_detect,
/root/reference/vl/sift.c:539-603), same interior-only scan, same
C-scan output order (s-major, then y, then x), same scan-order
truncation at capacity with the total count reported for telemetry.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_BH = 32          # block rows per grid step (per level)


def _detect_kernel(dog_hbm, idx_ref, cnt_ref, slab, sems, cur, work, *,
                   h: int, w: int, wp: int, s_out: int, nby: int,
                   gate: float, capacity: int):
    i = pl.program_id(0)
    s = i // nby                     # output level s <-> dog level s+1
    by = i % nby

    # --- double-buffered slab DMA: levels [s, s+3), padded rows
    # [by*_BH, by*_BH + _BH + 16) — the 8-row top pad makes every start
    # tile-aligned and absorbs the +-1-row halo
    def copy_for(step, slot):
        return pltpu.make_async_copy(
            dog_hbm.at[pl.ds(step // nby, 3),
                       pl.ds((step % nby) * _BH, _BH + 16), :],
            slab.at[slot], sems.at[slot])

    # pipeline: start copy i+1 into the OTHER slot, wait copy i, compute.
    # (Starting i+2 would target the slot step i is about to read — the
    # walk kernels' schedule, one ahead, is the correct depth-2 form.)
    @pl.when(i == 0)
    def _():
        cur[0] = 0
        cur[1] = 0
        idx_ref[...] = jnp.zeros_like(idx_ref)
        copy_for(0, 0).start()

    @pl.when(i + 1 < s_out * nby)
    def _():
        copy_for(i + 1, (i + 1) % 2).start()

    copy_for(i, i % 2).wait()

    # --- strict 26-neighbor extrema; block row r = slab row r + 8,
    # global y = by*_BH + r
    def rows(l, dy):
        return slab[i % 2, l, pl.ds(8 + dy, _BH), :]

    def pool3x(z, f):
        # roll(1) = x-1 neighbor, roll(wp-1) = x+1 (pltpu.roll requires
        # non-negative shifts); wrap-around lands only on lanes the
        # interior mask excludes (x=0, x>=w-1)
        return f(f(pltpu.roll(z, 1, axis=1), z),
                 pltpu.roll(z, wp - 1, axis=1))

    v = rows(1, 0)
    nmax = nmin = None
    for l in (0, 2):
        rm_max = jnp.maximum(jnp.maximum(rows(l, -1), rows(l, 0)),
                             rows(l, 1))
        rm_min = jnp.minimum(jnp.minimum(rows(l, -1), rows(l, 0)),
                             rows(l, 1))
        p9max = pool3x(rm_max, jnp.maximum)
        p9min = pool3x(rm_min, jnp.minimum)
        nmax = p9max if nmax is None else jnp.maximum(nmax, p9max)
        nmin = p9min if nmin is None else jnp.minimum(nmin, p9min)
    nmax = jnp.maximum(nmax, jnp.maximum(pool3x(rows(1, -1), jnp.maximum),
                                         pool3x(rows(1, 1), jnp.maximum)))
    nmin = jnp.minimum(nmin, jnp.minimum(pool3x(rows(1, -1), jnp.minimum),
                                         pool3x(rows(1, 1), jnp.minimum)))
    nmax = jnp.maximum(nmax, jnp.maximum(pltpu.roll(v, 1, axis=1),
                                         pltpu.roll(v, wp - 1, axis=1)))
    nmin = jnp.minimum(nmin, jnp.minimum(pltpu.roll(v, 1, axis=1),
                                         pltpu.roll(v, wp - 1, axis=1)))

    lane = jax.lax.broadcasted_iota(jnp.int32, (_BH, wp), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (_BH, wp), 0)
    y_glob = by * _BH + row
    interior = ((lane >= 1) & (lane <= w - 2)
                & (y_glob >= 1) & (y_glob <= h - 2))
    hit = (((v >= gate) & (v > nmax)) | ((v <= -gate) & (v < nmin))) \
        & interior

    nhits = jnp.sum(hit.astype(jnp.int32))

    # --- append hits in (y, x) order: iterated min-extraction over a
    # flat-index work buffer, cursor in SMEM (grid steps run
    # sequentially, so the cursor orders appends s-major / y / x)
    @pl.when(nhits > 0)
    def _():
        big = jnp.int32(2 ** 30)
        flat_base = s * (h * w) + by * _BH * w
        work[...] = jnp.where(hit, flat_base + row * w + lane, big)

        def body(n):
            fl = work[...]
            nxt = jnp.min(fl)

            @pl.when(cur[0] < capacity)
            def _():
                idx_ref[pl.ds(cur[0], 1)] = nxt[None]
                cur[0] = cur[0] + 1

            work[...] = jnp.where(fl == nxt, big, fl)
            return n - 1

        jax.lax.while_loop(lambda n: n > 0, body, nhits)
        cur[1] = cur[1] + nhits

    @pl.when(i == s_out * nby - 1)
    def _():
        cnt_ref[0] = cur[0]
        cnt_ref[1] = cur[1]


@partial(jax.jit, static_argnames=("peak_thresh", "capacity", "interpret"))
def detect_compact_pallas(dog: jnp.ndarray, peak_thresh: float,
                          capacity: int, interpret: bool = False):
    """Candidate coordinates of the strict DoG extrema, scan order,
    static capacity.

    dog: [S+2, H, W] float32 (dog_stack output). Returns
    (coords [capacity, 3] int32 rows (s, y, x), valid [capacity] bool,
    n_total int32) — coords/valid bit-identical to
    compact_mask(extrema_mask(dog, peak_thresh), capacity); n_total is
    the full hit count (telemetry: dropped = n_total - capacity when
    positive).
    """
    d, h, w = dog.shape
    s_out = d - 2
    wp = -(-w // _LANES) * _LANES
    nby = -(-h // _BH)
    # zero pad is safe: the interior mask excludes every position whose
    # neighborhood touches the pad
    dog_p = jnp.pad(dog, ((0, 0), (8, 8 + nby * _BH - h), (0, wp - w)))

    kernel = partial(_detect_kernel, h=h, w=w, wp=wp, s_out=s_out,
                     nby=nby, gate=0.8 * peak_thresh, capacity=capacity)
    idx, cnt = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(s_out * nby,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 3, _BH + 16, wp), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SMEM((2,), jnp.int32),
                pltpu.VMEM((_BH, wp), jnp.int32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((capacity,), jnp.int32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ),
        interpret=interpret,
    )(dog_p)
    n_kept = jnp.minimum(cnt[0], capacity)
    valid = jnp.arange(capacity) < n_kept
    idx = jnp.where(valid, idx, 0)
    coords = jnp.stack(jnp.unravel_index(idx, (s_out, h, w)), axis=-1)
    return coords.astype(jnp.int32), valid, cnt[1]
