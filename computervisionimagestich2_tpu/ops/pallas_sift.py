"""Pallas TPU kernels for the per-keypoint SIFT stages (orientation
histograms and descriptors).

Why Pallas here: the XLA formulation (ops/sift_kernels.py) batches every
static keypoint slot densely — [cap, P^2, bins] intermediates hit HBM, and
padding slots (50-85% of the batch on real images) cost as much as real
keypoints. These kernels instead walk the keypoint list as a Pallas grid:

- one keypoint per grid step; steps past the live count skip both the patch
  DMA and the compute (data-dependent early-out XLA cannot express);
- the [P, 128] gradient patch is double-buffered HBM->VMEM with manual
  async copies, so DMA for keypoint i+1 overlaps compute for keypoint i;
- the trilinear descriptor contraction stays entirely in VMEM/registers:
  8 orientation-hat planes + 16 spatial-hat masks + 128 multiply-reduces,
  with lane-one-hot accumulation into the final [1, 128] descriptor row.

Math is identical to vl_sift_calc_keypoint_orientations /
vl_sift_calc_keypoint_descriptor (/root/reference/vl/sift.c:904-1036,
1268-1438) as re-derived in ops/sift_kernels.py; the bilinear orientation
scatter and the trilinear descriptor scatter become hat-function weights
evaluated per (pixel, bin).

Constraints: patch side P = 2*radius+1 must fit one lane tile (P <= 128,
true for every level of the app's 4-octave/2-level configuration); callers
fall back to the XLA path otherwise.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TWO_PI = 2.0 * math.pi
EPSILON_F = 1.19209290e-07   # VL_EPSILON_F
EPSILON_D = 2.220446049250313e-16

_LANES = 128
_NSLOTS = 2   # patch DMA pipeline depth; 4 measured no better (RESULTS r2f)


def _rows(p: int) -> int:
    """Patch DMA row count: P rounded up to the sublane tile (8), plus one
    extra tile for the tile-alignment residual of the window start."""
    return -(-p // 8) * 8 + 8


def pad_for_patches(plane: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Zero-pad a [H, W] plane for tile-aligned patch DMA.

    Mosaic requires HBM slice offsets and shapes to be tile multiples
    ((8, 128) for f32), so the kernels copy a [rows(P), 256] window whose
    start is the window's top-left rounded DOWN to the tile grid; the
    residual (<8 rows, <128 lanes) is folded into the in-kernel index math.
    Padding covers the worst-case aligned window for any top-left
    (yc, xc), yc in [0, H), xc in [0, W)."""
    p = 2 * radius + 1
    return jnp.pad(plane, ((radius, _rows(p)), (radius, 2 * _LANES - 1)))


def _patch_copy(hbm_ref, yx_ref, k, buf_ref, slot, sem_ref, p: int):
    # yx is packed (y << 16 | x) to halve the SMEM prefetch footprint
    y0a = pl.multiple_of(((yx_ref[k] >> 16) >> 3) << 3, 8)
    x0a = pl.multiple_of(((yx_ref[k] & 0xFFFF) >> 7) << 7, _LANES)
    return pltpu.make_async_copy(
        hbm_ref.at[pl.ds(y0a, _rows(p)), pl.ds(x0a, 2 * _LANES)],
        buf_ref.at[slot], sem_ref.at[slot])


def _patch_copy_pair(hbm_ref, yx_ref, k, buf_ref, slot, sem_ref, p: int):
    """One DMA for BOTH gradient planes: hbm_ref is the [2, Hp, Wp]
    stacked (modulus, angle) field, the copy grabs a [2, rows, 256] window.
    Per grid step this is ONE start + ONE wait (+ one downstream roll on
    the row-stacked view) where the split-plane form paid two of each —
    the walk kernels are step-overhead-bound, not pixel-bound."""
    y0a = pl.multiple_of(((yx_ref[k] >> 16) >> 3) << 3, 8)
    x0a = pl.multiple_of(((yx_ref[k] & 0xFFFF) >> 7) << 7, _LANES)
    return pltpu.make_async_copy(
        hbm_ref.at[:, pl.ds(y0a, _rows(p)), pl.ds(x0a, 2 * _LANES)],
        buf_ref.at[slot], sem_ref.at[slot])


def _hat(v):
    return jnp.maximum(0.0, 1.0 - jnp.abs(v))


def _hat_circular(v, n: int):
    d = jnp.abs(v)
    d = jnp.minimum(d, n - d)
    return jnp.maximum(0.0, 1.0 - d)


# ------------------------------------------------------------- descriptors
def _desc_kernel(nv_ref, yx_ref, par_ref, grad_hbm,
                 desc_ref, pg, sems, acc, *,
                 radius: int, w: int, h: int, magnif: float,
                 window_size: float, nbp: int, nbo: int):
    i = pl.program_id(0)
    nv = nv_ref[0]
    p = 2 * radius + 1

    # _NSLOTS-deep prefetch (parametric; depth 4 measured the same as 2
    # on v5e — the walk is compute/store-bound, not DMA-latency-bound)
    @pl.when((i == 0) & (nv > 0))
    def _():
        for k in range(_NSLOTS - 1):
            @pl.when(k < nv)
            def _():
                _patch_copy_pair(grad_hbm, yx_ref, k, pg, k % _NSLOTS,
                                 sems, p).start()

    @pl.when(i + _NSLOTS - 1 < nv)
    def _():
        nxt = (i + _NSLOTS - 1) % _NSLOTS
        _patch_copy_pair(grad_hbm, yx_ref, i + _NSLOTS - 1, pg, nxt,
                         sems, p).start()

    # zero the whole output once; dead steps (i >= nv) then cost ~nothing
    @pl.when(i == 0)
    def _():
        desc_ref[...] = jnp.zeros_like(desc_ref)

    @pl.when(i < nv)
    def _():
        slot = i % _NSLOTS
        _patch_copy_pair(grad_hbm, yx_ref, i, pg, slot, sems, p).wait()

        x = par_ref[i, 0]
        y = par_ref[i, 1]
        sigma = par_ref[i, 2]
        ang0 = par_ref[i, 3]
        okf = par_ref[i, 4]
        yi0 = yx_ref[i] >> 16
        xi0 = yx_ref[i] & 0xFFFF
        yif = jnp.float32(yi0)
        xif = jnp.float32(xi0)

        dy0 = yi0 - ((yi0 >> 3) << 3)
        dx0 = xi0 - ((xi0 >> 7) << 7)
        # rotate the lane-alignment residual away: the window then starts
        # at lane 0 and fits p <= 128 lanes, so every elementwise/reduce op
        # below runs on half the lanes of the raw DMA buffer. ONE roll on
        # the row-stacked [2*rows, 256] view covers both planes (the shift
        # is identical); the reshape is a leading-dim collapse, free.
        shift = jax.lax.rem(2 * _LANES - dx0, 2 * _LANES)
        both = pltpu.roll(
            pg[slot].reshape(2 * _rows(p), 2 * _LANES), shift, axis=1)
        m = both[:_rows(p), :_LANES]
        a = both[_rows(p):, :_LANES]

        col = jax.lax.broadcasted_iota(jnp.int32, (_rows(p), _LANES), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (_rows(p), _LANES), 0)
        cr = col                        # col relative to the window start
        rr = row - dy0
        dxi = cr.astype(jnp.float32) - radius
        dyi = rr.astype(jnp.float32) - radius

        st0 = jnp.sin(ang0)
        ct0 = jnp.cos(ang0)
        sbp = magnif * sigma + EPSILON_D
        wr = jnp.floor(math.sqrt(2.0) * sbp * (nbp + 1) / 2.0 + 0.5)

        # pixel loop bounds (sift.c:1352-1357) + the 128-lane patch overhang
        sel = ((cr >= 0) & (cr < p) & (rr >= 0) & (rr < p)
               & (dxi >= jnp.maximum(-wr, 1.0 - xif))
               & (dxi <= jnp.minimum(wr, w - xif - 2.0))
               & (dyi >= jnp.maximum(-wr, 1.0 - yif))
               & (dyi <= jnp.minimum(wr, h - yif - 2.0)))

        dx = xif + dxi - x
        dy = yif + dyi - y
        nx = (ct0 * dx + st0 * dy) / sbp
        ny = (-st0 * dx + ct0 * dy) / sbp
        nt = nbo * jnp.mod(a - ang0, TWO_PI) / TWO_PI

        win = jnp.exp(-(nx * nx + ny * ny)
                      / (2.0 * window_size * window_size))
        base = jnp.where(sel, win * m, 0.0)

        planes = [base * _hat_circular(nt - t, nbo) for t in range(nbo)]

        # per-bin LANE-PARTIAL sums land as rows of the [128, 128] acc
        # scratch (a cheap sublane reduce per bin); ONE ones-matmul then
        # collapses the lane axis for all 128 bins at once — this replaces
        # a full cross-lane reduce + one-hot select PER BIN (the previous
        # loop body was ~5x the cost of the multiply it wrapped).
        # The nbo partial rows of one spatial cell are stored TOGETHER:
        # bin ids (byi*nbp+bxi)*nbo + t are consecutive over t, so each
        # store is a sublane-tile-aligned [nbo, 128] block instead of nbo
        # separate (1, 128) read-modify-write stores (nbo == 8 == the f32
        # sublane tile; unaligned single-row stores measured ~100 us each
        # when they are the only work in a grid step)
        half = nbp // 2
        for byi in range(nbp):
            hy = _hat(ny - (byi - half + 0.5))
            for bxi in range(nbp):
                ws = hy * _hat(nx - (bxi - half + 0.5))
                cell = (byi * nbp + bxi) * nbo
                acc[pl.ds(cell, nbo), :] = jnp.concatenate(
                    [jnp.sum(ws * planes[t], axis=0, keepdims=True)
                     for t in range(nbo)], axis=0)
        ones = jnp.ones((1, _LANES), jnp.float32)
        dvec = jax.lax.dot_general(ones, acc[...], (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

        # RAW bin sums only — the normalize/clamp/renormalize tail
        # (vl/sift.c:1420-1438) runs in XLA over the whole [N, 128] batch
        # afterward: in-kernel it was two cross-lane reduces + rsqrts on a
        # single (1, 128) row, pure serial latency that measured ~0.5 us of
        # the ~1.25 us step (ablation bisect, RESULTS round-2f)
        desc_ref[pl.ds(i, 1), :] = jnp.where(okf > 0, dvec, 0.0)


@partial(jax.jit, static_argnames=("radius", "w", "h", "magnif",
                                   "window_size", "nbp", "nbo", "interpret"))
def descriptors_pallas(mod_pad: jnp.ndarray, ang_pad: jnp.ndarray,
                       x: jnp.ndarray, y: jnp.ndarray, sigma: jnp.ndarray,
                       angle: jnp.ndarray, n_valid: jnp.ndarray,
                       w: int, h: int, radius: int, magnif: float = 3.0,
                       window_size: float = 2.0, nbp: int = 4, nbo: int = 8,
                       interpret: bool = False):
    """Descriptor batch on the keypoint-walk Pallas kernel.

    mod_pad/ang_pad: ``pad_for_patches(plane, radius)`` of one gradient
    level. x/y/sigma/angle: [N] octave-local keypoint lists, valid-prefix
    compacted; n_valid: [1] int32 live count. Returns (desc [N, 128],
    ok [N] bool) — same contract as ops.sift_kernels.descriptors.
    """
    n = x.shape[0]
    p = 2 * radius + 1
    assert p <= _LANES, "patch exceeds one lane tile; use the XLA path"
    assert nbp * nbp * nbo == _LANES

    xi = jnp.floor(x + 0.5).astype(jnp.int32)
    yi = jnp.floor(y + 0.5).astype(jnp.int32)
    xi_c = jnp.clip(xi, 0, w - 1)
    yi_c = jnp.clip(yi, 0, h - 1)
    ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h - 1)
    yx = (yi_c << 16) | xi_c
    par = jnp.stack([x, y, sigma, angle, ok.astype(jnp.float32),
                     jnp.zeros_like(x), jnp.zeros_like(x),
                     jnp.zeros_like(x)], axis=-1)

    kernel = partial(_desc_kernel, radius=radius, w=w, h=h, magnif=magnif,
                     window_size=window_size, nbp=nbp, nbo=nbo)
    # stack the two planes on a MAJOR dim (cheap HBM copy) so each grid
    # step issues one [2, rows, 256] DMA instead of two
    grad_pad = jnp.stack([mod_pad, ang_pad])
    desc = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((_NSLOTS, 2, _rows(p), 2 * _LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((_NSLOTS,)),
                pltpu.VMEM((_LANES, _LANES), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n, _LANES), jnp.float32),
        interpret=interpret,
    )(n_valid, yx, par, grad_pad)
    # batched normalize/clamp/renormalize (vl/sift.c:1420-1438) — same
    # op order as the old in-kernel tail; zero rows stay zero
    norm1 = jnp.sqrt(jnp.sum(desc * desc, axis=1, keepdims=True)) + EPSILON_F
    d = jnp.minimum(desc / norm1, 0.2)
    norm2 = jnp.sqrt(jnp.sum(d * d, axis=1, keepdims=True)) + EPSILON_F
    desc = d / norm2
    slot_live = jnp.arange(n) < n_valid[0]
    return desc, ok & slot_live


# ------------------------------------------------------------ orientations
def _ori_kernel(nv_ref, yx_ref, par_ref, grad_hbm, hist_ref,
                pg, sems, acc, *, radius: int, w: int, h: int,
                n_bins: int, winf: float):
    i = pl.program_id(0)
    nv = nv_ref[0]
    p = 2 * radius + 1

    # _NSLOTS-deep prefetch — see _desc_kernel
    @pl.when((i == 0) & (nv > 0))
    def _():
        for k in range(_NSLOTS - 1):
            @pl.when(k < nv)
            def _():
                _patch_copy_pair(grad_hbm, yx_ref, k, pg, k % _NSLOTS,
                                 sems, p).start()

    @pl.when(i + _NSLOTS - 1 < nv)
    def _():
        nxt = (i + _NSLOTS - 1) % _NSLOTS
        _patch_copy_pair(grad_hbm, yx_ref, i + _NSLOTS - 1, pg, nxt,
                         sems, p).start()

    # zero the whole output once; dead steps (i >= nv) then cost ~nothing
    @pl.when(i == 0)
    def _():
        hist_ref[...] = jnp.zeros_like(hist_ref)

    @pl.when(i < nv)
    def _():
        slot = i % _NSLOTS
        _patch_copy_pair(grad_hbm, yx_ref, i, pg, slot, sems, p).wait()

        x = par_ref[i, 0]
        y = par_ref[i, 1]
        sigma = par_ref[i, 2]
        okf = par_ref[i, 3]
        yi0 = yx_ref[i] >> 16
        xi0 = yx_ref[i] & 0xFFFF
        yif = jnp.float32(yi0)
        xif = jnp.float32(xi0)

        dy0 = yi0 - ((yi0 >> 3) << 3)
        dx0 = xi0 - ((xi0 >> 7) << 7)
        # see _desc_kernel: rotate the residual away, compute on 128 lanes
        shift = jax.lax.rem(2 * _LANES - dx0, 2 * _LANES)
        both = pltpu.roll(
            pg[slot].reshape(2 * _rows(p), 2 * _LANES), shift, axis=1)
        m = both[:_rows(p), :_LANES]
        a = both[_rows(p):, :_LANES]

        col = jax.lax.broadcasted_iota(jnp.int32, (_rows(p), _LANES), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (_rows(p), _LANES), 0)
        cr = col                        # col relative to the window start
        rr = row - dy0
        dxi = cr.astype(jnp.float32) - radius
        dyi = rr.astype(jnp.float32) - radius

        dx = (xif + dxi) - x
        dy = (yif + dyi) - y
        r2 = dx * dx + dy * dy

        sigmaw = winf * sigma
        wr = jnp.maximum(jnp.floor(3.0 * sigmaw), 1.0)
        img_x = xif + dxi
        img_y = yif + dyi
        sel = ((cr >= 0) & (cr < p) & (rr >= 0) & (rr < p)
               & (jnp.abs(dxi) <= wr) & (jnp.abs(dyi) <= wr)
               & (img_x >= 0) & (img_x <= w - 1)
               & (img_y >= 0) & (img_y <= h - 1)
               & (r2 < wr * wr + 0.6))

        wgt = jnp.exp(-r2 / (2.0 * sigmaw * sigmaw))
        mw = jnp.where(sel, m * wgt, 0.0) * okf

        # see _desc_kernel: per-bin lane-partial rows + one matmul reduce,
        # stored 8 bins (one f32 sublane tile) per aligned block store
        # (output lanes >= n_bins carry scratch garbage — bins past n_bins
        # in the last block included; the caller slices them away)
        fbin = n_bins * a / TWO_PI - 0.5
        for g in range(0, n_bins, 8):
            acc[pl.ds(g, 8), :] = jnp.concatenate(
                [jnp.sum(mw * _hat_circular(fbin - (g + k), n_bins),
                         axis=0, keepdims=True) for k in range(8)], axis=0)
        ones = jnp.ones((1, _LANES), jnp.float32)
        hist_ref[pl.ds(i, 1), :] = jax.lax.dot_general(
            ones, acc[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("radius", "w", "h", "n_bins", "winf",
                                   "interpret"))
def orientation_hist_pallas(mod_pad: jnp.ndarray, ang_pad: jnp.ndarray,
                            x: jnp.ndarray, y: jnp.ndarray,
                            sigma: jnp.ndarray, n_valid: jnp.ndarray,
                            w: int, h: int, radius: int, n_bins: int = 36,
                            winf: float = 1.5, interpret: bool = False):
    """Raw [N, n_bins] orientation histograms (pre-smoothing). Returns
    (hist, ok). Smoothing and peak extraction stay in XLA ([N, 36] work).
    """
    n = x.shape[0]
    p = 2 * radius + 1
    assert p <= _LANES, "patch exceeds one lane tile; use the XLA path"
    assert n_bins <= _LANES

    xi = jnp.floor(x + 0.5).astype(jnp.int32)
    yi = jnp.floor(y + 0.5).astype(jnp.int32)
    ok = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
    xi_c = jnp.clip(xi, 0, w - 1)
    yi_c = jnp.clip(yi, 0, h - 1)
    yx = (yi_c << 16) | xi_c
    par = jnp.stack([x, y, sigma, ok.astype(jnp.float32)], axis=-1)

    kernel = partial(_ori_kernel, radius=radius, w=w, h=h, n_bins=n_bins,
                     winf=winf)
    grad_pad = jnp.stack([mod_pad, ang_pad])
    hist = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((_NSLOTS, 2, _rows(p), 2 * _LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((_NSLOTS,)),
                pltpu.VMEM((_LANES, _LANES), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n, _LANES), jnp.float32),
        interpret=interpret,
    )(n_valid, yx, par, grad_pad)
    return hist[:, :n_bins], ok
