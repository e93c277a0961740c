"""Pallas TPU kernels for the per-keypoint SIFT stages (orientation
histograms and descriptors).

Why Pallas here: the XLA formulation (ops/sift_kernels.py) batches every
static keypoint slot densely — [cap, P^2, bins] intermediates hit HBM, and
padding slots (50-85% of the batch on real images) cost as much as real
keypoints. These kernels instead walk the keypoint list as a Pallas grid.

Round-3 redesign — K keypoints per grid step, LANE-PACKED at stride P:

- each grid step processes K = floor(256 / P) keypoints (P = 2*radius+1,
  the patch side); keypoint k's [P, P] window is rolled to lanes
  [k*P, (k+1)*P) of shared [rows, 256] compute arrays. Every elementwise
  op, hat-plane, sublane reduce, and acc store then covers K keypoints at
  once — the round-2 one-keypoint walk spent 128 lanes per keypoint
  regardless of P (0.85-0.9 us/keypoint of step overhead against ~0.3 us
  of math), and the orientation patch at octave level 0 is only 35 lanes
  wide (K=7).
- per-keypoint scalar parameters become [1, 256] per-LANE parameter rows
  (built once per step from the lane->keypoint band map); the big arrays
  broadcast against them for free.
- patches are double-buffered HBM->VMEM with manual async copies (one
  [2, rows, 256] copy per keypoint covering both gradient planes), so DMA
  for step i+1 overlaps compute for step i;
- the trilinear descriptor contraction stays entirely in VMEM/registers:
  per-bin LANE-PARTIAL sums land as [8, 256] aligned acc blocks, and ONE
  [K, 256] band-mask matmul collapses each keypoint's lane band for all
  128 bins at once.

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
_NSLOTS = 2   # DMA pipeline depth; 4 measured no better (RESULTS r2f)
# pack bound: VMEM scratch and DMA-semaphore count scale with it; 12 keeps
# the scratch under ~1.5 MB at the smallest patches (where 256/P exceeds
# the old cap of 8 — the round-4 small-radius ori/desc buckets)
_MAX_PACK = 12


def _rows(p: int) -> int:
    """Patch DMA row count: the window occupies rows [dy0, dy0 + P) of the
    copy with dy0 in [0, 8) (the tile-alignment residual of the window
    start), so ceil((P + 7) / 8) sublane tiles always cover it. (The
    round-3 form rounded P up to a tile and then added a whole extra tile —
    one 8-row tile of pure dead compute for every odd P, 8-12% of the walk
    at the app's patch sizes.)"""
    return -(-(p + 7) // 8) * 8


def _pack(p: int) -> int:
    """Keypoints lane-packed per grid step at stride p."""
    return max(1, min(2 * _LANES // p, _MAX_PACK))


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
    """One DMA for BOTH gradient planes of ONE keypoint: hbm_ref is the
    [2, Hp, Wp] stacked (modulus, angle) field, the copy grabs a
    [2, rows, 256] window. One start + one wait per keypoint."""
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


def _walk_pipeline(i, nv, yx_ref, grad_hbm, pg, sems, p: int, kpk: int):
    """Shared DMA pipeline: prefetch the first _NSLOTS-1 keypoint groups at
    step 0, start group i+_NSLOTS-1, wait on step i's own K copies."""
    @pl.when((i == 0) & (nv > 0))
    def _():
        for g in range(_NSLOTS - 1):
            for j in range(kpk):
                @pl.when(kpk * g + j < nv)
                def _():
                    _patch_copy(grad_hbm, yx_ref, kpk * g + j, pg,
                                (g % _NSLOTS) * kpk + j, sems, p).start()

    gnxt = i + _NSLOTS - 1
    for j in range(kpk):
        @pl.when(kpk * gnxt + j < nv)
        def _():
            _patch_copy(grad_hbm, yx_ref, kpk * gnxt + j, pg,
                        (gnxt % _NSLOTS) * kpk + j, sems, p).start()


def _walk_gather(i, nv, yx_ref, grad_hbm, pg, sems, p: int, kpk: int):
    """Wait on step i's K patch copies, roll each keypoint's window to its
    lane band [k*p, (k+1)*p), and combine into one [rows, 256] pair of
    gradient planes. Returns (m, a, live list, clamped slot index list,
    dy0 scalars, dx-row builder input)."""
    base = kpk * i
    lives, kidx, dy0s = [], [], []
    for k in range(kpk):
        live = (base + k) < nv
        lives.append(live)
        kidx.append(jnp.where(live, base + k, base))

    for k in range(kpk):
        @pl.when(lives[k])
        def _():
            _patch_copy(grad_hbm, yx_ref, base + k, pg,
                        (i % _NSLOTS) * kpk + k, sems, p).wait()

    grp = (i % _NSLOTS) * kpk
    both = None
    lane2 = jax.lax.broadcasted_iota(
        jnp.int32, (2 * _rows(p), 2 * _LANES), 1)
    for k in range(kpk):
        yx = yx_ref[kidx[k]]
        yi0, xi0 = yx >> 16, yx & 0xFFFF
        dy0s.append(yi0 - ((yi0 >> 3) << 3))
        dx0 = xi0 - ((xi0 >> 7) << 7)
        # roll keypoint k's window from its DMA residual to lane k*p
        shift = jax.lax.rem(2 * _LANES + k * p - dx0, 2 * _LANES)
        rolled = pltpu.roll(
            pg[grp + k].reshape(2 * _rows(p), 2 * _LANES), shift, axis=1)
        if k == 0:
            # un-DMA'd dead-slot scratch may hold NaNs; zero those lanes
            both = jnp.where(lives[0], rolled, 0.0)
        else:
            sel = (lane2 >= k * p) & lives[k]
            both = jnp.where(sel, rolled, both)
    m = both[:_rows(p), :]
    a = both[_rows(p):, :]
    return m, a, lives, kidx, dy0s


def _band_rows(p: int, kpk: int):
    """Lane->keypoint band map as [1, 256] rows: band index (clamped to
    kpk-1 for the tail) and the in-band column cr = lane - band*p."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * _LANES), 1)
    band = jnp.zeros_like(lane)
    for k in range(1, kpk):
        band = band + (lane >= k * p).astype(jnp.int32)
    cr = lane - band * p
    return band, cr


def _prow(band, vals):
    """Per-lane [1, 256] parameter row from kpk per-keypoint scalars."""
    out = jnp.zeros(band.shape, jnp.float32) + vals[0]
    for k in range(1, len(vals)):
        out = jnp.where(band == k, vals[k], out)
    return out


def _band_mask_matrix(p: int, kpk: int):
    """[kpk, 256] 0/1 matrix selecting each keypoint's lane band — the
    matmul operand that collapses the lane axis of the acc scratch into
    kpk result rows at once."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (kpk, 2 * _LANES), 1)
    krow = jax.lax.broadcasted_iota(jnp.int32, (kpk, 2 * _LANES), 0)
    d = lane - krow * p
    return ((d >= 0) & (d < p)).astype(jnp.float32)


# ------------------------------------------------------------- descriptors
def _desc_kernel(nv_ref, yx_ref, par_ref, grad_hbm,
                 desc_ref, pg, sems, acc, *,
                 radius: int, w: int, h: int, magnif: float,
                 window_size: float, nbp: int, nbo: int, kpk: int,
                 walk_dtype: str = "f32"):
    i = pl.program_id(0)               # keypoints kpk*i .. kpk*i + kpk - 1
    nv = nv_ref[0]
    p = 2 * radius + 1

    _walk_pipeline(i, nv, yx_ref, grad_hbm, pg, sems, p, kpk)

    # zero the whole output once; dead steps then cost ~nothing
    @pl.when(i == 0)
    def _():
        desc_ref[...] = jnp.zeros_like(desc_ref)

    @pl.when(kpk * i < nv)
    def _():
        m, a, lives, kidx, dy0s = _walk_gather(
            i, nv, yx_ref, grad_hbm, pg, sems, p, kpk)
        band, crd = _band_rows(p, kpk)

        def pr(col):
            return _prow(band, [par_ref[kx, col] for kx in kidx])

        x = pr(0)
        y = pr(1)
        sigma = pr(2)
        ang0 = pr(3)
        okf = [par_ref[kx, 4] * lv.astype(jnp.float32)
               for kx, lv in zip(kidx, lives)]
        xif = _prow(band, [jnp.float32(yx_ref[kx] & 0xFFFF) for kx in kidx])
        yif = _prow(band, [jnp.float32(yx_ref[kx] >> 16) for kx in kidx])
        dy0 = _prow(band, [jnp.float32(v) for v in dy0s])

        row = jax.lax.broadcasted_iota(
            jnp.int32, (_rows(p), 2 * _LANES), 0).astype(jnp.float32)
        rr = row - dy0                                   # [rows, 256]
        dxi = crd.astype(jnp.float32) - radius           # [1, 256]
        dyi = rr - radius

        st0 = jnp.sin(ang0)
        ct0 = jnp.cos(ang0)
        sbp = magnif * sigma + EPSILON_D
        wr = jnp.floor(math.sqrt(2.0) * sbp * (nbp + 1) / 2.0 + 0.5)

        # pixel loop bounds (sift.c:1352-1357) + the lane-band overhang
        # (cr >= p lanes belong to no keypoint; rr bounds cover rows)
        self_x = ((crd < p)
                  & (dxi >= jnp.maximum(-wr, 1.0 - xif))
                  & (dxi <= jnp.minimum(wr, w - xif - 2.0)))  # [1, 256]
        sel = (self_x & (rr >= 0) & (rr < p)
               & (dyi >= jnp.maximum(-wr, 1.0 - yif))
               & (dyi <= jnp.minimum(wr, h - yif - 2.0)))

        dx = xif + dxi - x                               # [1, 256]
        dy = yif + dyi - y                               # [rows, 256]
        nx = (ct0 * dx + st0 * dy) / sbp
        ny = (-st0 * dx + ct0 * dy) / sbp
        nt = nbo * jnp.mod(a - ang0, TWO_PI) / TWO_PI

        win = jnp.exp(-(nx * nx + ny * ny)
                      / (2.0 * window_size * window_size))
        base = jnp.where(sel, win * m, 0.0)

        # optional reduced-precision weight chain: the hat products and
        # per-bin row reduces are the walk's VPU wall (128 mul+reduce
        # passes over [rows, 256]); bf16 packs 2 elements per lane
        # ((16, 128) vreg tiling) so the pass count halves. Coordinates,
        # rotation, window, and selection stay f32 — only the WEIGHT
        # arithmetic (hats, products, bin sums) drops precision, ~0.5%
        # on raw bins before the L2 normalize. Opt-in via walk_dtype.
        wdt = jnp.bfloat16 if walk_dtype == "bf16" else jnp.float32
        base_w = base.astype(wdt)
        nx_w = nx.astype(wdt)
        ny_w = ny.astype(wdt)
        nt_w = nt.astype(wdt)
        planes = [base_w * _hat_circular(nt_w - wdt(t), nbo)
                  for t in range(nbo)]

        # per-bin LANE-PARTIAL sums land as rows of the [128, 256] acc
        # scratch (a cheap sublane reduce per bin, ALL packed keypoints per
        # row); ONE band-mask matmul then collapses each keypoint's lane
        # band for all 128 bins at once. The nbo partial rows of one
        # spatial cell are stored TOGETHER as a sublane-tile-aligned
        # [nbo, 256] block (nbo == 8 == the f32 sublane tile).
        half = nbp // 2
        # hoist the x-hats: the old loop re-evaluated _hat(nx - cx) for
        # every byi (12 redundant [rows, 256] hat evaluations per step)
        hxs = [_hat(nx_w - wdt(bxi - half + 0.5)) for bxi in range(nbp)]
        for byi in range(nbp):
            hy = _hat(ny_w - wdt(byi - half + 0.5))
            for bxi in range(nbp):
                ws = hy * hxs[bxi]
                cell = (byi * nbp + bxi) * nbo
                acc[pl.ds(cell, nbo), :] = jnp.concatenate(
                    [jnp.sum(ws * planes[t], axis=0, keepdims=True)
                     for t in range(nbo)], axis=0).astype(jnp.float32)
        dvec = jax.lax.dot_general(
            _band_mask_matrix(p, kpk), acc[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [kpk, 128]

        # RAW bin sums only — the normalize/clamp/renormalize tail
        # (vl/sift.c:1420-1438) runs in XLA over the whole [N, 128] batch
        # afterward (two cross-lane reduces + rsqrts on single rows are
        # pure serial latency in-kernel; RESULTS round-2f ablation)
        okcol = jnp.stack(okf).reshape(kpk, 1)
        desc_ref[pl.ds(kpk * i, kpk), :] = jnp.where(okcol > 0, dvec, 0.0)


@partial(jax.jit, static_argnames=("radius", "w", "h", "magnif",
                                   "window_size", "nbp", "nbo", "interpret",
                                   "walk_dtype"))
def descriptors_pallas(mod_pad: jnp.ndarray, ang_pad: jnp.ndarray,
                       x: jnp.ndarray, y: jnp.ndarray, sigma: jnp.ndarray,
                       angle: jnp.ndarray, n_valid: jnp.ndarray,
                       w: int, h: int, radius: int, magnif: float = 3.0,
                       window_size: float = 2.0, nbp: int = 4, nbo: int = 8,
                       interpret: bool = False, walk_dtype: str = "f32"):
    """Descriptor batch on the lane-packed keypoint-walk Pallas kernel.

    mod_pad/ang_pad: ``pad_for_patches(plane, radius)`` of one gradient
    level. x/y/sigma/angle: [N] octave-local keypoint lists, valid-prefix
    compacted; n_valid: [1] int32 live count. Returns (desc [N, 128],
    ok [N] bool) — same contract as ops.sift_kernels.descriptors.
    """
    n = x.shape[0]
    p = 2 * radius + 1
    assert p <= _LANES, "patch exceeds one lane tile; use the XLA path"
    assert nbp * nbp * nbo == _LANES
    kpk = _pack(p)

    n2 = -(-n // kpk) * kpk          # pad slots to a whole number of steps
    if n2 != n:
        padv = lambda v: jnp.pad(v, (0, n2 - n))
        x, y, sigma, angle = map(padv, (x, y, sigma, angle))

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
                     window_size=window_size, nbp=nbp, nbo=nbo, kpk=kpk,
                     walk_dtype=walk_dtype)
    # stack the two planes on a MAJOR dim (cheap HBM copy) so each keypoint
    # costs one [2, rows, 256] DMA instead of two
    grad_pad = jnp.stack([mod_pad, ang_pad])
    desc = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n2 // kpk,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((kpk * _NSLOTS, 2, _rows(p), 2 * _LANES),
                           jnp.float32),
                pltpu.SemaphoreType.DMA((kpk * _NSLOTS,)),
                pltpu.VMEM((_LANES, 2 * _LANES), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n2, _LANES), jnp.float32),
        interpret=interpret,
    )(n_valid, yx, par, grad_pad)
    desc = desc[:n]
    ok = ok[:n]
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
                n_bins: int, winf: float, kpk: int):
    i = pl.program_id(0)
    nv = nv_ref[0]
    p = 2 * radius + 1

    _walk_pipeline(i, nv, yx_ref, grad_hbm, pg, sems, p, kpk)

    # zero the whole output once; dead steps then cost ~nothing
    @pl.when(i == 0)
    def _():
        hist_ref[...] = jnp.zeros_like(hist_ref)

    @pl.when(kpk * i < nv)
    def _():
        m, a, lives, kidx, dy0s = _walk_gather(
            i, nv, yx_ref, grad_hbm, pg, sems, p, kpk)
        band, crd = _band_rows(p, kpk)

        def pr(col):
            return _prow(band, [par_ref[kx, col] for kx in kidx])

        x = pr(0)
        y = pr(1)
        sigma = pr(2)
        okf = _prow(band, [par_ref[kx, 3] * lv.astype(jnp.float32)
                           for kx, lv in zip(kidx, lives)])
        xif = _prow(band, [jnp.float32(yx_ref[kx] & 0xFFFF) for kx in kidx])
        yif = _prow(band, [jnp.float32(yx_ref[kx] >> 16) for kx in kidx])
        dy0 = _prow(band, [jnp.float32(v) for v in dy0s])

        row = jax.lax.broadcasted_iota(
            jnp.int32, (_rows(p), 2 * _LANES), 0).astype(jnp.float32)
        rr = row - dy0
        dxi = crd.astype(jnp.float32) - radius           # [1, 256]
        dyi = rr - radius

        dx = (xif + dxi) - x                             # [1, 256]
        dy = (yif + dyi) - y                             # [rows, 256]
        r2 = dx * dx + dy * dy

        sigmaw = winf * sigma
        wr = jnp.maximum(jnp.floor(3.0 * sigmaw), 1.0)
        img_x = xif + dxi
        img_y = yif + dyi
        self_x = ((crd < p) & (jnp.abs(dxi) <= wr)
                  & (img_x >= 0) & (img_x <= w - 1))     # [1, 256]
        sel = (self_x & (rr >= 0) & (rr < p)
               & (jnp.abs(dyi) <= wr)
               & (img_y >= 0) & (img_y <= h - 1)
               & (r2 < wr * wr + 0.6))

        wgt = jnp.exp(-r2 / (2.0 * sigmaw * sigmaw))
        mw = jnp.where(sel, m * wgt, 0.0) * okf

        # see _desc_kernel: per-bin lane-partial rows + one matmul reduce,
        # stored 8 bins (one f32 sublane tile) per aligned [8, 256] block
        # (output lanes >= n_bins carry scratch garbage — the caller
        # slices them away)
        fbin = n_bins * a / TWO_PI - 0.5
        for g in range(0, n_bins, 8):
            acc[pl.ds(g, 8), :] = jnp.concatenate(
                [jnp.sum(mw * _hat_circular(fbin - (g + k), n_bins),
                         axis=0, keepdims=True) for k in range(8)], axis=0)
        hist_ref[pl.ds(kpk * i, kpk), :] = jax.lax.dot_general(
            _band_mask_matrix(p, kpk), acc[...], (((1,), (1,)), ((), ())),
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
    kpk = _pack(p)

    n2 = -(-n // kpk) * kpk
    if n2 != n:
        padv = lambda v: jnp.pad(v, (0, n2 - n))
        x, y, sigma = map(padv, (x, y, sigma))

    xi = jnp.floor(x + 0.5).astype(jnp.int32)
    yi = jnp.floor(y + 0.5).astype(jnp.int32)
    ok = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
    xi_c = jnp.clip(xi, 0, w - 1)
    yi_c = jnp.clip(yi, 0, h - 1)
    yx = (yi_c << 16) | xi_c
    par = jnp.stack([x, y, sigma, ok.astype(jnp.float32)], axis=-1)

    kernel = partial(_ori_kernel, radius=radius, w=w, h=h, n_bins=n_bins,
                     winf=winf, kpk=kpk)
    grad_pad = jnp.stack([mod_pad, ang_pad])
    hist = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n2 // kpk,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((kpk * _NSLOTS, 2, _rows(p), 2 * _LANES),
                           jnp.float32),
                pltpu.SemaphoreType.DMA((kpk * _NSLOTS,)),
                pltpu.VMEM((_LANES, 2 * _LANES), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n2, _LANES), jnp.float32),
        interpret=interpret,
    )(n_valid, yx, par, grad_pad)
    return hist[:n, :n_bins], ok[:n]
