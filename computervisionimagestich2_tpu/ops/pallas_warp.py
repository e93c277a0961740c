"""Pallas TPU kernel: one-hot-matmul inverse warp (the scaled-warp path).

The per-edge composite warps the next image onto the growing canvas
(warpingImageByHomography, /root/reference/ImageProcess.cpp:596-606). The
XLA form is a per-pixel point gather (~9 ns/element on TPU: 25-56 ms per
edge at 1080p-panorama canvases — measured round 3), and the shift-select
banded kernel (ops.warp.warp_image_banded) only covers near-translation
warps: real registrations carry an x-scale far from 1 at canvas distance
(the bilinear xy term contributes |c2|*y ~ 0.5 px/px at y~2000), so its
band requirement explodes to ~60 px and every 1080p edge fell back to the
gather.

This kernel handles ARBITRARY bilinear-warp scale at ~0.5 ns/px:

- The host planner (onehot_warp_params) evaluates the warp at every output
  tile's corners (the warp is bilinear in (x, y), so per-tile extrema sit
  on corners) and emits per-tile SOURCE WINDOW starts, aligned to the
  (8, 128) tile grid, as a scalar-prefetch array — plus three static
  bounds: window rows/lanes (winr, winc) and the per-output-row vertical
  trunc spread d (the y-coordinate varies by <= d-1 source rows along one
  output row).
- Each grid step DMAs one [C, winr, winc] window HBM->VMEM (double-
  buffered: the copy for tile t+1 overlaps tile t's compute).
- Per output row, the source row index is resolved among d candidates and
  the x gather becomes a ONE-HOT MATMUL: oh[k, j] = (k == nx_rel[j]) for
  the row's valid lanes, then [C, winc] @ [winc, tc] on the MXU picks
  win[ny, nx] for all channels and lanes at once. Compares are VPU
  elementwise ([winc, tc] per (row, candidate)), ~100x less time than the
  per-element gather.

Semantics are IDENTICAL to ops.warp.warp_image (f32 warp evaluation in the
same operation order, C-style trunc-to-int reads, zeros outside the source
bounds) — property-tested against it in tests/test_pallas_warp.py.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TR = 8     # output tile rows
_TC = 128   # output tile lanes


def onehot_warp_params(coeffs, out_shape, offset_x: float, offset_y: float,
                       src_shape, model: str = "bilinear",
                       max_winc: int = 1024, max_d: int = 8):
    """Host-side planner. Returns (starts [T, 2] int32, winr, winc, d) or
    None when the warp is outside this kernel's envelope (projective model,
    x-span past max_winc, or vertical per-row spread past max_d — the
    caller falls back to the gather form)."""
    if model != "bilinear":
        return None
    c = np.asarray(coeffs, np.float64)
    h_out, w_out = out_shape
    src_h, src_w = src_shape[0], src_shape[1]
    nti = -(-h_out // _TR)
    ntj = -(-w_out // _TC)

    # tile corner grid: [nti, ntj, 4]
    off_i = np.array([0.0, 0.0, _TR - 1.0, _TR - 1.0])
    off_j = np.array([0.0, _TC - 1.0, 0.0, _TC - 1.0])
    i0 = np.arange(nti, dtype=np.float64)[:, None, None] * _TR
    j0 = np.arange(ntj, dtype=np.float64)[None, :, None] * _TC
    ys = i0 + off_i[None, None, :] + offset_y
    xs = j0 + off_j[None, None, :] + offset_x
    ys = np.broadcast_to(ys, (nti, ntj, 4))
    xs = np.broadcast_to(xs, (nti, ntj, 4))
    xw = c[0] * xs + c[1] * ys + c[2] * xs * ys + c[3]
    yw = c[4] * xs + c[5] * ys + c[6] * xs * ys + c[7]
    # trunc with 1 px slack each side for f32-vs-f64 evaluation drift
    # (un-clipped extrema first: they also decide per-tile LIVENESS — a
    # tile whose whole source window misses the image produces only zeros,
    # so the kernel skips its DMA and matmuls; at panorama canvases the
    # incoming image covers a minority of tiles)
    tx_lo = np.trunc(xw).min(-1) - 1
    tx_hi = np.trunc(xw).max(-1) + 1
    ty_lo = np.trunc(yw).min(-1) - 1
    ty_hi = np.trunc(yw).max(-1) + 1
    live = ((tx_hi >= 0) & (tx_lo <= src_w - 1)
            & (ty_hi >= 0) & (ty_lo <= src_h - 1))
    nx_lo = np.clip(tx_lo, 0, src_w - 1)
    nx_hi = np.clip(tx_hi, 0, src_w - 1)
    ny_lo = np.clip(ty_lo, 0, src_h - 1)
    ny_hi = np.clip(ty_hi, 0, src_h - 1)

    sy = (ny_lo.astype(np.int64) >> 3) << 3            # sublane-aligned
    sx = (nx_lo.astype(np.int64) >> 7) << 7            # lane-aligned
    # window bounds from LIVE tiles only (dead tiles never slice)
    if live.any():
        winr = int(np.max((ny_hi - sy)[live])) + 1
        winc = int(np.max((nx_hi - sx)[live])) + 1
    else:
        winr = winc = 1
    winr = -(-winr // 8) * 8
    winc = -(-winc // 128) * 128
    if winc > max_winc:
        return None

    # per-output-row vertical spread: yw is linear in x along a row, so the
    # row extrema sit on the row's endpoints — the tile-corner values bound
    # every row in the tile. Spread = trunc range across one row.
    ys_r = ys[..., :2]                                  # rows of the tile
    xs_r = xs[..., :2]
    yw_row0 = c[4] * xs_r + c[5] * ys_r + c[6] * xs_r * ys_r + c[7]
    row_spread = np.abs(np.trunc(yw_row0[..., 0]) - np.trunc(yw_row0[..., 1]))
    d = int(row_spread[live].max() if live.any() else 0.0) + 2  # + slack
    if d > max_d:
        return None

    # packable-range guard (ADVICE r4): the (sy << 16) | sx word holds
    # sy in bits 16-30 and sx in bits 7-15 below it — a source taller
    # than 2^15 rows or wider than 2^16 px would silently corrupt the
    # unpack. Fall back to the gather warp instead of corrupting.
    if src_h > (1 << 15) or src_w > (1 << 16):
        return None

    # one packed int32 per tile: (sy << 16) | sx | live — sx is lane-
    # aligned so its low 7 bits are free; bit 0 carries the tile's
    # liveness. (A [T, 2] scalar-prefetch operand gets tile-padded past
    # the 1 MB SMEM budget at panorama canvas tile counts; the packed
    # form is a flat [T] vector.)
    starts = ((sy.astype(np.int32) << 16) | sx.astype(np.int32)
              | live.astype(np.int32)).reshape(-1)
    return jnp.asarray(starts), winr, winc, d


def _kernel(starts_ref, par_ref, src_hbm, out_ref, win, sems, *,
            winr: int, winc: int, d: int, nch: int, ntj: int,
            n_tiles: int, src_h: int, src_w: int):
    t = pl.program_id(0)

    def copy(tt, slot):
        sy = pl.multiple_of(starts_ref[tt] >> 16, 8)
        sx = pl.multiple_of(starts_ref[tt] & 0xFF80, 128)
        return pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(sy, winr), pl.ds(sx, winc)],
            win.at[slot], sems.at[slot])

    def live(tt):
        return (starts_ref[tt] & 1) == 1

    # dead tiles (source window wholly off-image) skip DMA and matmuls and
    # only write zeros — at panorama canvases the incoming image covers a
    # minority of tiles, so most steps take this ~free path
    @pl.when((t == 0) & live(0))
    def _():
        copy(0, 0).start()

    # start next tile's window copy (overlaps this tile's compute); the
    # liveness read of t+1 happens only under the bounds guard
    @pl.when(t + 1 < n_tiles)
    def _():
        @pl.when(live(t + 1))
        def _():
            copy(t + 1, (t + 1) % 2).start()

    @pl.when(~live(t))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(live(t))
    def _():
        copy(t, t % 2).wait()

        # exact warp_image math: f32 iota + offset, warp_xy ops, trunc
        ti = t // ntj
        tj = t - ti * ntj
        rows = jax.lax.broadcasted_iota(jnp.int32, (_TR, _TC), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (_TR, _TC), 1)
        ys = (rows + ti * _TR).astype(jnp.float32) + par_ref[0, 9]
        xs = (cols + tj * _TC).astype(jnp.float32) + par_ref[0, 8]
        c = [par_ref[0, k] for k in range(8)]
        xw = c[0] * xs + c[1] * ys + c[2] * xs * ys + c[3]
        yw = c[4] * xs + c[5] * ys + c[6] * xs * ys + c[7]
        nx = jnp.trunc(xw).astype(jnp.int32)
        ny = jnp.trunc(yw).astype(jnp.int32)
        valid = (nx >= 0) & (nx < src_w) & (ny >= 0) & (ny < src_h)
        nyr = ny - (starts_ref[t] >> 16)
        nxr = nx - (starts_ref[t] & 0xFF80)

        kio = jax.lax.broadcasted_iota(jnp.int32, (winc, _TC), 0)
        slot = t % 2
        for r in range(_TR):
            vr = valid[r]                               # [TC]
            # row base among the d candidate source rows (valid lanes only)
            base = jnp.min(jnp.where(vr, nyr[r], jnp.int32(winr)))
            base = jnp.clip(base, 0, winr - d)
            acc = jnp.zeros((nch, _TC), jnp.float32)
            for dd in range(d):
                sel = vr & (nyr[r] == base + dd)        # [TC]
                oh = ((kio == nxr[r][None, :])
                      & sel[None, :]).astype(jnp.float32)
                # dynamic sublane read of the candidate source row
                wrow = win[slot, :, pl.ds(base + dd, 1), :][:, 0, :]
                acc = acc + jax.lax.dot_general(
                    wrow, oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            out_ref[:, r, :] = acc


@functools.partial(jax.jit, static_argnames=("out_shape", "winr", "winc",
                                             "d", "interpret"))
def warp_image_onehot(src: jnp.ndarray, coeffs: jnp.ndarray,
                      offset_x, offset_y, out_shape: tuple[int, int],
                      starts: jnp.ndarray, winr: int, winc: int, d: int,
                      interpret: bool = False) -> jnp.ndarray:
    """Gather-free warp_image for arbitrary-scale bilinear warps.

    src [H, W, C] f32; starts/winr/winc/d from onehot_warp_params (host-
    validated for THESE coeffs/offsets/shapes). Returns [h_out, w_out, C]
    with zeros where the warp leaves the source (warp_image semantics on a
    fresh canvas)."""
    h_out, w_out = out_shape
    src_h, src_w, nch = src.shape
    nti = -(-h_out // _TR)
    ntj = -(-w_out // _TC)
    n_tiles = nti * ntj

    # channels-first + pad so every aligned window slice is in range
    src_cf = jnp.moveaxis(src, -1, 0)
    src_pad = jnp.pad(src_cf, ((0, 0), (0, winr + 8), (0, winc + 128)))

    par = jnp.zeros((1, 128), jnp.float32)
    par = par.at[0, :8].set(coeffs[:8])
    par = par.at[0, 8].set(jnp.asarray(offset_x, jnp.float32))
    par = par.at[0, 9].set(jnp.asarray(offset_y, jnp.float32))

    kern = functools.partial(_kernel, winr=winr, winc=winc, d=d, nch=nch,
                             ntj=ntj, n_tiles=n_tiles, src_h=src_h,
                             src_w=src_w)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 128), lambda t, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (nch, _TR, _TC), lambda t, s: (0, t // ntj, t % ntj),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, nch, winr, winc), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nch, nti * _TR, ntj * _TC),
                                       jnp.float32),
        interpret=interpret,
    )(starts, par, src_pad)
    return jnp.moveaxis(out, 0, -1)[:h_out, :w_out]
