"""Bilinear multi-warp as a Pallas TPU kernel built on `tpu.dynamic_gather`.

The banded-MXU warp kernel (ops/pallas_warp.py) replaces XLA's slow HBM
gathers with one-hot matmuls — but those matmuls are real MXU work:
(C*WH, W) @ (W, W) per output row is ~39M MACs, ~1.45 TFLOP per pass and
~4.4 TFLOP per train step across fwd + VJP, which CAPS the whole step at
~33 ms even at 100% MFU. This backend uses the VPU's in-register
crossbars instead: Mosaic lowers a 2D `jnp.take_along_axis` to
`tpu.dynamic_gather` — axis 0 is a sublane crossbar, axis 1 a lane
crossbar — so each warped pixel costs a handful of VPU ops rather than a
640-wide matmul column.

Mosaic (v5e) only lowers `tpu.dynamic_gather` when the SOURCE spans a
single vreg along the gather dimension ("Multiple source vregs along
gather dimension" otherwise): <=8 sublanes for an axis-0 gather, <=128
lanes for an axis-1 gather. Both gathers here are therefore decomposed
to vreg-legal pieces:

- horizontal (lane) gather: the W-wide row is processed in 128-lane
  output strips; strip s gathers from source strips {s-1, s, s+1} (each
  a (C*WH, 128) lane-slice = one vreg along the gather dim) and selects
  by `x0 // 128`. Source columns are clamped into the covered 3-strip
  band, so the kernel is EXACT when the horizontal displacement
  |ix - column| <= 128 px (KITTI-scale reprojection moves tens of px)
  and clamps gracefully beyond, mirroring the vertical window clamp.
  `x0+1` columns come from the same gathers against a roll(-1) of the
  window, reusing the strip indices.
- vertical (sublane) gather: the WH-row window is processed in 8-row
  groups; each channel's picked row is gathered from the <=4 groups that
  a `ly` value can fall in and combined by `ly // 8` selects.

Structure per program (grid (n_src, n_scales, B, H/RT), same contract as
the banded kernel): extract the WH-row source window at an 8-aligned
dynamic start, then per output row do the strip-decomposed horizontal
blend followed by the group-decomposed vertical blend, strip-locally
(nothing wider than (C*WH, 128) lives past the gathers).

Gradients: custom VJP to the COORDINATES only (sources are data in the
photometric loss), matching ops/pallas_warp.py's contract: d/dix is the
vertical interp of the horizontal derivative, d/diy the vertical
derivative of the horizontal interp.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WH = 32   # source-window rows per output block (see ops/pallas_warp.py)
RT = 16   # output rows per program
LS = 128  # lane-strip width: one vreg along the lane (gather) dimension
SG = 8    # sublane group: one vreg along the sublane (gather) dimension


def _win_and_idx(ix_ref, iy_ref, src_ref, H, W, C):
    ix = ix_ref[0, 0, 0]                   # (RT, W) f32, pixel coords
    iy = iy_ref[0, 0, 0]
    yb = jnp.clip(jnp.floor(jnp.min(iy)).astype(jnp.int32), 0, H - WH)
    yb = pl.multiple_of((yb // 8) * 8, 8)
    # cast the window to f32 BEFORE gathering: tpu.dynamic_gather needs
    # the data and i32 index bitwidths to match ("Gather indices and
    # result have different bitwidths" for bf16 sources otherwise)
    win = src_ref[0, 0, :, pl.ds(yb, WH), :].reshape(C * WH, W).astype(
        jnp.float32)
    # x0+1 columns: gather the same strip indices against roll(-1) of the
    # window (x0 <= W-2 keeps the wrap column out of reach); pltpu.roll
    # rejects negative shifts, so roll by W-1 (same rotation)
    winp = pltpu.roll(win, W - 1, 1)
    x0 = jnp.clip(jnp.floor(ix), 0, W - 2).astype(jnp.int32)
    ly = jnp.clip(jnp.floor(iy).astype(jnp.int32) - yb, 0, WH - 2)
    wy = jnp.clip(iy - (yb + ly).astype(jnp.float32), 0.0, 1.0)
    return win, winp, x0, ix, ly, wy


def _hblend(win, winp, x0s, ixs, s, n_strips, CWH):
    """Horizontal bilinear pair for output strip s: strip-decomposed lane
    gathers -> (h0, h1, wx) each (CWH, LS) f32.

    x0s/ixs are the strip's (LS,) column indices / coords; source columns
    clamp into the covered [s-1, s+1] strip band (exact for
    |ix - col| <= LS).
    """
    lo = LS * max(s - 1, 0)
    hi = LS * min(s + 1, n_strips - 1) + (LS - 1)
    x0c = jnp.clip(x0s, lo, hi - 1)        # keep x0c+1 <= hi in-band
    wx = jnp.clip(ixs - x0c.astype(jnp.float32), 0.0, 1.0)
    tsel = x0c // LS                       # covered strip per lane
    local = jnp.broadcast_to((x0c - tsel * LS)[None], (CWH, LS))
    h0 = jnp.zeros((CWH, LS), jnp.float32)
    h1 = jnp.zeros((CWH, LS), jnp.float32)
    for t in range(max(s - 1, 0), min(s + 1, n_strips - 1) + 1):
        m = jnp.broadcast_to((tsel == t)[None], (CWH, LS))
        g0 = jnp.take_along_axis(win[:, t * LS:(t + 1) * LS], local,
                                 axis=1).astype(jnp.float32)
        g1 = jnp.take_along_axis(winp[:, t * LS:(t + 1) * LS], local,
                                 axis=1).astype(jnp.float32)
        h0 = jnp.where(m, g0, h0)
        h1 = jnp.where(m, g1, h1)
    return h0, h1, wx


def _vpick(hb, lys, C):
    """Vertical pick rows `lys` (LS,) of each channel's WH-block of hb
    (C*WH, LS): group-decomposed sublane gathers -> (C, LS)."""
    gsel = lys // SG
    idx = jnp.broadcast_to((lys - gsel * SG)[None], (SG, hb.shape[1]))
    rows = []
    for c in range(C):
        acc = jnp.zeros((1, hb.shape[1]), jnp.float32)
        for g in range(WH // SG):
            src = hb[c * WH + g * SG: c * WH + (g + 1) * SG]
            pick = jnp.take_along_axis(src, idx, axis=0)[:1]
            acc = jnp.where((gsel == g)[None], pick, acc)
        rows.append(acc)
    return jnp.concatenate(rows, axis=0)


def _fwd_kernel(ix_ref, iy_ref, src_ref, out_ref, *, H, W, C):
    win, winp, x0, ix, ly, wy = _win_and_idx(ix_ref, iy_ref, src_ref,
                                             H, W, C)
    n_strips = W // LS
    for i in range(RT):
        for s in range(n_strips):
            sl = slice(s * LS, (s + 1) * LS)
            h0, h1, wx = _hblend(win, winp, x0[i, sl], ix[i, sl], s,
                                 n_strips, C * WH)
            hb = h0 + wx[None] * (h1 - h0)          # (C*WH, LS)
            v0 = _vpick(hb, ly[i, sl], C)           # (C, LS)
            v1 = _vpick(hb, ly[i, sl] + 1, C)
            out_ref[0, 0, 0, :, i, sl] = (
                v0 + wy[i, sl][None] * (v1 - v0)).astype(out_ref.dtype)


def _bwd_kernel(ix_ref, iy_ref, src_ref, g_ref, cix_ref, ciy_ref,
                *, H, W, C):
    win, winp, x0, ix, ly, wy = _win_and_idx(ix_ref, iy_ref, src_ref,
                                             H, W, C)
    n_strips = W // LS
    for i in range(RT):
        for s in range(n_strips):
            sl = slice(s * LS, (s + 1) * LS)
            g = g_ref[0, 0, 0, :, i, sl].astype(jnp.float32)   # (C, LS)
            h0, h1, wx = _hblend(win, winp, x0[i, sl], ix[i, sl], s,
                                 n_strips, C * WH)
            hb = h0 + wx[None] * (h1 - h0)
            hd = h1 - h0
            lys = ly[i, sl]
            v0 = _vpick(hb, lys, C)
            v1 = _vpick(hb, lys + 1, C)
            d0 = _vpick(hd, lys, C)
            d1 = _vpick(hd, lys + 1, C)
            wyi = wy[i, sl][None]
            # d out / d ix = vertical interp of the horizontal derivative
            cix_ref[0, 0, 0, i, sl] = (
                g * (d0 + wyi * (d1 - d0))).sum(axis=0)
            # d out / d iy = vertical derivative of the horizontal interp
            ciy_ref[0, 0, 0, i, sl] = (g * (v1 - v0)).sum(axis=0)


def _specs(n_src, n_scales, B, C, H, W):
    # 4D grid like ops/pallas_warp.py: the src spec ignores the scale
    # axis, so sources are NOT replicated k-fold in HBM
    coord = pl.BlockSpec((1, 1, 1, RT, W),
                         lambda s, kk, b, r: (s, kk, b, r, 0),
                         memory_space=pltpu.VMEM)
    src = pl.BlockSpec((1, 1, C, H, W),
                       lambda s, kk, b, r: (s, b, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, 1, 1, C, RT, W),
                       lambda s, kk, b, r: (s, kk, b, 0, r, 0),
                       memory_space=pltpu.VMEM)
    grid = (n_src, n_scales, B, H // RT)
    return grid, coord, src, out


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _warp_gather(coords, sources, interpret, prec):
    """Same contract as pallas_warp._warp: coords (n, k, B, H, W, 2)
    pixel-space, sources (n, B, C, H, W); returns (n, k, B, C, H, W)."""
    out, _ = _warp_gather_fwd(coords, sources, interpret, prec)
    return out


def _warp_gather_fwd(coords, sources, interpret, prec):
    del prec
    n, k, B, H, W, _ = coords.shape
    C = sources.shape[2]
    assert H % RT == 0 and H >= WH and W % LS == 0, (H, W)
    grid, cspec, sspec, ospec = _specs(n, k, B, C, H, W)
    ix = coords[..., 0]
    iy = coords[..., 1]
    out = pl.pallas_call(
        partial(_fwd_kernel, H=H, W=W, C=C),
        grid=grid,
        in_specs=[cspec, cspec, sspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((n, k, B, C, H, W), jnp.float32),
        interpret=interpret,
    )(ix, iy, sources)
    return out, (coords, sources)


def _warp_gather_bwd(interpret, prec, res, g):
    del prec
    coords, sources = res
    n, k, B, H, W, _ = coords.shape
    C = sources.shape[2]
    grid, cspec, sspec, ospec = _specs(n, k, B, C, H, W)
    ix = coords[..., 0]
    iy = coords[..., 1]
    cix, ciy = pl.pallas_call(
        partial(_bwd_kernel, H=H, W=W, C=C),
        grid=grid,
        in_specs=[cspec, cspec, sspec, ospec],
        out_specs=[cspec, cspec],
        out_shape=[
            jax.ShapeDtypeStruct((n, k, B, H, W), jnp.float32),
            jax.ShapeDtypeStruct((n, k, B, H, W), jnp.float32),
        ],
        interpret=interpret,
    )(ix, iy, sources, g.astype(jnp.float32))
    cot = jnp.stack([cix, ciy], axis=-1)
    return cot.astype(coords.dtype), jnp.zeros_like(sources)


_warp_gather.defvjp(_warp_gather_fwd, _warp_gather_bwd)
