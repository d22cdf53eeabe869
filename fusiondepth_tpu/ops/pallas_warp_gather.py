"""Bilinear multi-warp as a Pallas TPU kernel built on `tpu.dynamic_gather`.

The banded-MXU warp kernel (ops/pallas_warp.py) replaces XLA's slow HBM
gathers with one-hot matmuls — but those matmuls are real MXU work:
(C*WH, W) @ (W, W) per output row is ~39M MACs, ~1.45 TFLOP per pass and
~4.4 TFLOP per train step across fwd + VJP, which CAPS the whole step at
~33 ms even at 100% MFU. This backend uses the VPU's in-register
crossbars instead: Mosaic lowers a 2D `jnp.take_along_axis` to
`tpu.dynamic_gather` — axis 0 is a sublane gather, axis 1 a lane gather —
so each warped pixel costs a handful of VPU ops rather than a 640-wide
matmul column.

Structure per program (grid (n_src*n_scales, B, H/RT), same contract as
the banded kernel):
- extract the WH-row source window at an 8-aligned dynamic start (same
  windowing contract and exactness domain as ops/pallas_warp.py);
- per output row: ONE lane-gather pair over the stacked (C*WH, W) window
  selects columns x0/x0+1 for every window row at once; blend by wx;
  then a sublane-gather pair selects rows ly/ly+1 per channel; blend by
  wy. 4 gathers of (C*WH, W) per row fwd, 6 bwd (the VJP reuses the
  horizontal pair and gathers the x/y derivative rows).

Gradients: custom VJP to the COORDINATES only (sources are data in the
photometric loss), matching ops/pallas_warp.py's contract.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WH = 32  # source-window rows per output block (see ops/pallas_warp.py)
RT = 16  # output rows per program


def _win_and_idx(ix_ref, iy_ref, src_ref, H, W, C):
    ix = ix_ref[0, 0, 0]                   # (RT, W) f32, pixel coords
    iy = iy_ref[0, 0, 0]
    yb = jnp.clip(jnp.floor(jnp.min(iy)).astype(jnp.int32), 0, H - WH)
    yb = pl.multiple_of((yb // 8) * 8, 8)
    win = src_ref[0, 0, :, pl.ds(yb, WH), :].reshape(C * WH, W)
    x0 = jnp.clip(jnp.floor(ix), 0, W - 2).astype(jnp.int32)
    wx = jnp.clip(ix - x0.astype(jnp.float32), 0.0, 1.0)
    ly = jnp.clip(jnp.floor(iy).astype(jnp.int32) - yb, 0, WH - 2)
    wy = jnp.clip(iy - (yb + ly).astype(jnp.float32), 0.0, 1.0)
    return win, x0, wx, ly, wy


def _row_pick(t, ly_b, C, W):
    """Sublane-gather rows ly (per column) of each channel's WH-block of
    t (C*WH, W), returning the C picked rows stacked (C, W).

    idx[r, j] = (r // WH) * WH + ly[j]: every row of channel c's block
    gathers that channel's selected row; row c*WH of the result holds it.
    """
    base = (jax.lax.broadcasted_iota(jnp.int32, (C * WH, W), 0) // WH) * WH
    picked = jnp.take_along_axis(t, base + ly_b, axis=0)
    rows = [picked[c * WH:c * WH + 1] for c in range(C)]
    return jnp.concatenate(rows, axis=0)


def _fwd_kernel(ix_ref, iy_ref, src_ref, out_ref, *, H, W, C):
    win, x0, wx, ly, wy = _win_and_idx(ix_ref, iy_ref, src_ref, H, W, C)
    f32 = jnp.float32
    for i in range(RT):
        x0_b = jnp.broadcast_to(x0[i][None], (C * WH, W))
        h0 = jnp.take_along_axis(win, x0_b, axis=1).astype(f32)
        h1 = jnp.take_along_axis(win, x0_b + 1, axis=1).astype(f32)
        hb = h0 + wx[i][None] * (h1 - h0)          # (C*WH, W)
        ly_b = jnp.broadcast_to(ly[i][None], (C * WH, W))
        v0 = _row_pick(hb, ly_b, C, W)             # (C, W)
        v1 = _row_pick(hb, ly_b + 1, C, W)
        out_ref[0, 0, 0, :, i, :] = (
            v0 + wy[i][None] * (v1 - v0)).astype(out_ref.dtype)


def _bwd_kernel(ix_ref, iy_ref, src_ref, g_ref, cix_ref, ciy_ref,
                *, H, W, C):
    win, x0, wx, ly, wy = _win_and_idx(ix_ref, iy_ref, src_ref, H, W, C)
    f32 = jnp.float32
    for i in range(RT):
        g = g_ref[0, 0, 0, :, i, :].astype(f32)    # (C, W)
        x0_b = jnp.broadcast_to(x0[i][None], (C * WH, W))
        h0 = jnp.take_along_axis(win, x0_b, axis=1).astype(f32)
        h1 = jnp.take_along_axis(win, x0_b + 1, axis=1).astype(f32)
        hb = h0 + wx[i][None] * (h1 - h0)
        hd = h1 - h0
        ly_b = jnp.broadcast_to(ly[i][None], (C * WH, W))
        v0 = _row_pick(hb, ly_b, C, W)
        v1 = _row_pick(hb, ly_b + 1, C, W)
        d0 = _row_pick(hd, ly_b, C, W)
        d1 = _row_pick(hd, ly_b + 1, C, W)
        wyi = wy[i][None]
        # d out / d ix = vertical interp of the horizontal derivative
        cix_ref[0, 0, 0, i, :] = (g * (d0 + wyi * (d1 - d0))).sum(axis=0)
        # d out / d iy = vertical derivative of the horizontal interp
        ciy_ref[0, 0, 0, i, :] = (g * (v1 - v0)).sum(axis=0)


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
    assert H % RT == 0 and H >= WH, (H, W)
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
