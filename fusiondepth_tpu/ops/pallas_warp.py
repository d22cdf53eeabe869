"""Bilinear image warping as a Pallas TPU kernel (MXU, no hardware gather).

The photometric loss warps every source frame into frame 0's view at all
4 scales x full resolution (reference trainer.py:425-474). XLA lowers the
per-pixel bilinear sample to row-granular hardware gathers (~230M rows/s
measured on v5e) — 47M gather rows per train step, the dominant cost after
the round-2 loss overhaul.

This kernel replaces the gather with linear algebra:
  - horizontal interpolation = a one-hot-pair matmul on the MXU:
    for each output row, a (C*WH, W) window slab contracts against a
    (W_out, W_src) matrix holding the two bilinear x-weights per pixel;
  - vertical interpolation = a masked reduction over the WH-row window on
    the VPU (two nonzero y-weights per pixel).

Exactness domain: horizontal is exact (incl. border clamping, same
x0 = clamp(floor(ix), 0, W-2) construction as ops.sampling.grid_sample).
Vertically each RT-row output block reads one dynamically-positioned
WH-row window of the source; pixels whose source row falls outside
[window, window+WH) clamp to the window edge. Reprojection warps are
smooth — vertical spread within an RT-row block is RT plus a few pixels on
KITTI-like motion — so WH=32 (17 rows of motion headroom past the block
span and alignment slack) keeps the kernel exact in practice; extreme
synthetic warps fall back to the gather path (use_pallas_warp gates it).

Gradients: a custom VJP computes cotangents for the COORDINATES only
(through the same kernel structure, with +-1 derivative one-hots). The
source-image cotangent is ZERO by construction — valid for the photometric
loss, where sources are input data, NEVER where the source requires
gradients.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WH = 32  # source-window rows per output block
RT = 16  # output rows per program

# Window sizing: a program emits RT output rows from one WH-row source
# window starting at yb = 8-aligned floor(min iy). Reprojection warps are
# near-identity vertically, so iy inside an RT-row block spans ~RT rows
# plus a few pixels of motion: WH - RT - 7 (alignment slack) = 9 rows of
# motion headroom. Halving WH from round-2's 64 halves the per-row MXU
# cost ((C*WH, W) @ (W, W)); RT stays 16 — an RT=8 variant doubled the
# program count and its per-program overhead cost more than the halved
# matmul saved (measured 23.6 vs 16.1 ms fwd).


def _xpair(ixr, W):
    """Horizontal one-hot pair (W_out, W_src) + weight for one output row.

    O0 selects x0 = clamp(floor(ix), 0, W-2), O1 selects x0+1. Two iota
    compares: measured FASTER than deriving O1 = pltpu.roll(O0, 1, lanes)
    (lane rotation costs ~7 ms/step more than the extra compare on v5e —
    scripts/exp_warp_fwd.py).
    """
    x0 = jnp.clip(jnp.floor(ixr), 0, W - 2).astype(jnp.int32)  # (W,)
    wx = jnp.clip(ixr - x0.astype(jnp.float32), 0.0, 1.0)
    ids = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)  # (out j, src w)
    O0 = jnp.where(ids == x0[:, None], 1.0, 0.0)
    O1 = jnp.where(ids == x0[:, None] + 1, 1.0, 0.0)
    return O0, O1, wx


def _ypair(iyr, yb, W):
    """Vertical one-hot pair (WH, W) (window-local) + weight, one row."""
    ly = jnp.clip(jnp.floor(iyr).astype(jnp.int32) - yb, 0, WH - 2)  # (W,)
    wy = jnp.clip(iyr - (yb + ly).astype(jnp.float32), 0.0, 1.0)
    rid = jax.lax.broadcasted_iota(jnp.int32, (WH, W), 0)
    O0 = jnp.where(rid == ly[None, :], 1.0, 0.0)
    O1 = jnp.where(rid == ly[None, :] + 1, 1.0, 0.0)
    return O0, O1, wy


def _fwd_kernel(ix_ref, iy_ref, src_ref, out_ref, *, H, W, C, prec):
    ix = ix_ref[0, 0, 0]  # (RT, W)
    iy = iy_ref[0, 0, 0]
    yb = jnp.clip(jnp.floor(jnp.min(iy)).astype(jnp.int32), 0, H - WH)
    # Mosaic needs the dynamic sublane start provably 8-aligned
    yb = pl.multiple_of((yb // 8) * 8, 8)
    win = src_ref[0, 0, :, pl.ds(yb, WH), :].reshape(C * WH, W)

    for i in range(RT):
        Ox0, Ox1, wx = _xpair(ix[i], W)
        # weights in the source dtype: one-hots are exact, and bf16 wx only
        # re-rounds what a bf16 MXU pass rounds anyway
        Cx = (Ox0 + wx[:, None] * (Ox1 - Ox0)).astype(win.dtype)
        Hrow = jax.lax.dot_general(
            win, Cx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec).reshape(C, WH, W)
        Oy0, Oy1, wy = _ypair(iy[i], yb, W)
        M = Oy0 + wy[None, :] * (Oy1 - Oy0)
        out_ref[0, 0, 0, :, i, :] = (
            (Hrow * M[None]).sum(axis=1)).astype(out_ref.dtype)


def _bwd_kernel(ix_ref, iy_ref, src_ref, g_ref, cix_ref, ciy_ref,
                *, H, W, C, prec):
    ix = ix_ref[0, 0, 0]
    iy = iy_ref[0, 0, 0]
    yb = jnp.clip(jnp.floor(jnp.min(iy)).astype(jnp.int32), 0, H - WH)
    yb = pl.multiple_of((yb // 8) * 8, 8)
    win = src_ref[0, 0, :, pl.ds(yb, WH), :].reshape(C * WH, W)

    for i in range(RT):
        g = g_ref[0, 0, 0, :, i, :].astype(jnp.float32)  # (C, W)
        # two one-hot matmuls give BOTH Hrow and its x-derivative:
        # Hrow = A0 (1-wx) + A1 wx, dHrow/dix = A1 - A0
        Ox0, Ox1, wx = _xpair(ix[i], W)
        A0 = jax.lax.dot_general(
            win, Ox0.astype(win.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec).reshape(C, WH, W)
        A1 = jax.lax.dot_general(
            win, Ox1.astype(win.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec).reshape(C, WH, W)
        Hrow = A0 + wx[None, None, :] * (A1 - A0)
        Hder = A1 - A0
        Oy0, Oy1, wy = _ypair(iy[i], yb, W)
        M = Oy0 + wy[None, :] * (Oy1 - Oy0)
        Md = Oy1 - Oy0
        # d out / d ix = vertical-interp of the horizontal derivative
        cix_ref[0, 0, 0, i, :] = (
            g * (Hder * M[None]).sum(axis=1)).sum(axis=0)
        # d out / d iy = vertical derivative of the horizontal interp
        ciy_ref[0, 0, 0, i, :] = (
            g * (Hrow * Md[None]).sum(axis=1)).sum(axis=0)


def _specs(n_src, n_scales, B, C, H, W):
    coord = pl.BlockSpec((1, 1, 1, RT, W),
                         lambda s, k, b, r: (s, k, b, r, 0),
                         memory_space=pltpu.VMEM)
    src = pl.BlockSpec((1, 1, C, H, W),
                       lambda s, k, b, r: (s, b, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, 1, 1, C, RT, W),
                       lambda s, k, b, r: (s, k, b, 0, r, 0),
                       memory_space=pltpu.VMEM)
    grid = (n_src, n_scales, B, H // RT)
    return grid, coord, src, out


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _warp(coords, sources, interpret, prec):
    """coords: (n_src, n_scales, B, H, W, 2) pixel-space (ix, iy), already
    clamped to the image; sources: (n_src, B, C, H, W).
    Returns (n_src, n_scales, B, C, H, W)."""
    out, _ = _warp_fwd(coords, sources, interpret, prec)
    return out


def _warp_fwd(coords, sources, interpret, prec):
    n_src, n_scales, B, H, W, _ = coords.shape
    C = sources.shape[2]
    assert H % RT == 0 and H >= WH, (H, W)
    grid, cspec, sspec, ospec = _specs(n_src, n_scales, B, C, H, W)
    ix = coords[..., 0]
    iy = coords[..., 1]
    # source dtype carries into the window loads and the MXU pass (bf16 in
    # -> bf16 window, halving the kernel's dominant VMEM traffic); outputs
    # and coords stay f32 (f32 8-sublane tiling fits the RT-row blocks,
    # and accumulation is f32 regardless)
    out = pl.pallas_call(
        partial(_fwd_kernel, H=H, W=W, C=C, prec=prec),
        grid=grid,
        in_specs=[cspec, cspec, sspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((n_src, n_scales, B, C, H, W),
                                       jnp.float32),
        interpret=interpret,
    )(ix, iy, sources)
    return out, (coords, sources)


def _warp_bwd(interpret, prec, res, g):
    coords, sources = res
    n_src, n_scales, B, H, W, _ = coords.shape
    C = sources.shape[2]
    grid, cspec, sspec, ospec = _specs(n_src, n_scales, B, C, H, W)
    cot_spec = pl.BlockSpec((1, 1, 1, RT, W),
                            lambda s, k, b, r: (s, k, b, r, 0),
                            memory_space=pltpu.VMEM)
    ix = coords[..., 0]
    iy = coords[..., 1]
    cix, ciy = pl.pallas_call(
        partial(_bwd_kernel, H=H, W=W, C=C, prec=prec),
        grid=grid,
        in_specs=[cspec, cspec, sspec, ospec],
        out_specs=[cot_spec, cot_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_src, n_scales, B, H, W), jnp.float32),
            jax.ShapeDtypeStruct((n_src, n_scales, B, H, W), jnp.float32),
        ],
        interpret=interpret,
    )(ix, iy, sources, g.astype(jnp.float32))
    cot_coords = jnp.stack([cix, ciy], axis=-1).astype(coords.dtype)
    # sources are DATA in the photometric loss: zero cotangent by design
    return cot_coords, jnp.zeros_like(sources)


_warp.defvjp(_warp_fwd, _warp_bwd)


def warp_bilinear_banded(sources, warps, interpret: bool = False,
                         precision=jax.lax.Precision.HIGHEST):
    """Drop-in fused alternative to ops.sampling.grid_sample_multi.

    sources: list of n_src (B, H, W, C) images; warps: list of
    (source_index, grid) with grid (B, H, W, 2) normalized coords, where
    every source index appears the SAME number of times (the photometric
    loss warps each frame at each scale). Returns one (B, H, W, C) output
    per warp, in order. Gradients flow to the grids only.
    """
    B, H, W, C = sources[0].shape
    n_src = len(sources)
    by_src = {}
    for pos, (si, g) in enumerate(warps):
        by_src.setdefault(si, []).append((pos, g))
    counts = {k: len(v) for k, v in by_src.items()}
    n_scales = counts[0]
    assert all(c == n_scales for c in counts.values()), counts
    assert sorted(by_src) == list(range(n_src))

    # (n_src, n_scales, B, H, W, 2) pixel coords, clamped (border mode)
    grids = jnp.stack(
        [jnp.stack([g for _, g in by_src[s]]) for s in range(n_src)])
    gx = grids[..., 0].astype(jnp.float32)
    gy = grids[..., 1].astype(jnp.float32)
    ix = jnp.clip(((gx + 1.0) * W - 1.0) * 0.5, 0.0, W - 1)
    iy = jnp.clip(((gy + 1.0) * H - 1.0) * 0.5, 0.0, H - 1)
    coords = jnp.stack([ix, iy], axis=-1)

    src = jnp.stack([jnp.moveaxis(s, -1, 1) for s in sources])  # (n,B,C,H,W)
    out = _warp(coords, src, interpret, precision)

    results = [None] * len(warps)
    for s in range(n_src):
        for k, (pos, _) in enumerate(by_src[s]):
            results[pos] = jnp.moveaxis(out[s, k], 1, -1).astype(
                sources[0].dtype)
    return results


def analytic_costs(n, k, B, C, H, W, bwd=False, dtype_bytes=2):
    """Analytic (flops, hbm_bytes) per execution of the banded warp kernel.

    XLA's compiled cost analysis cannot see inside pallas_call, so the
    roofline accounting (scripts/bench_anatomy.py --costs) adds these.
    Forward: one (C*WH, W) @ (W, W) one-hot matmul per output row; backward
    runs two (A0, A1 -> value + x-derivative). HBM: coords (f32) + one
    source-window fetch per (n, k, B) program run + the output (and, on the
    backward, the incoming cotangent and the two coordinate cotangents).
    """
    rows = n * k * B * H
    mm = 2 * C * WH * W * W
    flops = rows * mm * (2 if bwd else 1)
    coords = n * k * B * H * W * 4 * 2
    src = n * k * B * C * H * W * dtype_bytes
    out = n * k * B * C * H * W * dtype_bytes
    if bwd:
        cot_out = n * k * B * H * W * 4 * 2
        return flops, coords + src + out + cot_out
    return flops, coords + src + out
