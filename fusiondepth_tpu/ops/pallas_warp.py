"""Bilinear image warping as a Pallas TPU kernel (MXU, no hardware gather).

The photometric loss warps every source frame into frame 0's view at all
4 scales x full resolution (reference trainer.py:425-474). XLA lowers the
per-pixel bilinear sample to row-granular hardware gathers (~230M rows/s
measured on v5e) — 47M gather rows per train step, the dominant cost after
the round-2 loss overhaul.

This kernel replaces the gather with linear algebra:
  - horizontal interpolation = one-hot-pair matmuls on the MXU;
  - vertical interpolation = a masked reduction over the row window on
    the VPU (two nonzero y-weights per pixel).

The matmuls are the step's FLOP ceiling, so they are kept as small as the
warp's smoothness allows (round 3; 3.3x fewer MACs than the round-2
full-width form):
  - per OUTPUT ROW the source window is WR=16 rows, dynamically sliced
    (8-aligned) at that row's own floor(min iy) — reprojection warps are
    near-identity vertically, so iy varies by a pixel or two WITHIN one
    output row; 16 rows = up to 7 alignment slack + 7 rows of spread.
  - per 128-column OUTPUT STRIP the contraction runs over a BW=384-column
    source BAND around the strip, not all W columns: exact while the
    horizontal displacement |ix - column| <= 128 px (KITTI-scale
    reprojection moves tens of px), clamping to the band edge beyond —
    the same banding contract as the gather backend.

Per output row this is ceil(W/128) matmuls of (C*WR, BW) @ (BW, 128)
instead of one (C*WH=96, W) @ (W, W): at 192x640 that is 11.8M vs 39.3M
MACs per row (fwd).

Exactness domain: exact (incl. border clamping, same x0/y0 constructions
as ops.sampling.grid_sample) while per-output-row vertical spread of
floor(iy) stays <= 7 px (up to 14 when alignment is lucky) and horizontal
displacement stays within the band; clamps gracefully beyond. Extreme
synthetic warps fall back to the XLA gather path (use_pallas gates it).

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
from jax.experimental.pallas import tpu as pltpu  # noqa: F401 (parity)

WR = 16   # source-window rows per OUTPUT ROW (8-aligned dynamic start)
RT = 16   # output rows per program
LS = 128  # output-strip width (lanes)
BW = 384  # source-band columns per output strip (covers |ix-col|<=128)

# WH kept as the legacy name for the vertical window extent that
# ops.warp.pallas_ok checks H against.
WH = WR


# trace-time band override (Config-driven; see band_override). Takes
# precedence over the FUSIONDEPTH_WARP_BW env A/B gate: training configs
# with wide-displacement warps (use_stereo) auto-select a wider dynamic
# band than the dyn256 default (training/photometric.py).
_BAND_OVERRIDE = [None]


class band_override:
    """Context manager pinning the band spec ("dyn256", "dyn384", "384",
    ...) for warps traced inside, overriding the env gate."""

    def __init__(self, value: str | None):
        self.value = value or None

    def __enter__(self):
        self.prev = _BAND_OVERRIDE[0]
        if self.value is not None:
            _BAND_OVERRIDE[0] = self.value
        return self

    def __exit__(self, *exc):
        _BAND_OVERRIDE[0] = self.prev
        return False


def _band_bw():
    """Effective (source-band width, dynamic?) read at TRACE time for
    bench-ladder A/B:

    - "384" (static, default): band starts one strip left — exact for
      |ix-col| <= 128 px, clamping beyond.
    - "256" (static): bands start 64 px left of the strip — exact for
      |ix-col| <= 64 px only. Cuts BOTH the per-strip tent construction
      (the fwd kernel's dominant VPU cost, PERF.md round-3 anatomy) and
      the one-hot MXU MACs by a third, but 64 px is NOT safely above
      KITTI near-field temporal motion (fx*t/z ~ 96 px at 3 m) and far
      below stereo disparities, so it stays opt-in.
    - "dyn256" / "dynN" (dynamic): per-(row, strip) band start = the
      128-aligned floor of min(ix) over the strip — same MAC/tent savings
      as the static narrow band but exact for ANY flow magnitude while
      the strip's ix SPREAD fits the band (>= bw-129 px guaranteed after
      alignment; uniform flows of any size are exact), clamping beyond.
      Costs one 1D lane-min per (row, strip) plus a dynamic lane-start
      slice (Mosaic requires the 128-alignment)."""
    import os
    # dyn256 DEFAULT since round 4: measured v5e b12 warp fwd 14.0 ->
    # 10.0 ms, step 68.8 -> 64.3 ms, exact for any uniform flow magnitude
    # (tests/test_pallas_warp.py dyn tests; PERF.md round-4 anatomy).
    # "384" restores the round-3 static band (exact for |ix-col| <= 128).
    v = _BAND_OVERRIDE[0] or os.environ.get("FUSIONDEPTH_WARP_BW", "dyn256")
    if v.startswith("dyn"):
        return int(v[3:] or 256), True
    return int(v), False


def band_clamp_fraction(coords, H: int, W: int):
    """Fraction of samples OUTSIDE the banded kernel's exactness domain,
    under the CURRENT trace-time band config — the out-of-domain telemetry
    for the silent band clamp (ops docstring "Exactness domain").

    Mirrors the kernel's own alignment rules: horizontal exact iff
    ix <= bs + bw - 1 with bs the per-(row, strip) 128-aligned dynamic
    start (_dyn_bs) or the static band start (_band); vertical exact iff
    iy <= yb + WR - 1 with yb the per-row 8-aligned window start (_ywin).
    coords: (..., H, W, 2) pixel-space, already image-clamped (as handed
    to _warp). Returns {"h_frac", "v_frac", "frac"} floats.
    """
    ix, iy = coords[..., 0], coords[..., 1]
    bwe, dyn = _band_bw()
    bw = min(bwe, W)
    n_strips = -(-W // LS)
    h_bad = []
    for s in range(n_strips):
        sw = min(LS, W - s * LS)
        ixs = ix[..., s * LS:s * LS + sw]
        if dyn and W > bw:
            mn = jnp.floor(ixs.min(axis=-1)).astype(jnp.int32)
            bs = (jnp.clip(mn, 0, W - bw) // 128 * 128)[..., None]
        else:
            bs = _band(s, W)[0]
        h_bad.append(ixs > bs + bw - 1)
    h_bad = jnp.concatenate(h_bad, axis=-1)
    mn_y = jnp.floor(iy.min(axis=-1)).astype(jnp.int32)
    yb = jnp.clip(mn_y, 0, H - WR) // 8 * 8
    v_bad = iy > (yb[..., None] + WR - 1)
    return {"h_frac": float(h_bad.mean()), "v_frac": float(v_bad.mean()),
            "frac": float((h_bad | v_bad).mean())}


def _band(s: int, W: int):
    """Static (source-band start, band width, strip width) for strip s.
    In dynamic mode bs is None — computed in-kernel per (row, strip)."""
    bwe, dyn = _band_bw()
    bw = min(bwe, W)
    sw = min(LS, W - s * LS)
    if dyn and W > bw:
        return None, bw, sw
    if bw >= 384 or W <= bw:
        bs = min(max((s - 1) * LS, 0), W - bw)
    else:
        # narrow band: center on the strip (64-px lead), 64-aligned start
        bs = min(max(s * LS - (bw - LS) // 2, 0), W - bw)
    return bs, bw, sw


def _dyn_bs(ixs, W: int, bw: int):
    """Per-(row, strip) dynamic band start: the 128-aligned floor of the
    strip's min source column, clipped so the band stays in-image. A 1D
    lane-min plus scalar ops; the alignment satisfies Mosaic's dynamic
    lane-start rule and guarantees bs <= min(ix)."""
    mn = jnp.min(ixs)
    bs = jnp.clip(jnp.floor(mn).astype(jnp.int32), 0, W - bw)
    return pl.multiple_of((bs // 128) * 128, 128)


def _xpair_strip(ixs, bs, bw, ids):
    """Horizontal one-hot pair (BW_src, SW_out) + weight for one output
    strip of one row. O0 selects x0 = clamp(floor(ix), bs, bs+bw-2)
    band-locally, O1 selects x0+1. `ids` is the hoisted int32 (bw, sw)
    source-column iota (loop-invariant across rows and strips)."""
    x0 = jnp.clip(jnp.floor(ixs), bs, bs + bw - 2).astype(jnp.int32)
    wx = jnp.clip(ixs - x0.astype(jnp.float32), 0.0, 1.0)
    wloc = x0 - bs                                        # (sw,)
    O0 = jnp.where(ids == wloc[None, :], 1.0, 0.0)
    O1 = jnp.where(ids == wloc[None, :] + 1, 1.0, 0.0)
    return O0, O1, wx


def _cx_tent(ixs, bs, bw, ids, dtype):
    """Blended horizontal weight matrix (BW_src, SW_out) as a tent
    function: relu(1 - |w - ix|) IS the bilinear pair ((1-wx) at x0, wx
    at x0+1, incl. the border clamp) — built in 4 VPU ops over the
    (bw, sw) tile instead of two iota-compares plus a 3-op blend.
    `ids` is the hoisted f32 (bw, sw) source-column iota (identical for
    every row and strip — tpu.iota is integer-only on Mosaic and the
    int->f32 cast is a full-tile VPU pass, so it is built ONCE per
    program, not per (row, strip)).

    For a bf16 target the abs/1-/relu chain runs in bf16 (16-bit lanes
    pack 2x per vreg) AFTER an exact f32 subtract: the subtract needs f32
    (column ids up to 639 are not bf16-exact), but |t| < 1 values round
    identically whether the tent is built in f32 and cast or built in
    bf16 — the MXU pass consumes bf16 weights either way."""
    ixloc = jnp.clip(ixs, bs, bs + bw - 1) - bs
    t = ids - ixloc[None, :]
    if dtype == jnp.bfloat16:
        t = t.astype(jnp.bfloat16)
        return jnp.maximum(jnp.bfloat16(0.0),
                           jnp.bfloat16(1.0) - jnp.abs(t))
    return jnp.maximum(0.0, 1.0 - jnp.abs(t)).astype(dtype)


def _my_tent(iyr_loc, kloc):
    """Blended vertical pick mask (C*WR, SW) as a tent function over the
    window-local row index (same channel-block stacking as _ypair_full).
    `kloc` is the hoisted f32 (C*WR, sw) window-local row-id grid."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(kloc - iyr_loc[None, :]))


def _kloc_grid(C, sw, dtype=jnp.float32):
    """Window-local row index per stacked-block row: row c*WR+k -> k.
    Loop-invariant; built once per kernel program."""
    rid = jax.lax.broadcasted_iota(jnp.int32, (C * WR, sw), 0)
    return (rid - (rid // WR) * WR).astype(dtype)


def _ywin(iyr, H):
    """Per-row window start (8-aligned) + window-local pick rows/weights."""
    mn = jnp.min(iyr)
    yb = jnp.clip(jnp.floor(mn).astype(jnp.int32), 0, H - WR)
    yb = pl.multiple_of((yb // 8) * 8, 8)
    ly = jnp.clip(jnp.floor(iyr).astype(jnp.int32) - yb, 0, WR - 2)
    wy = jnp.clip(iyr - (yb + ly).astype(jnp.float32), 0.0, 1.0)
    return yb, ly, wy


def _ypair_full(lys, kloc):
    """Vertical one-hot pair (C*WR, SW): row c*WR+k of O0 is 1 where
    lys == k — the per-channel vertical pick masks stacked the same way
    the window rows are, so the masked window never needs a (C, WR, sw)
    reshape (whose sublane reduction Mosaic lays out replicated and then
    cannot store lane-sliced: "Invalid relayout ... replicated in
    destination but not in source"). `kloc` is the hoisted int32
    (C*WR, sw) window-local row-id grid."""
    O0 = jnp.where(kloc == lys[None, :], 1.0, 0.0)
    O1 = jnp.where(kloc == lys[None, :] + 1, 1.0, 0.0)
    return O0, O1


def _chan_matrices(C, dtype):
    """One-hot channel-segment matrices built from iota (Mosaic rejects
    captured module constants): Pt (C, C*WR) sums each channel's WR-row
    block (an MXU contraction returns a PACKED (C, sw) layout, unlike a
    sublane reduction); P (C*WR, C) expands per-channel rows to the
    stacked block form."""
    cid = jax.lax.broadcasted_iota(jnp.int32, (C, C * WR), 0)
    rid = jax.lax.broadcasted_iota(jnp.int32, (C, C * WR), 1)
    Pt = jnp.where(rid // WR == cid, 1.0, 0.0).astype(dtype)
    rid2 = jax.lax.broadcasted_iota(jnp.int32, (C * WR, C), 0)
    cid2 = jax.lax.broadcasted_iota(jnp.int32, (C * WR, C), 1)
    P = jnp.where(rid2 // WR == cid2, 1.0, 0.0).astype(dtype)
    return Pt, P


def _fwd_mode() -> str:
    """Horizontal-weight construction for the fwd kernel, read at TRACE
    time for bench-ladder A/B: "tent" (one matmul against the blended
    relu(1-|w-ix|) matrix) or "pair" (two matmuls against integer one-hot
    pairs + a VPU blend — the construction the bwd kernel uses, which
    measures cheaper per tile than the float tent despite the extra
    matmul: int compares/selects beat float abs/max + cast)."""
    import os
    return os.environ.get("FUSIONDEPTH_WARP_FWD", "tent")


def _fwd_kernel(ix_ref, iy_ref, src_ref, out_ref, *, H, W, C, prec, mode):
    ix = ix_ref[0, 0, 0]  # (RT, W)
    iy = iy_ref[0, 0, 0]
    n_strips = -(-W // LS)
    Pt, _ = _chan_matrices(C, jnp.float32)
    # loop-invariant index grids, hoisted: bw = min(band width, W) is the
    # same for every strip, so ONE iota+cast serves all (row, strip)
    # iterations
    bw_all = min(_band_bw()[0], W)
    ids_i = jax.lax.broadcasted_iota(jnp.int32, (bw_all, LS), 0)
    ids = ids_i.astype(jnp.float32)
    kloc = _kloc_grid(C, LS)
    dyn = _band(0, W)[0] is None
    for i in range(RT):
        yb, _, _ = _ywin(iy[i], H)
        yloc = jnp.clip(iy[i] - yb.astype(jnp.float32), 0.0, WR - 1.0)
        win = (None if dyn else
               src_ref[0, 0, :, pl.ds(yb, WR), :].reshape(C * WR, W))
        for s in range(n_strips):
            bs, bw, sw = _band(s, W)
            cols = slice(s * LS, s * LS + sw)
            if bs is None:
                # dynamic band: 128-aligned lane start sliced straight
                # from the ref (Pallas lowers dynamic ref slices; a
                # dynamic_slice on a loaded VALUE does not lower)
                bs = _dyn_bs(ix[i, cols], W, bw)
                band = src_ref[0, 0, :, pl.ds(yb, WR),
                               pl.ds(bs, bw)].reshape(C * WR, bw)
            else:
                band = win[:, bs:bs + bw]
            if mode == "pair":
                O0, O1, wx = _xpair_strip(ix[i, cols], bs, bw,
                                          ids_i[:bw, :sw])
                A0 = jax.lax.dot_general(
                    band, O0.astype(band.dtype), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)
                A1 = jax.lax.dot_general(
                    band, O1.astype(band.dtype), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)
                Hrow = A0 + wx[None, :] * (A1 - A0)    # (C*WR, sw)
            else:
                # weights in the source dtype: tent weights are exact at
                # the two support columns, and bf16 wx only re-rounds what
                # a bf16 MXU pass rounds anyway
                Cx = _cx_tent(ix[i, cols], bs, bw, ids[:, :sw], band.dtype)
                Hrow = jax.lax.dot_general(
                    band, Cx, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec)                    # (C*WR, sw)
            M = _my_tent(yloc[cols], kloc[:, :sw])
            out_ref[0, 0, 0, :, i, cols] = jax.lax.dot_general(
                Pt, Hrow * M, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec).astype(out_ref.dtype)


def _bwd_kernel(ix_ref, iy_ref, src_ref, g_ref, cix_ref, ciy_ref,
                *, H, W, C, prec):
    ix = ix_ref[0, 0, 0]
    iy = iy_ref[0, 0, 0]
    n_strips = -(-W // LS)
    _, P = _chan_matrices(C, jnp.float32)
    bw_all = min(_band_bw()[0], W)
    ids_i = jax.lax.broadcasted_iota(jnp.int32, (bw_all, LS), 0)
    rid = jax.lax.broadcasted_iota(jnp.int32, (C * WR, LS), 0)
    kloc_i = rid - (rid // WR) * WR
    dyn = _band(0, W)[0] is None
    for i in range(RT):
        yb, ly, wy = _ywin(iy[i], H)
        win = (None if dyn else
               src_ref[0, 0, :, pl.ds(yb, WR), :].reshape(C * WR, W))
        for s in range(n_strips):
            bs, bw, sw = _band(s, W)
            cols = slice(s * LS, s * LS + sw)
            g = g_ref[0, 0, 0, :, i, cols].astype(jnp.float32)  # (C, sw)
            # expand g to the stacked-block form so every reduction below
            # is a full sublane sum to a 1D row (a layout Mosaic stores
            # lane-sliced without relayout)
            gfull = jax.lax.dot_general(
                P, g, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)                         # (C*WR, sw)
            # two one-hot matmuls give BOTH Hrow and its x-derivative:
            # Hrow = A0 (1-wx) + A1 wx, dHrow/dix = A1 - A0
            if bs is None:
                bs = _dyn_bs(ix[i, cols], W, bw)
                band = src_ref[0, 0, :, pl.ds(yb, WR),
                               pl.ds(bs, bw)].reshape(C * WR, bw)
            else:
                band = win[:, bs:bs + bw]
            O0, O1, wx = _xpair_strip(ix[i, cols], bs, bw, ids_i[:, :sw])
            A0 = jax.lax.dot_general(
                band, O0.astype(band.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            A1 = jax.lax.dot_general(
                band, O1.astype(band.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            Hrow = A0 + wx[None, :] * (A1 - A0)        # (C*WR, sw)
            Hder = A1 - A0
            Y0, Y1 = _ypair_full(ly[cols], kloc_i[:, :sw])
            wys = wy[cols]
            M = Y0 + wys[None, :] * (Y1 - Y0)
            Md = Y1 - Y0
            # d out / d ix = vertical-interp of the horizontal derivative
            cix_ref[0, 0, 0, i, cols] = (gfull * Hder * M).sum(axis=0)
            # d out / d iy = vertical derivative of the horizontal interp
            ciy_ref[0, 0, 0, i, cols] = (gfull * Hrow * Md).sum(axis=0)


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
    assert H % RT == 0 and H >= WR, (H, W)
    grid, cspec, sspec, ospec = _specs(n_src, n_scales, B, C, H, W)
    ix = coords[..., 0]
    iy = coords[..., 1]
    # source dtype carries into the window loads and the MXU pass (bf16 in
    # -> bf16 window, halving the kernel's dominant VMEM traffic); outputs
    # and coords stay f32 (f32 8-sublane tiling fits the RT-row blocks,
    # and accumulation is f32 regardless)
    out = pl.pallas_call(
        partial(_fwd_kernel, H=H, W=W, C=C, prec=prec, mode=_fwd_mode()),
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
    Forward: per output row, one (C*WR, BW) @ (BW, SW) one-hot matmul per
    128-column output strip; backward runs two (A0, A1 -> value +
    x-derivative). HBM: coords (f32) + one source-window fetch per
    (n, k, B) program run + the output (and, on the backward, the incoming
    cotangent and the two coordinate cotangents).
    """
    rows = n * k * B * H
    mm = sum(2 * C * WR * _band(s, W)[1] * _band(s, W)[2]
             for s in range(-(-W // LS)))
    flops = rows * mm * (2 if bwd else 1)
    coords = n * k * B * H * W * 4 * 2
    src = n * k * B * C * H * W * dtype_bytes
    out = n * k * B * C * H * W * dtype_bytes
    if bwd:
        cot_out = n * k * B * H * W * 4 * 2
        return flops, coords + src + out + cot_out
    return flops, coords + src + out
