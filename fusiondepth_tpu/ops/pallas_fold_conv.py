"""Fused Pallas TPU kernels for the W-folded reflect-pad 3x3 conv.

Why: the decoder's folded convs are exact and lane-dense (ops/folded.py)
but the XLA lowering EXPLODES into ops — conv + 4 border-correction convs
+ 2 scatter-adds forward, ~5x that backward — and the round-4 HLO audit
(PERF.md) showed the train step is op-granularity/latency-bound, not
HBM-bound: the folded decoder alone is ~1,230 scheduled entry ops plus
their S(1) staging copies. This module collapses each ConvBlock
(reference layers.py:100-130: ReflectionPad2d + Conv2d 3x3 + ELU) into
ONE Pallas kernel forward and two backward (input-grad reuses the
forward kernel with the flipped/transposed weights; weight-grad is a
grid-accumulated kernel), with only cheap glue left in XLA.

Formulation: the HALO layout of ops/folded.py (halo_kernel3x3) — the 3 W
taps of every output fold slot live in the CHANNEL dim of a
(B, H+2, Wf, (F+2)*C) halo tensor, so the kernel's W extent is 1:
in-kernel work is 3 row-sliced matmuls per input with NO W shifts
(Mosaic-friendly: leading-dim slices are full-tile address offsets) and
(F+2)/3 MAC inflation instead of the band kernel's F. The halo build and
the H-overlap window stacking stay in XLA (single fusions); bias, ELU
and the whole tap contraction are in-kernel.

Reflect-pad transpose in halo form is cheap: the pad is 1 ORIGINAL pixel,
so the backward needs the zero-pad correlation (the same kernel, flipped
weights) plus per-side single-column/row corrections done in XLA.

Exactness: the halo formulation is the same multiply-add set as the band
formulation (tests/test_folded.py::test_conv3x3_halo_grads_match_band);
this module is tested against conv3x3_folded fwd+grads in
tests/test_pallas_fold_conv.py.

Eligibility (the dispatcher falls back to the XLA path otherwise):
Wf % 8 == 0 — the (TH, Wf) -> (TH*Wf, ·) merges must be free shape casts.
Everything in the flagship decoder except the 6x20x512 stage qualifies.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fusiondepth_tpu.ops.folded import halo_kernel3x3


# ---------------------------------------------------------------- helpers

def mode() -> str:
    """Trace-time gate (bench-ladder A/B): '0' off, '1' on, 'interpret'
    on in Pallas interpret mode (CPU tests)."""
    import os
    return os.environ.get("FUSIONDEPTH_PALLAS_FOLDCONV", "0")


def mode_enc() -> str:
    """Same gate for the encoder basic-block path (zero-pad + fused
    BN-affine/ReLU input transform)."""
    import os
    return os.environ.get("FUSIONDEPTH_PALLAS_ENCCONV", "0")


def eligible(xf_shape, F: int) -> bool:
    """Pallas path requires Wf % 8 == 0 (free (TH, Wf)->(TH*Wf) merge)."""
    _, H, Wf, _ = xf_shape
    return Wf % 8 == 0 and H >= 4


def eligible_enc(xf_shape, F: int, db_in: int = 2, db_out: int = 2) -> bool:
    """The fused-act encoder path additionally requires an exact H tiling
    (its structural-zero masks only cover the first/last pad rows, not
    _stack_windows' zero extension). Mirrors _run_conv's VMEM-aware tile
    choice — pass the ACTUAL input/output dtype itemsizes so the probe
    and _run_conv compute the same (TH, nT, pad) (a float32 compute dtype
    tiles with 4-byte rows and can pick a smaller TH)."""
    _, H, Wf, FC = xf_shape
    rb = _row_bytes([(F + 2) * (FC // F)], Wf, FC, db_in, db_out)
    return eligible(xf_shape, F) and _tile(H, rb)[2] == 0


def _tile(H_out: int, row_bytes: int = 0):
    """(TH, nT, pad): output-row tiling. Prefers an exact divisor <= 50;
    otherwise the TH <= 50 minimizing zero-row padding (dgrad's H+2 can be
    2*97 etc.). row_bytes (double-buffered input+output+scratch bytes per
    output row, lane-padded) caps TH so the block fits Mosaic's ~16 MB
    scoped VMEM (probed: upconv_1_1 at TH=48 needed 16.65 MB)."""
    cap = 50
    if row_bytes:
        cap = max(4, min(50, int(13.2e6 / row_bytes)))
    if H_out <= cap:
        return H_out, 1, 0
    best = None
    for t in range(cap, 3, -1):
        pad = (-H_out) % t
        if best is None or pad < best[2] or (pad == best[2] and t > best[0]):
            best = (t, (H_out + pad) // t, pad)
        if pad == 0 and t >= min(24, cap // 2):
            return best
    return best


def _row_bytes(halos_hc, Wf, FCo, db_in, db_out):
    """Per-output-row VMEM estimate for _tile: double-buffered inputs +
    outputs, plus one merged-tap scratch copy at the widest input (lane
    dims padded to 128)."""
    def pad128(c):
        return -(-c // 128) * 128

    rb_in = sum(Wf * pad128(hc) * db_in for hc in halos_hc)
    rb_out = Wf * pad128(FCo) * db_out
    scratch = Wf * pad128(max(halos_hc)) * db_in
    return 2 * (rb_in + rb_out) + 2 * scratch


def _stack_windows(x, TH: int, nT: int):
    """(B, >= nT*TH + 2, Wf, C) -> (B, nT, TH+2, Wf, C): overlapping H
    windows (stride TH, 2 halo rows), zero-extended if short. One XLA
    fusion; ~2/TH duplication."""
    B, Hp, Wf, C = x.shape
    need = nT * TH + 2
    if Hp < need:
        x = jnp.concatenate(
            [x, jnp.zeros((B, need - Hp, Wf, C), x.dtype)], axis=1)
    return jnp.stack([x[:, k * TH:k * TH + TH + 2] for k in range(nT)],
                     axis=1)


def _halo_w(xf, F: int, C: int):
    """W-halo channels (no H pad): (B, H, Wf, F*C) -> (B, H, Wf, (F+2)*C)
    with REFLECT borders (edge excluded, torch ReflectionPad2d semantics —
    reference layers.py:100-130). Slot 0 of folded col j = original col
    F*j - 1; slot F+1 = original col F*(j+1)."""
    if F == 1:
        lh = jnp.concatenate([xf[:, :, 1:2], xf[:, :, :-1]], axis=2)
        rh = jnp.concatenate([xf[:, :, 1:], xf[:, :, -2:-1]], axis=2)
        return jnp.concatenate([lh, xf, rh], axis=-1)
    last = xf[..., (F - 1) * C:]
    first = xf[..., :C]
    lh = jnp.concatenate([xf[:, :, :1, C:2 * C], last[:, :, :-1]], axis=2)
    rh = jnp.concatenate(
        [first[:, :, 1:], xf[:, :, -1:, (F - 2) * C:(F - 1) * C]], axis=2)
    return jnp.concatenate([lh, xf, rh], axis=-1)


def _halo_w_zero(gf, F: int, C: int):
    """W-halo channels with ZERO borders (input-grad correlation: the
    cotangent is zero outside the image)."""
    B, H, Wf, FC = gf.shape
    z = jnp.zeros((B, H, 1, C), gf.dtype)
    if F == 1:
        lh = jnp.concatenate([z, gf[:, :, :-1]], axis=2)
        rh = jnp.concatenate([gf[:, :, 1:], z], axis=2)
        return jnp.concatenate([lh, gf, rh], axis=-1)
    last = gf[..., (F - 1) * C:]
    first = gf[..., :C]
    lh = jnp.concatenate([z, last[:, :, :-1]], axis=2)
    rh = jnp.concatenate([first[:, :, 1:], z], axis=2)
    return jnp.concatenate([lh, gf, rh], axis=-1)


def _reflect_h(xh):
    """H reflect pad by 1 row (edge excluded)."""
    return jnp.concatenate([xh[:, 1:2], xh, xh[:, -2:-1]], axis=1)


def _flip_swap(w):
    """(3, 3, Ci, Co) -> (3, 3, Co, Ci): the input-grad base kernel
    (spatial flip + channel transpose; the fold commutes with it)."""
    return jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)


def _halo_weights(w, F: int, dtype):
    """(3, 3, Ci, Co) -> (3, (F+2)*Ci, F*Co) halo-form weights."""
    wh = halo_kernel3x3(w, F)           # (3, 1, (F+2)Ci, F*Co)
    return wh.reshape(wh.shape[0], wh.shape[2], wh.shape[3]).astype(dtype)


def _halo_indicator(F: int):
    """The 0/1 map of halo_kernel3x3 (ops/folded.py:127-143), used to
    project the halo-form weight grad back to the (3, 3, Ci, Co) base."""
    ind = np.zeros((3, F + 2, F), np.float32)
    for po in range(F):
        for dx in (-1, 0, 1):
            ind[dx + 1, po + 1 + dx, po] = 1.0
    return jnp.asarray(ind)


# ---------------------------------------------------------------- kernels

def _act_masks(TH, Wf, HC, Ci, F):
    """Boolean masks over a (TH*Wf, HC) ky-slice marking positions whose
    PRE-activation value is a structural zero (halo borders / H pad rows)
    and must stay zero after the fused relu(x*s+b): the W border slots
    (folded col 0 slot 0, col Wf-1 slot F+1) and the first/last slice
    rows (only applied when the slice actually covers a pad row)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (TH * Wf, HC), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (TH * Wf, HC), 1)
    col = rows - (rows // Wf) * Wf
    border = jnp.logical_or(
        jnp.logical_and(col == 0, lanes < Ci),
        jnp.logical_and(col == Wf - 1, lanes >= (F + 1) * Ci))
    row0 = rows < Wf
    rowl = rows >= (TH - 1) * Wf
    return border, row0, rowl


def _conv_kernel(*refs, n_in, TH, Wf, FCo, elu, out_dtype, act=False,
                 act_F=0, use_bias=True):
    """One (b, t) block: out[th, wf, :] = sum_i sum_ky
    act(x_i[th+ky, wf, :]) @ w_i[ky] (+ bias, ELU). x blocks carry 2 halo
    rows. With `act`, two extra (1, HC) refs (s, b) precede the output and
    the input transform relu(x*s + b) — a BN affine + ReLU — runs on the
    fly in VMEM (the activated tensor never exists in HBM)."""
    xs = refs[:n_in]
    ws = refs[n_in:2 * n_in]
    k = 2 * n_in
    b_ref = refs[k] if use_bias else None
    k += use_bias
    s_ref = t_ref = None
    if act:
        s_ref, t_ref = refs[k], refs[k + 1]
        k += 2
    o_ref = refs[k]
    acc = None
    for i in range(n_in):
        HC = xs[i].shape[-1]
        if act:
            Ci = HC // (act_F + 2)
            border, row0, rowl = _act_masks(TH, Wf, HC, Ci, act_F)
            first = pl.program_id(1) == 0
            last = pl.program_id(1) == pl.num_programs(1) - 1
        for ky in range(3):
            xk = xs[i][0, 0, ky:ky + TH].reshape(TH * Wf, HC)
            if act:
                xk = jnp.maximum(xk * s_ref[0][None, :] + t_ref[0][None, :],
                                 jnp.zeros((), xk.dtype))
                # the zero halo borders must STAY zero after the affine
                # (the oracle pads the ACTIVATED tensor): re-zero the W
                # border slots, and the H pad rows where this ky slice
                # touches them (global row -1 in tile 0 / row H in the
                # last tile)
                dead = border
                if ky == 0:
                    dead = jnp.logical_or(dead, jnp.logical_and(row0, first))
                if ky == 2:
                    dead = jnp.logical_or(dead, jnp.logical_and(rowl, last))
                xk = jnp.where(dead, jnp.zeros((), xk.dtype), xk)
            d = jax.lax.dot_general(
                xk, ws[i][ky], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
    y = acc
    if use_bias:
        y = y + b_ref[0].astype(jnp.float32)[None, :]
    if elu:
        # Mosaic has no expm1 lowering; exp-1 in f32 is fine here (the
        # subtraction cancellation expm1 avoids only matters near 0,
        # where |exp(y)-1-y| < f32 eps anyway for the bf16-cast output)
        y = jnp.where(y > 0, y, jnp.exp(y) - 1.0)
    o_ref[0, 0] = y.reshape(TH, Wf, FCo).astype(out_dtype)


def _wgrad_kernel(*refs, TH, Wf, act=False, act_F=0):
    """Accumulate dW_halo[ky] += act(x[th+ky])^T @ g over the (B, nT)
    grid. Output block (3, HC, FCo) f32, constant index (TPU grids run
    sequentially, so read-modify-write accumulation is safe). With `act`,
    the input transform relu(x*s + b) is recomputed on the fly."""
    x_ref, g_ref = refs[0], refs[1]
    s_ref = t_ref = None
    if act:
        s_ref, t_ref = refs[2], refs[3]
    o_ref = refs[-1]
    b = pl.program_id(0)
    t = pl.program_id(1)
    HC = x_ref.shape[-1]
    FCo = g_ref.shape[-1]
    g = g_ref[0, 0].reshape(TH * Wf, FCo)

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    if act:
        Ci = HC // (act_F + 2)
        border, row0, rowl = _act_masks(TH, Wf, HC, Ci, act_F)
        first = t == 0
        last = t == pl.num_programs(1) - 1
    for ky in range(3):
        xk = x_ref[0, 0, ky:ky + TH].reshape(TH * Wf, HC)
        if act:
            xk = jnp.maximum(xk * s_ref[0][None, :] + t_ref[0][None, :],
                             jnp.zeros((), xk.dtype))
            dead = border
            if ky == 0:
                dead = jnp.logical_or(dead, jnp.logical_and(row0, first))
            if ky == 2:
                dead = jnp.logical_or(dead, jnp.logical_and(rowl, last))
            xk = jnp.where(dead, jnp.zeros((), xk.dtype), xk)
        d = jax.lax.dot_general(xk, g, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[ky] += d


def _run_conv(halos, whs, bias_f, *, H_out, Wf, FCo, elu, out_dtype,
              interpret, act_sb=None, act_F=0):
    """Drive _conv_kernel: halos are H-padded (>= H_out+2 rows) halo
    tensors; returns (B, H_out, Wf, FCo) in out_dtype. act_sb: optional
    ((1, HC) scale, (1, HC) bias) fused input transform relu(x*s+b)."""
    B = halos[0].shape[0]
    db = jnp.dtype(halos[0].dtype).itemsize
    TH, nT, _ = _tile(H_out, _row_bytes([h.shape[-1] for h in halos], Wf,
                                        FCo, db, jnp.dtype(out_dtype)
                                        .itemsize))
    if act_sb is not None:
        # the act masks only cover the REAL H-pad rows; zero-extension
        # rows would activate to relu(b) != 0 at the last tile's masked
        # position (eligible_enc pre-screens this)
        assert nT * TH == H_out, (H_out, TH, nT)
    stacks = [_stack_windows(h, TH, nT) for h in halos]
    operands = list(stacks) + list(whs)
    in_specs = []
    for h in stacks:
        HC = h.shape[-1]
        in_specs.append(pl.BlockSpec(
            (1, 1, TH + 2, Wf, HC),
            lambda b, t: (b, t, 0, 0, 0), memory_space=pltpu.VMEM))
    for w in whs:
        in_specs.append(pl.BlockSpec(
            w.shape, lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM))
    use_bias = bias_f is not None
    if use_bias:
        in_specs.append(pl.BlockSpec((1, FCo), lambda b, t: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(bias_f)
    if act_sb is not None:
        for v in act_sb:
            in_specs.append(pl.BlockSpec(v.shape, lambda b, t: (0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(v)
    out_spec = pl.BlockSpec((1, 1, TH, Wf, FCo),
                            lambda b, t: (b, t, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_conv_kernel, n_in=len(halos), TH=TH, Wf=Wf, FCo=FCo,
                elu=elu, out_dtype=out_dtype, act=act_sb is not None,
                act_F=act_F, use_bias=use_bias),
        grid=(B, nT),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, nT, TH, Wf, FCo), out_dtype),
        interpret=interpret,
    )(*operands)
    return out.reshape(B, nT * TH, Wf, FCo)[:, :H_out]


def _run_wgrad(halo, gp, *, H, Wf, interpret, act_sb=None, act_F=0):
    """dW in halo form: (3, HC, FCo) f32. halo has H+2 rows, gp has H.
    act_sb: optional fused relu(x*s+b) input transform (recomputed here
    instead of materializing the activation for the backward)."""
    B = halo.shape[0]
    HC = halo.shape[-1]
    FCo = gp.shape[-1]
    db = jnp.dtype(halo.dtype).itemsize
    TH, nT, pad = _tile(H, _row_bytes([HC], Wf, FCo, db,
                                      jnp.dtype(gp.dtype).itemsize))
    if act_sb is not None:
        # same invariant as _run_conv's act path: _act_masks only covers
        # the REAL H-pad rows (first/last tile); a zero-extension row
        # would recompute relu(b) != 0 and silently contaminate dW. The
        # forward's assert protects this only while both _row_bytes calls
        # coincide — fail loudly here if the tilings ever diverge.
        assert nT * TH == H, (H, TH, nT)
    xs = _stack_windows(halo, TH, nT)
    if pad:
        gp = jnp.concatenate(
            [gp, jnp.zeros((B, pad, Wf, FCo), gp.dtype)], axis=1)
    gs = gp.reshape(B, nT, TH, Wf, FCo)
    operands = [xs, gs]
    in_specs = [
        pl.BlockSpec((1, 1, TH + 2, Wf, HC),
                     lambda b, t: (b, t, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, TH, Wf, FCo),
                     lambda b, t: (b, t, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if act_sb is not None:
        for v in act_sb:
            in_specs.append(pl.BlockSpec(v.shape, lambda b, t: (0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(v)
    return pl.pallas_call(
        partial(_wgrad_kernel, TH=TH, Wf=Wf, act=act_sb is not None,
                act_F=act_F),
        grid=(B, nT),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, HC, FCo), lambda b, t: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, HC, FCo), jnp.float32),
        interpret=interpret,
    )(*operands)


# ------------------------------------------------------------- public op

@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fold_conv3x3_pallas(inputs, kernels, bias, F, Cis, elu, interpret):
    """Reflect-pad 3x3 conv over the virtual concat of folded `inputs`
    (+ bias, + ELU when `elu`), as fused Pallas kernels.

    inputs: tuple of (B, H, Wf, F*Ci) folded tensors; kernels: matching
    tuple of (3, 3, Ci, Co) base weights; bias (Co,); Cis: static tuple
    of the original Ci. Returns (B, H, Wf, F*Co) in the input dtype.
    Same multiply-add set as conv3x3_folded(..., halo=True); semantics =
    reference layers.py ConvBlock/Conv3x3.
    """
    y, _ = _fwd(inputs, kernels, bias, F, Cis, elu, interpret)
    return y


def _fwd(inputs, kernels, bias, F, Cis, elu, interpret):
    x0 = inputs[0]
    B, H, Wf, _ = x0.shape
    dt = x0.dtype
    Co = kernels[0].shape[-1]
    FCo = F * Co
    halos = [_reflect_h(_halo_w(x, F, Ci)) for x, Ci in zip(inputs, Cis)]
    whs = [_halo_weights(w, F, dt) for w in kernels]
    bias_f = jnp.tile(bias, F).astype(jnp.float32).reshape(1, FCo)
    y = _run_conv(halos, whs, bias_f, H_out=H, Wf=Wf, FCo=FCo, elu=elu,
                  out_dtype=dt, interpret=interpret)
    return y, (inputs, kernels, y if elu else None)


def _bwd(F, Cis, elu, interpret, res, g):
    """Padded-domain decomposition: fwd = Conv_valid(P(x)) with P the
    reflect pad, so dx = P^T(dXP). dXP over the interior columns is the
    zero-pad correlation with the flipped/transposed kernel (the SAME
    Pallas kernel); its two W-pad columns are single-original-column
    einsums in XLA; P^T then adds pad rows/cols to rows 1/H-2 and
    original columns 1/W-2."""
    inputs, kernels, y = res
    x0 = inputs[0]
    B, H, Wf, _ = x0.shape
    dt = x0.dtype
    Co = kernels[0].shape[-1]
    FCo = F * Co
    g = g.astype(jnp.float32)
    if elu:
        yf = y.astype(jnp.float32)
        g = g * jnp.where(yf > 0, 1.0, yf + 1.0)
    gp = g.astype(dt)

    # dXP rows r in -1..H need gp rows r-1..r+1 -> pad gp by 2 each side
    z2 = jnp.zeros((B, 2, Wf, FCo), dt)
    gp_rows = jnp.concatenate([z2, gp, z2], axis=1)       # (B, H+4, Wf, FCo)
    gph = _halo_w_zero(gp_rows, F, Co)
    W = Wf * F
    dxs = []
    for w, Ci in zip(kernels, Cis):
        whT = _halo_weights(_flip_swap(w), F, dt)
        dxp = _run_conv([gph], [whT], jnp.zeros((1, F * Ci), jnp.float32),
                        H_out=H + 2, Wf=Wf, FCo=F * Ci, elu=False,
                        out_dtype=jnp.float32, interpret=interpret)
        # rows of dxp are padded rows -1..H: collapse the H reflect
        dx = dxp[:, 1:H + 1]
        dx = dx.at[:, 1].add(dxp[:, 0])
        dx = dx.at[:, H - 2].add(dxp[:, H + 1])
        # W-pad columns: dXP[., -1] = sum_ky w[ky,0]^T gp[.+1-ky, col 0];
        # dXP[., W] = sum_ky w[ky,2]^T gp[.+1-ky, col W-1]. Original col 0
        # is slot 0 of folded col 0; col W-1 is slot F-1 of folded Wf-1.
        gcl = gp_rows[:, :, 0, :Co].astype(jnp.float32)        # (B, H+4, Co)
        gcr = gp_rows[:, :, Wf - 1, (F - 1) * Co:].astype(jnp.float32)
        wf32 = w.astype(jnp.float32)
        dpl = sum(jnp.einsum("bhc,dc->bhd", gcl[:, 2 - ky:2 - ky + H + 2],
                             wf32[ky, 0]) for ky in range(3))
        dpr = sum(jnp.einsum("bhc,dc->bhd", gcr[:, 2 - ky:2 - ky + H + 2],
                             wf32[ky, 2]) for ky in range(3))
        # their rows are padded rows -1..H too: collapse H reflect, then
        # scatter: pad col -1 reflects to original col 1, pad col W to W-2
        dpl = dpl[:, 1:H + 1].at[:, 1].add(dpl[:, 0]).at[:, H - 2].add(
            dpl[:, H + 1])
        dpr = dpr[:, 1:H + 1].at[:, 1].add(dpr[:, 0]).at[:, H - 2].add(
            dpr[:, H + 1])
        u = dx.reshape(B, H, W, Ci)
        u = u.at[:, :, 1].add(dpl)
        u = u.at[:, :, W - 2].add(dpr)
        dxs.append(u.reshape(B, H, Wf, F * Ci).astype(x0.dtype))

    # weight grads: halo-form Pallas accumulation + base projection
    ind = _halo_indicator(F)
    dws = []
    for x, w, Ci in zip(inputs, kernels, Cis):
        halo = _reflect_h(_halo_w(x, F, Ci))
        dwh = _run_wgrad(halo, gp, H=H, Wf=Wf, interpret=interpret)
        dwh = dwh.reshape(3, F + 2, Ci, F, Co)
        dw = jnp.einsum("yscqb,dsq->ydcb", dwh, ind)
        dws.append(dw.astype(w.dtype))

    db = g.sum(axis=(0, 1, 2)).reshape(F, Co).sum(0).astype(jnp.float32)
    return tuple(dxs), tuple(dws), db


fold_conv3x3_pallas.defvjp(_fwd, _bwd)


# ---------------------------------------- encoder variant (zero pad)

def _sb_halo(v, F, Ci):
    """(F*Ci,) per-lane affine vector -> (1, (F+2)*Ci) halo version: halo
    slot 0 is the left neighbour's slot F-1, slot F+1 the right
    neighbour's slot 0."""
    return jnp.concatenate([v[(F - 1) * Ci:], v, v[:Ci]]).reshape(1, -1)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fold_conv3x3_zero_pallas(x, w, s, b, F, Ci, act, interpret):
    """Zero-pad (SAME) bias-free 3x3 folded conv — the encoder basic-block
    conv (reference torchvision BasicBlock via networks/resnet_encoder.py)
    — with the PRECEDING BatchNorm affine + ReLU optionally fused on the
    input side: y = conv3x3(relu(x*s + b)) when `act`, conv3x3(x)
    otherwise. x (B, H, Wf, F*Ci) folded; w (3, 3, Ci, Co); s/b (F*Ci,)
    per-lane affine (models/norm.py BatchNorm return_affine). The
    activated tensor never exists in HBM — forward and both backwards
    recompute it on the fly in VMEM."""
    y, _ = _zfwd(x, w, s, b, F, Ci, act, interpret)
    return y


def _zfwd(x, w, s, b, F, Ci, act, interpret):
    B, H, Wf, _ = x.shape
    dt = x.dtype
    Co = w.shape[-1]
    halo = _halo_w_zero(x, F, Ci)
    z1 = jnp.zeros((B, 1) + halo.shape[2:], dt)
    hpad = jnp.concatenate([z1, halo, z1], axis=1)
    wh = _halo_weights(w, F, dt)
    sb = ((_sb_halo(s.astype(dt), F, Ci), _sb_halo(b.astype(dt), F, Ci))
          if act else None)
    y = _run_conv([hpad], [wh], None, H_out=H, Wf=Wf, FCo=F * Co,
                  elu=False, out_dtype=dt, interpret=interpret, act_sb=sb,
                  act_F=F)
    return y, (x, w, s, b)


def _zbwd(F, Ci, act, interpret, res, g):
    x, w, s, b = res
    B, H, Wf, _ = x.shape
    dt = x.dtype
    Co = w.shape[-1]
    gp = g.astype(dt)

    # grad wrt the ACTIVATED input: zero-pad correlation, interior rows
    z2 = jnp.zeros((B, 2, Wf, F * Co), dt)
    gp_rows = jnp.concatenate([z2, gp, z2], axis=1)
    gph = _halo_w_zero(gp_rows, F, Co)
    whT = _halo_weights(_flip_swap(w), F, dt)
    da = _run_conv([gph], [whT], None, H_out=H + 2, Wf=Wf, FCo=F * Ci,
                   elu=False, out_dtype=dt, interpret=interpret)[:, 1:H + 1]

    if act:
        sf = s.astype(dt)
        t = x * sf + b.astype(dt)
        dt_ = jnp.where(t > 0, da, jnp.zeros((), dt))
        dx = dt_ * sf
        ds = (dt_.astype(jnp.float32) * x.astype(jnp.float32)).sum(
            axis=(0, 1, 2)).astype(s.dtype)
        db = dt_.astype(jnp.float32).sum(axis=(0, 1, 2)).astype(b.dtype)
    else:
        dx, ds, db = da, jnp.zeros_like(s), jnp.zeros_like(b)

    halo = _halo_w_zero(x, F, Ci)
    z1 = jnp.zeros((B, 1) + halo.shape[2:], dt)
    hpad = jnp.concatenate([z1, halo, z1], axis=1)
    sb = ((_sb_halo(s.astype(dt), F, Ci), _sb_halo(b.astype(dt), F, Ci))
          if act else None)
    dwh = _run_wgrad(hpad, gp, H=H, Wf=Wf, interpret=interpret, act_sb=sb,
                     act_F=F)
    dwh = dwh.reshape(3, F + 2, Ci, F, Co)
    dw = jnp.einsum("yscqb,dsq->ydcb", dwh, _halo_indicator(F))
    return dx, dw.astype(w.dtype), ds, db


fold_conv3x3_zero_pallas.defvjp(_zfwd, _zbwd)


def analytic_costs(B, H, Wf, F, Cis, Co, dtype_bytes=2):
    """(flops, hbm_bytes) per fwd+bwd call, for bench_anatomy --costs."""
    HC = sum((F + 2) * Ci for Ci in Cis)
    FCo = F * Co
    m = B * H * Wf
    fwd = 2 * m * HC * FCo
    dgrad = 2 * B * (H + 2) * Wf * (F + 2) * FCo * sum(
        F * Ci for Ci in Cis) // max(FCo, 1)
    wgrad = fwd
    flops = fwd + dgrad + wgrad
    bts = dtype_bytes * m * (2 * HC + 3 * FCo + 2 * sum(
        F * Ci for Ci in Cis))
    return flops, bts
