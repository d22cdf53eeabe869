"""Fused Pallas TPU kernels for the W-folded reflect-pad 3x3 conv.

Why: the decoder's folded convs are exact and lane-dense (ops/folded.py)
but the XLA lowering EXPLODES into ops — conv + 4 border-correction convs
+ 2 scatter-adds forward, ~5x that backward — and the round-4 HLO audit
(PERF.md) showed the train step is staging/op-granularity-bound, not
compute-bound. This module collapses each ConvBlock (reference
layers.py:100-130: ReflectionPad2d + Conv2d 3x3 + ELU) into ONE Pallas
kernel forward and two backward (input-grad reuses the forward kernel
with the flipped/transposed weights; weight-grad is a grid-accumulated
kernel), with only cheap glue left in XLA.

Formulation (round 5, BASE form — supersedes the round-4 halo form): the
kernel reads the folded tensor (B, H, Wf, F*C) DIRECTLY. Round 4 fed the
kernels XLA-materialized halo tensors ((F+2)/F lane inflation + window
stacks, ~575 MB/conv of staged traffic) and measured 35% slower than the
XLA path in context (BENCH_r04 r4_foldconv_b24); the base form removes
the halo entirely. In the merged ((TH+2)*Wf, F*C) row view of a row tile
(a free shape cast when Wf % 8 == 0), the three unfolded-W taps of the
3x3 conv are:

  out += X_ky  @ G0[ky]   # intra-folded-column slot moves (F*C lanes)
  out += L_ky  @ Gm[ky]   # left cross-column wrap: rows rolled +1,
                          #   lane-sliced to slot F-1 (C lanes)
  out += R_ky  @ Gp[ky]   # right wrap: rows rolled -1, slot 0

where X_ky = merged rows [ky*Wf, ky*Wf + TH*Wf). The +-1 row rolls
(pltpu.roll on the lane-sliced copy) realize the folded-column shift
in-kernel; the roll's wrapped rows land exactly on the w==0 / w==Wf-1
border rows, which a select replaces with the W-reflect column (torch
ReflectionPad2d: col -1 == col 1) or zero (the conv-transpose /
encoder zero-pad variants). G0/Gm/Gp are slices of ops/folded.py's
fold_kernel3x3 band kernel, so the MAC count is (F+2)/F per dense MAC —
identical to the halo form — while the input is read ONCE at F*C lanes.
H reflect/zero padding stays in XLA (2 rows, cheap); the H-overlap
window stacking (~2/TH duplication) remains the only input duplication.

Backward: fwd = Conv_valid(P(x)) with P the reflect pad, so
dx = P^T(dXP); dXP over interior columns is the zero-pad correlation
with the flipped/transposed kernel (the SAME kernel, zero-select
borders); the two W-pad columns are single-original-column einsums in
XLA; P^T adds pad rows/cols to rows 1/H-2 and original columns 1/W-2.

Exactness: the base formulation is the same multiply-add set as the
band formulation (ops/folded.conv3x3_folded); tested against it fwd +
all grads in tests/test_pallas_fold_conv.py (incl. multi-tile H).

Eligibility (the dispatcher falls back to the XLA path otherwise):
Wf % 8 == 0 — the (TH, Wf) -> (TH*Wf, ·) merges must be free shape
casts. Everything in the flagship decoder except the 6x20x512 stage
qualifies.

Hardware verdict (round 5, v5e b12 — PERF.md): NEGATIVE in context.
Decoder kernels: net_grad 38.9 -> 62.8 ms; encoder fused-act kernels:
38.9 -> 43.7 ms. The per-invocation cost is kernel-body serialization
(the f32 wrap rolls + border selects between the 9 per-tile dots defeat
Mosaic's MXU/VPU pipeline), not bytes — the XLA-side prep copies total
~0.7 ms. Both kernels ship DEFAULT-OFF behind FUSIONDEPTH_PALLAS_FOLDCONV
/ FUSIONDEPTH_PALLAS_ENCCONV as tested, exact formulations; the XLA
band-conv path (ops/folded.py + fastpad) remains the production path.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fusiondepth_tpu.ops.folded import fold_kernel3x3


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
    rb = _row_bytes([FC], [FC // F], Wf, FC, db_in, db_out, act=True)
    return eligible(xf_shape, F) and _tile(H, rb)[2] == 0


def _tile(H_out: int, row_bytes: int = 0):
    """(TH, nT, pad): output-row tiling. Prefers an exact divisor <= 50;
    otherwise the TH <= 50 minimizing zero-row padding (dgrad's H+2 can be
    2*97 etc.). row_bytes (double-buffered input+output+scratch bytes per
    output row, lane-padded) caps TH so the block fits Mosaic's ~16 MB
    scoped VMEM (probed on the round-4 halo form: upconv_1_1 at TH=48
    needed 16.65 MB; the base form holds strictly less per row)."""
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


def _row_bytes(fcs, cis, Wf, FCo, db_in, db_out, act=False):
    """Per-output-row VMEM estimate for _tile, modeling what Mosaic keeps
    live on the kernel stack (calibrated on a v5e compile OOM, round 5:
    the dual-128-lane-input conv at TH=48 needed 20.21 MB ≈ 421 KB/row —
    the f32 roll copies and dot accumulators dominate, not the blocks):
    double-buffered input+output blocks, the f32 wrap-slot roll copies
    (cast source + rolled result for each of Sm/Sp, 32-bit — Mosaic's
    dynamic_rotate has no narrow-dtype lowering), the f32 accumulators,
    and the act-transform scratch. Lane dims padded to 128."""
    def pad128(c):
        return -(-c // 128) * 128

    rb_in = sum(Wf * pad128(fc) * db_in for fc in fcs)
    rb_out = Wf * pad128(FCo) * db_out
    rolls = sum(4 * Wf * pad128(ci) * 4 for ci in cis)
    acc = 2 * Wf * pad128(FCo) * 4
    scratch = Wf * pad128(max(fcs)) * db_in if act else 0
    return 2 * (rb_in + rb_out) + rolls + acc + scratch


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


def _reflect_h(xh):
    """H reflect pad by 1 row (edge excluded)."""
    return jnp.concatenate([xh[:, 1:2], xh, xh[:, -2:-1]], axis=1)


def _flip_swap(w):
    """(3, 3, Ci, Co) -> (3, 3, Co, Ci): the input-grad base kernel
    (spatial flip + channel transpose; the fold commutes with it)."""
    return jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)


def _base_weights(w, F: int, dtype):
    """(3, 3, Ci, Co) -> the base-form W-tap weights, all slices of the
    fold_kernel3x3 band kernel (ops/folded.py:82-104):
      G0 (3, F*Ci, F*Co)  intra-column taps (band kernel's center W tap),
      Gm (3,   Ci, F*Co)  left wrap (source slot F-1 -> out slot 0),
      Gp (3,   Ci, F*Co)  right wrap (source slot 0 -> out slot F-1)."""
    Ci = w.shape[2]
    fk = fold_kernel3x3(w, F)
    if F == 1:
        return (fk[:, 1].astype(dtype), fk[:, 0].astype(dtype),
                fk[:, 2].astype(dtype))
    return (fk[:, 1].astype(dtype),
            fk[:, 0, (F - 1) * Ci:].astype(dtype),
            fk[:, 2, :Ci].astype(dtype))


def _fold_center_ind(F: int):
    """(F, F, 3) 0/1 map of fold_kernel3x3's CENTER W tap: [pi, po, dx+1]
    is 1 iff pi - po = dx — projects the dG0 grad back to (3, 3, Ci, Co)."""
    ind = np.zeros((F, F, 3), np.float32)
    for pi in range(F):
        for po in range(F):
            dx = pi - po
            if -1 <= dx <= 1:
                ind[pi, po, dx + 1] = 1.0
    return jnp.asarray(ind)


def _project_dw(dG0, dGm, dGp, F: int, Ci: int, Co: int):
    """Base-form weight grads -> (3, 3, Ci, Co): the adjoint of
    _base_weights' placement."""
    dw = jnp.einsum("ypcqb,pqd->ydcb",
                    dG0.reshape(3, F, Ci, F, Co), _fold_center_ind(F))
    dw = dw.at[:, 0].add(dGm[:, :, :Co])
    dw = dw.at[:, 2].add(dGp[:, :, (F - 1) * Co:])
    return dw


# ---------------------------------------------------------------- kernels

def _tap_operands(M, F, Ci, FC, TH, Wf, reflect):
    """Shared operand construction for the conv and wgrad kernels: the
    merged window M ((TH+2)*Wf, FC) -> per-ky (X, L, R) tap operands.

    The cross-column W taps are +-1 row rolls of the wrap-slot lane
    slice; the roll's wrapped rows coincide with the w==0 / w==Wf-1
    border rows, which the select replaces with the W-reflect column
    (reflect) or zero (zero pad)."""
    L = TH * Wf

    def roll_rows(v, shift):
        # Mosaic's tpu.dynamic_rotate only lowers for 32-bit element
        # types (probed on v5e: "Rotate with non-32-bit data" for bf16);
        # roll narrow floats through f32 — exact (f32 holds every bf16)
        if v.dtype.itemsize == 4:
            return pltpu.roll(v, shift, 0)
        return pltpu.roll(v.astype(jnp.float32), shift, 0).astype(v.dtype)

    Sm = M[:, (F - 1) * Ci:] if F > 1 else M
    Sp = M[:, :Ci]
    Rm = roll_rows(Sm, 1)                   # Rm[m] = Sm[m-1]
    Rp = roll_rows(Sp, M.shape[0] - 1)      # Rp[m] = Sp[m+1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (L, Ci), 0)
    col = rows - (rows // Wf) * Wf
    at_w0 = col == 0
    at_wl = col == Wf - 1
    out = []
    for ky in range(3):
        X = M[ky * Wf:ky * Wf + L]
        Xm = Rm[ky * Wf:ky * Wf + L]
        Xp = Rp[ky * Wf:ky * Wf + L]
        if reflect:
            # torch ReflectionPad2d (edge excluded): original col -1 ==
            # col 1 (slot 1, or folded col +1 when F == 1); col W == col
            # W-2 (slot F-2, or folded col -1 when F == 1)
            refl_l = X[:, Ci:2 * Ci] if F > 1 else Xp
            refl_r = X[:, (F - 2) * Ci:(F - 1) * Ci] if F > 1 else Xm
            Lk = jnp.where(at_w0, refl_l, Xm)
            Rk = jnp.where(at_wl, refl_r, Xp)
        else:
            z = jnp.zeros((), M.dtype)
            Lk = jnp.where(at_w0, z, Xm)
            Rk = jnp.where(at_wl, z, Xp)
        out.append((X, Lk, Rk))
    return out


def _act_transform(M, s_ref, t_ref, TH, Wf):
    """Fused BN-affine + ReLU input transform relu(M*s + t) on the merged
    window, with the H zero-pad rows re-zeroed (relu(t) != 0 there; the
    pad row is window row 0 only in tile 0 and row TH+1 only in the last
    tile — eligible_enc guarantees no zero-extension rows exist)."""
    M = jnp.maximum(M * s_ref[0][None, :] + t_ref[0][None, :],
                    jnp.zeros((), M.dtype))
    mrows = jax.lax.broadcasted_iota(jnp.int32, M.shape, 0)
    first = pl.program_id(1) == 0
    last = pl.program_id(1) == pl.num_programs(1) - 1
    dead = jnp.logical_or(jnp.logical_and(mrows < Wf, first),
                          jnp.logical_and(mrows >= (TH + 1) * Wf, last))
    return jnp.where(dead, jnp.zeros((), M.dtype), M)


def _conv_kernel(*refs, n_in, TH, Wf, FCo, F, Cis, elu, out_dtype,
                 reflect, act=False, use_bias=True):
    """One (b, t) block of the base-form folded conv (module docstring).
    With `act`, two extra (1, FC) refs (s, t) precede the output and the
    input transform relu(x*s + t) — a BN affine + ReLU — runs once per
    window in VMEM (the activated tensor never exists in HBM)."""
    xs = refs[:n_in]
    g0s = refs[n_in:2 * n_in]
    gms = refs[2 * n_in:3 * n_in]
    gps = refs[3 * n_in:4 * n_in]
    k = 4 * n_in
    b_ref = refs[k] if use_bias else None
    k += use_bias
    s_ref = t_ref = None
    if act:
        s_ref, t_ref = refs[k], refs[k + 1]
        k += 2
    o_ref = refs[k]
    acc = None
    for i in range(n_in):
        FC = xs[i].shape[-1]
        M = xs[i][0, 0].reshape((TH + 2) * Wf, FC)
        if act:
            M = _act_transform(M, s_ref, t_ref, TH, Wf)
        taps = _tap_operands(M, F, Cis[i], FC, TH, Wf, reflect)
        for ky, (X, Lk, Rk) in enumerate(taps):
            d = jax.lax.dot_general(
                X, g0s[i][ky], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            d = d + jax.lax.dot_general(
                Lk, gms[i][ky], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            d = d + jax.lax.dot_general(
                Rk, gps[i][ky], (((1,), (0,)), ((), ())),
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


def _run_conv(bases, wts, bias_f, *, H_out, Wf, F, Cis, FCo, elu,
              out_dtype, reflect, interpret, act_sb=None):
    """Drive _conv_kernel: bases are H-padded (>= H_out+2 rows) FOLDED
    tensors (B, ., Wf, F*Ci); wts = per-input (G0, Gm, Gp) triples;
    returns (B, H_out, Wf, FCo) in out_dtype. act_sb: optional
    ((1, FC) scale, (1, FC) bias) fused input transform relu(x*s+b)."""
    B = bases[0].shape[0]
    db = jnp.dtype(bases[0].dtype).itemsize
    TH, nT, _ = _tile(H_out, _row_bytes([h.shape[-1] for h in bases],
                                        list(Cis), Wf, FCo, db,
                                        jnp.dtype(out_dtype).itemsize,
                                        act=act_sb is not None))
    if act_sb is not None:
        # _act_transform's pad-row masks only cover the REAL H-pad rows;
        # zero-extension rows would activate to relu(b) != 0 at the last
        # tile's masked position (eligible_enc pre-screens this)
        assert nT * TH == H_out, (H_out, TH, nT)
    stacks = [_stack_windows(h, TH, nT) for h in bases]
    operands = list(stacks)
    in_specs = []
    for h in stacks:
        FC = h.shape[-1]
        in_specs.append(pl.BlockSpec(
            (1, 1, TH + 2, Wf, FC),
            lambda b, t: (b, t, 0, 0, 0), memory_space=pltpu.VMEM))
    for gi in range(3):  # G0s, then Gms, then Gps (kernel unpack order)
        for triple in wts:
            w = triple[gi]
            in_specs.append(pl.BlockSpec(
                w.shape, lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM))
            operands.append(w)
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
        partial(_conv_kernel, n_in=len(bases), TH=TH, Wf=Wf, FCo=FCo,
                F=F, Cis=tuple(Cis), elu=elu, out_dtype=out_dtype,
                reflect=reflect, act=act_sb is not None, use_bias=use_bias),
        grid=(B, nT),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, nT, TH, Wf, FCo), out_dtype),
        interpret=interpret,
    )(*operands)
    return out.reshape(B, nT * TH, Wf, FCo)[:, :H_out]


def _wgrad_kernel(*refs, TH, Wf, F, Ci, reflect, act=False):
    """Accumulate the base-form weight grads over the (B, nT) grid:
    dG0[ky] += X^T @ g, dGm[ky] += L^T @ g, dGp[ky] += R^T @ g — the SAME
    tap operands as the forward (incl. the reflect/zero border selects,
    so the reflect columns' grad lands on w[ky, 0/2] exactly as the
    oracle's padded conv does). Output blocks are constant-indexed (TPU
    grids run sequentially, so read-modify-write accumulation is safe).
    With `act`, the input transform relu(x*s + b) is recomputed on the
    fly."""
    x_ref, g_ref = refs[0], refs[1]
    s_ref = t_ref = None
    if act:
        s_ref, t_ref = refs[2], refs[3]
    o0_ref, om_ref, op_ref = refs[-3], refs[-2], refs[-1]
    b = pl.program_id(0)
    t = pl.program_id(1)
    FC = x_ref.shape[-1]
    FCo = g_ref.shape[-1]
    g = g_ref[0, 0].reshape(TH * Wf, FCo)

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _init():
        o0_ref[...] = jnp.zeros_like(o0_ref)
        om_ref[...] = jnp.zeros_like(om_ref)
        op_ref[...] = jnp.zeros_like(op_ref)

    M = x_ref[0, 0].reshape((TH + 2) * Wf, FC)
    if act:
        M = _act_transform(M, s_ref, t_ref, TH, Wf)
    taps = _tap_operands(M, F, Ci, FC, TH, Wf, reflect)
    for ky, (X, Lk, Rk) in enumerate(taps):
        o0_ref[ky] += jax.lax.dot_general(
            X, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        om_ref[ky] += jax.lax.dot_general(
            Lk, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        op_ref[ky] += jax.lax.dot_general(
            Rk, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _run_wgrad(base, gp, *, H, Wf, F, Ci, reflect, interpret, act_sb=None):
    """Base-form dW: (dG0 (3, FC, FCo), dGm (3, Ci, FCo), dGp) f32.
    base has H+2 rows, gp has H. act_sb: optional fused relu(x*s+b)
    input transform (recomputed here instead of materializing the
    activation for the backward)."""
    B = base.shape[0]
    FC = base.shape[-1]
    FCo = gp.shape[-1]
    db = jnp.dtype(base.dtype).itemsize
    TH, nT, pad = _tile(H, _row_bytes([FC], [Ci], Wf, FCo, db,
                                      jnp.dtype(gp.dtype).itemsize,
                                      act=act_sb is not None))
    if act_sb is not None:
        # same invariant as _run_conv's act path: the pad-row masks only
        # cover the REAL H-pad rows; a zero-extension row would recompute
        # relu(b) != 0 and silently contaminate dW — fail loudly if the
        # two tilings ever diverge
        assert nT * TH == H, (H, TH, nT)
    xs = _stack_windows(base, TH, nT)
    if pad:
        gp = jnp.concatenate(
            [gp, jnp.zeros((B, pad, Wf, FCo), gp.dtype)], axis=1)
    gs = gp.reshape(B, nT, TH, Wf, FCo)
    operands = [xs, gs]
    in_specs = [
        pl.BlockSpec((1, 1, TH + 2, Wf, FC),
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
    const = pl.BlockSpec((3, FC, FCo), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    const_c = pl.BlockSpec((3, Ci, FCo), lambda b, t: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_wgrad_kernel, TH=TH, Wf=Wf, F=F, Ci=Ci, reflect=reflect,
                act=act_sb is not None),
        grid=(B, nT),
        in_specs=in_specs,
        out_specs=(const, const_c, const_c),
        out_shape=(jax.ShapeDtypeStruct((3, FC, FCo), jnp.float32),
                   jax.ShapeDtypeStruct((3, Ci, FCo), jnp.float32),
                   jax.ShapeDtypeStruct((3, Ci, FCo), jnp.float32)),
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
    Same multiply-add set as conv3x3_folded; semantics = reference
    layers.py ConvBlock/Conv3x3.
    """
    y, _ = _fwd(inputs, kernels, bias, F, Cis, elu, interpret)
    return y


def _fwd(inputs, kernels, bias, F, Cis, elu, interpret):
    x0 = inputs[0]
    B, H, Wf, _ = x0.shape
    dt = x0.dtype
    Co = kernels[0].shape[-1]
    FCo = F * Co
    bases = [_reflect_h(x) for x in inputs]
    wts = [_base_weights(w, F, dt) for w in kernels]
    bias_f = jnp.tile(bias, F).astype(jnp.float32).reshape(1, FCo)
    y = _run_conv(bases, wts, bias_f, H_out=H, Wf=Wf, F=F, Cis=Cis,
                  FCo=FCo, elu=elu, out_dtype=dt, reflect=True,
                  interpret=interpret)
    return y, (inputs, kernels, y if elu else None)


def _bwd(F, Cis, elu, interpret, res, g):
    """Padded-domain decomposition: fwd = Conv_valid(P(x)) with P the
    reflect pad, so dx = P^T(dXP). dXP over the interior columns is the
    zero-pad correlation with the flipped/transposed kernel (the SAME
    Pallas kernel, zero-select borders); its two W-pad columns are
    single-original-column einsums in XLA; P^T then adds pad rows/cols
    to rows 1/H-2 and original columns 1/W-2."""
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
    W = Wf * F
    dxs = []
    for w, Ci in zip(kernels, Cis):
        wTt = _base_weights(_flip_swap(w), F, dt)
        dxp = _run_conv([gp_rows], [wTt], None, H_out=H + 2, Wf=Wf, F=F,
                        Cis=(Co,), FCo=F * Ci, elu=False,
                        out_dtype=jnp.float32, reflect=False,
                        interpret=interpret)
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

    # weight grads: base-form Pallas accumulation + base projection
    dws = []
    for x, w, Ci in zip(inputs, kernels, Cis):
        base = _reflect_h(x)
        dG0, dGm, dGp = _run_wgrad(base, gp, H=H, Wf=Wf, F=F, Ci=Ci,
                                   reflect=True, interpret=interpret)
        dws.append(_project_dw(dG0, dGm, dGp, F, Ci, Co).astype(w.dtype))

    db = g.sum(axis=(0, 1, 2)).reshape(F, Co).sum(0).astype(jnp.float32)
    return tuple(dxs), tuple(dws), db


fold_conv3x3_pallas.defvjp(_fwd, _bwd)


# ---------------------------------------- encoder variant (zero pad)

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


def _zsb(s, b, dt):
    return (s.astype(dt).reshape(1, -1), b.astype(dt).reshape(1, -1))


def _zfwd(x, w, s, b, F, Ci, act, interpret):
    B, H, Wf, FC = x.shape
    dt = x.dtype
    Co = w.shape[-1]
    z1 = jnp.zeros((B, 1, Wf, FC), dt)
    xpad = jnp.concatenate([z1, x, z1], axis=1)
    wts = _base_weights(w, F, dt)
    sb = _zsb(s, b, dt) if act else None
    y = _run_conv([xpad], [wts], None, H_out=H, Wf=Wf, F=F, Cis=(Ci,),
                  FCo=F * Co, elu=False, out_dtype=dt, reflect=False,
                  interpret=interpret, act_sb=sb)
    return y, (x, w, s, b)


def _zbwd(F, Ci, act, interpret, res, g):
    x, w, s, b = res
    B, H, Wf, FC = x.shape
    dt = x.dtype
    Co = w.shape[-1]
    gp = g.astype(dt)

    # grad wrt the ACTIVATED input: zero-pad correlation, interior rows
    z2 = jnp.zeros((B, 2, Wf, F * Co), dt)
    gp_rows = jnp.concatenate([z2, gp, z2], axis=1)
    wTt = _base_weights(_flip_swap(w), F, dt)
    da = _run_conv([gp_rows], [wTt], None, H_out=H + 2, Wf=Wf, F=F,
                   Cis=(Co,), FCo=F * Ci, elu=False, out_dtype=dt,
                   reflect=False, interpret=interpret)[:, 1:H + 1]

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

    z1 = jnp.zeros((B, 1, Wf, FC), dt)
    xpad = jnp.concatenate([z1, x, z1], axis=1)
    sb = _zsb(s, b, dt) if act else None
    dG0, dGm, dGp = _run_wgrad(xpad, gp, H=H, Wf=Wf, F=F, Ci=Ci,
                               reflect=False, interpret=interpret,
                               act_sb=sb)
    dw = _project_dw(dG0, dGm, dGp, F, Ci, Co)
    return dx, dw.astype(w.dtype), ds, db


fold_conv3x3_zero_pallas.defvjp(_zfwd, _zbwd)


def analytic_costs(B, H, Wf, F, Cis, Co, dtype_bytes=2):
    """(flops, hbm_bytes) per fwd+bwd call, for bench_anatomy --costs.
    MACs are the halo-equivalent (F+2)/F per dense MAC; bytes are the
    base form's: each input read once fwd + once wgrad, the cotangent
    read twice, plus the outputs."""
    HC = sum((F + 2) * Ci for Ci in Cis)
    FCo = F * Co
    m = B * H * Wf
    fwd = 2 * m * HC * FCo
    dgrad = 2 * B * (H + 2) * Wf * (F + 2) * FCo * sum(
        F * Ci for Ci in Cis) // max(FCo, 1)
    wgrad = fwd
    flops = fwd + dgrad + wgrad
    fci = sum(F * Ci for Ci in Cis)
    bts = dtype_bytes * m * (2 * fci + 3 * FCo + 2 * fci)
    return flops, bts
