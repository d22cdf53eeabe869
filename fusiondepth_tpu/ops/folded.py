"""W-folded tensor layout for small-channel convolutions on TPU.

Problem (measured, scripts/exp_convnet.py): XLA tiles NHWC tensors as
(8, 128) with C in the 128-lane minor dim. The depth decoder's stages run
at C = 16..64, filling 12.5..50% of every lane tile — a 3x3 16->16 conv at
192x640 b12 touches 1.05 GB for a 94 MB-dense op and runs 12x over its
byte roofline (2.5% MFU); the decoder alone is a third of the train step's
HBM bytes.

Fix: view (B, H, W, C) as (B, H, W/F, F*C) with F*C a multiple of 128
("folded"). In (W, C)-contiguous memory order this is a pure reshape, and
folds COMPOSE: the same buffer reshapes freely between any F — lane index
C*p + c for in-fold offset p is preserved. All decoder math runs folded:

- 3x3 conv -> 3x3 folded conv whose (3, 3, F*Cin, F*Cout) kernel holds the
  original weights on the fold band (dx = F*(dxf-1) + pi - po in [-1, 1])
  and zeros elsewhere. F x the MACs, but full lane occupancy: measured
  3.5x faster at C=16 despite the inflation (conv16f vs conv16).
- reflect pad -> pad H by 1 row (reflect), W by ONE FOLDED column built
  from the F reflected border columns; the band kernel reads only the
  valid first column of it (the rest hit zero weights).
- nearest 2x upsample -> row repeat + in-fold lane repeat, pure
  reshape/broadcast, stays dense.
- concat + conv -> a SUM of per-input folded convs (never materialize the
  concatenation).

Exactness: identical multiply-add sets, reassociated; f32 accumulation via
preferred_element_type, so results match the unfolded ops to dtype
tolerance (tests/test_folded.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def fold(x, F: int):
    """(B, H, W, C) -> (B, H, W/F, F*C). Free when (W, C) are contiguous."""
    if F == 1:
        return x
    B, H, W, C = x.shape
    assert W % F == 0, (W, F)
    return x.reshape(B, H, W // F, F * C)


def unfold(x, C: int):
    """(B, H, Wf, F*C) -> (B, H, Wf*F, C)."""
    B, H, Wf, FC = x.shape
    if FC == C:
        return x
    assert FC % C == 0, (FC, C)
    return x.reshape(B, H, Wf * (FC // C), C)


def refold(xf, C: int, F_to: int):
    """(B, H, Wf, F_from*C) -> (B, H, W/F_to, F_to*C): change the fold
    factor of an already-folded tensor. Folds COMPOSE — lane index
    C*p + c is preserved under any F in (W, C)-contiguous order — so this
    is one reshape (XLA collapses the unfold/fold pair)."""
    B, H, Wf, FC = xf.shape
    if FC // C == F_to:
        return xf
    W = Wf * (FC // C)
    assert W % F_to == 0, (W, F_to)
    return xf.reshape(B, H, W // F_to, F_to * C)


def fold_factor(C: int, W: int, lanes: int = 128) -> int:
    """Smallest F with F*C a lanes multiple (or 1 if C already is), capped
    by divisibility of W."""
    F = 1
    if C % lanes:
        F = int(np.lcm(C, lanes)) // C
    while W % F:
        F //= 2
    return max(F, 1)


def fold_kernel3x3(w, F: int):
    """(3, 3, Cin, Cout) -> (3, 3, F*Cin, F*Cout) band kernel.

    Same-fold taps: out slot po at folded col j reads original cols
    F*j + po + dx for dx in [-1, 0, 1], which live in folded cols
    j + dxf (dxf in {-1, 0, 1}) at slot pi with F*dxf + pi - po = dx.
    Built with ONE einsum against a constant 0/1 indicator (a python
    set-loop would emit O(9 F^2) trace ops).
    """
    if F == 1:
        return w
    _, _, Ci, Co = w.shape
    ind = np.zeros((3, F, F, 3), np.float32)
    for dxf in (-1, 0, 1):
        for pi in range(F):
            for po in range(F):
                dx = F * dxf + pi - po
                if -1 <= dx <= 1:
                    ind[dxf + 1, pi, po, dx + 1] = 1.0
    ind = jnp.asarray(ind).astype(w.dtype)
    # wf[ky, dxf, pi*Ci+ci, po*Co+co] = sum_dx w[ky, dx, ci, co] ind[...]
    wf = jnp.einsum("ydcb,xpqd->yxpcqb", w, ind)
    return wf.reshape(3, 3, F * Ci, F * Co)


def reflect_pad_folded(xf, F: int, C: int):
    """Reflect-pad a folded (B, H, Wf, F*C) tensor by 1 original pixel:
    H gains 2 rows; W gains one folded column per side holding the F
    reflected border columns (only the column nearest the image is read
    with nonzero weight by the band kernel)."""
    top = xf[:, 1:2]
    bot = xf[:, -2:-1]
    xf = jnp.concatenate([top, xf, bot], axis=1)
    if F == 1:
        left = xf[:, :, 1:2]
        right = xf[:, :, -2:-1]
    else:
        B, Hp, Wf, FC = xf.shape
        u = xf.reshape(B, Hp, Wf * F, C)
        # left pad cols -F..-1 = cols F..1 (torch reflect, edge excluded)
        left = u[:, :, F:0:-1].reshape(B, Hp, 1, FC)
        right = u[:, :, -2:-(F + 2):-1].reshape(B, Hp, 1, FC)
    return jnp.concatenate([left, xf, right], axis=2)


def halo_kernel3x3(w, F: int):
    """(3, 3, Cin, Cout) -> (3, 1, (F+2)*Cin, F*Cout) halo kernel.

    Pairs with halo_pad_folded: the W taps live in the CHANNEL dim (halo
    slot s = original in-fold column s-1, plus one neighbour column each
    side), so the conv's W extent is 1 folded column. Out slot po's tap
    dx reads halo slot po+1+dx. MAC inflation vs the dense unfolded conv
    is (F+2)/3 — vs the band kernel's F (F=8: 3.33x instead of 8x)."""
    _, _, Ci, Co = w.shape
    ind = np.zeros((3, F + 2, F), np.float32)
    for po in range(F):
        for dx in (-1, 0, 1):
            ind[dx + 1, po + 1 + dx, po] = 1.0
    ind = jnp.asarray(ind).astype(w.dtype)
    # wf[y, s*Ci+ci, q*Co+co] = sum_dx w[y, dx, ci, co] ind[dx, s, q]
    wf = jnp.einsum("ydcb,dsq->yscqb", w, ind)
    return wf.reshape(3, 1, (F + 2) * Ci, F * Co)


def halo_pad_folded(xf, F: int, C: int):
    """(B, H, Wf, F*C) -> (B, H+2, Wf, (F+2)*C): reflect-pad H by one row
    and add the two neighbour original columns as extra channel slots
    (slot 0 = original col F*j - 1, slot F+1 = col F*(j+1)); the W borders
    reflect with the edge excluded (torch semantics, matching
    reflect_pad_folded). The W-shifts are whole-folded-column slices —
    no sublane striding."""
    B, H, Wf, FC = xf.shape
    assert F >= 2, F
    xf = jnp.concatenate([xf[:, 1:2], xf, xf[:, -2:-1]], axis=1)
    last = xf[..., (F - 1) * C:]
    first = xf[..., :C]
    # col 0's left neighbour is original col -1 -> reflect -> col 1
    lh = jnp.concatenate([xf[:, :, :1, C:2 * C], last[:, :, :-1]], axis=2)
    # last col's right neighbour is col W -> reflect -> col W-2
    rh = jnp.concatenate(
        [first[:, :, 1:], xf[:, :, -1:, (F - 2) * C:(F - 1) * C]], axis=2)
    return jnp.concatenate([lh, xf, rh], axis=-1)


# A/B gate for the halo formulation. Default OFF: despite the (F+2)/3-vs-F
# MAC reduction it measured NEUTRAL forward (5.71 vs 6.00 ms decoder fwd,
# v5e b12) and SLOWER backward (14.28 vs 13.11 ms) — the (3,1,160,128)
# wgrad and the halo-concat transpose lower worse than the band conv's
# inflated-but-aligned form. Kept as a probe-able lever. Read at TRACE
# time (not import) so bench.py's ladder rungs can toggle it per rung.
def _halo_enabled() -> bool:
    import os
    return os.environ.get("FUSIONDEPTH_FOLD_HALO", "0") == "1"


# Reflect padding as zero-pad conv + border-correction convs (see
# conv3x3_folded_fastpad) instead of materializing the padded tensor.
# Read at trace time for bench-ladder A/B.
def _fastpad_enabled() -> bool:
    import os
    return os.environ.get("FUSIONDEPTH_FOLD_FASTPAD", "1") == "1"


def _reflect_border_cols(xf, F: int, C: int):
    """The two pad folded columns reflect_pad_folded would prepend/append:
    (B, H, 1, F*C) each, built from the F reflected border columns."""
    if F == 1:
        return xf[:, :, 1:2], xf[:, :, -2:-1]
    B, H, Wf, FC = xf.shape
    u = xf.reshape(B, H, Wf * F, C)
    left = u[:, :, F:0:-1].reshape(B, H, 1, FC)
    right = u[:, :, -2:-(F + 2):-1].reshape(B, H, 1, FC)
    return left, right


def conv3x3_folded_fastpad(xfi, wf, F: int, C: int):
    """Reflect-padded folded band conv WITHOUT materializing the padded
    tensor: conv is linear, so y = conv(x, zero-pad) plus border
    corrections — the missing reflect taps are four tiny convs over one
    row / one folded column each, added at static offsets. Exact same
    multiply-add set as pad-then-VALID (tests/test_folded.py).

    Corner accounting: the row fixes (ky = 0 / 2 kernel slices) use
    W-REFLECT-padded border rows, so they cover the corner taps; the
    column fixes (dxf = -1 / +1 kernel slices) then use ZERO H padding so
    rows -1/H are not double-counted.
    """
    dn = ("NHWC", "HWIO", "NHWC")
    z = jax.lax.conv_general_dilated(xfi, wf, (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=dn)

    def _rowfix(row, ky):
        lp, rp = _reflect_border_cols(row, F, C)
        rowp = jnp.concatenate([lp, row, rp], axis=2)
        return jax.lax.conv_general_dilated(
            rowp, wf[ky:ky + 1], (1, 1), "VALID", dimension_numbers=dn)

    top = _rowfix(xfi[:, 1:2], 0)
    bot = _rowfix(xfi[:, -2:-1], 2)
    lp, rp = _reflect_border_cols(xfi, F, C)
    left = jax.lax.conv_general_dilated(
        lp, wf[:, 0:1], (1, 1), ((1, 1), (0, 0)), dimension_numbers=dn)
    right = jax.lax.conv_general_dilated(
        rp, wf[:, 2:3], (1, 1), ((1, 1), (0, 0)), dimension_numbers=dn)
    z = z.at[:, 0:1].add(top)
    z = z.at[:, -1:].add(bot)
    z = z.at[:, :, 0:1].add(left)
    z = z.at[:, :, -1:].add(right)
    return z


def conv3x3_folded(inputs, kernels, bias=None, *, F: int, pad: bool = True,
                   halo: bool | None = None):
    """3x3 stride-1 conv over the (virtual) concatenation of `inputs`.

    inputs: list of folded (B, H, Wf, F*Ci) tensors (same B, H, Wf, F).
    kernels: matching list of (3, 3, Ci, Cout) weights.
    Computed as a sum of per-input folded convs — the concat is never
    materialized. Each conv runs in the input dtype (the MXU accumulates
    f32 internally either way; a mixed-dtype preferred_element_type would
    break the conv's VJP transpose); the cross-input partial sums and the
    bias add accumulate in f32. Returns f32 (caller casts).

    halo=None picks the halo-channel formulation (halo_kernel3x3) when
    F >= 2 and reflect padding is on: (F+2)/3 MAC inflation instead of
    the band kernel's F, at the cost of materializing the (F+2)/F-wider
    halo input. Identical multiply-add set either way.
    """
    if halo is None:
        halo = _halo_enabled() and F >= 2 and pad
    out = None
    for xfi, w in zip(inputs, kernels):
        Ci = w.shape[2]
        if halo:
            wf = halo_kernel3x3(w, F)
            xp = halo_pad_folded(xfi, F, Ci)
            y = jax.lax.conv_general_dilated(
                xp, wf.astype(xp.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        elif pad and _fastpad_enabled():
            wf = fold_kernel3x3(w, F).astype(xfi.dtype)
            y = conv3x3_folded_fastpad(xfi, wf, F, Ci)
        else:
            wf = fold_kernel3x3(w, F)
            xp = reflect_pad_folded(xfi, F, Ci) if pad else xfi
            y = jax.lax.conv_general_dilated(
                xp, wf.astype(xp.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.astype(jnp.promote_types(y.dtype, jnp.float32))
        out = y if out is None else out + y
    if bias is not None:
        Cout = bias.shape[0]
        out = out + jnp.tile(bias, F).astype(out.dtype)
        del Cout
    return out


def upsample2x_folded(xf, F: int, C: int):
    """Nearest 2x upsample of a folded tensor; output stays folded at the
    SAME F (twice the folded columns)."""
    B, H, Wf, FC = xf.shape
    # rows: (B, H, 1, Wf, FC) -> broadcast 2 -> reshape interleaves
    y = jnp.broadcast_to(xf[:, :, None], (B, H, 2, Wf, FC))
    y = y.reshape(B, 2 * H, Wf, FC)
    return _up_w(y, F, C)


def _up_w(xf, F: int, C: int):
    B, H, Wf, FC = xf.shape
    if F == 1:
        # duplicate whole folded columns? F=1 means C>=128: W axis is the
        # folded axis itself; duplicate columns directly
        y = jnp.broadcast_to(xf[:, :, :, None], (B, H, Wf, 2, FC))
        return y.reshape(B, H, 2 * Wf, FC)
    # in-fold: slot p duplicates to out slots 2p, 2p+1
    y = xf.reshape(B, H, Wf, F, 1, C)
    y = jnp.broadcast_to(y, (B, H, Wf, F, 2, C))
    return y.reshape(B, H, 2 * Wf, FC)
