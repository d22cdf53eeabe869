"""torch MaxPool2d(3, 2, padding=1) as a Pallas TPU kernel (fwd + VJP).

Why a kernel for a maxpool: in XLA's HBM-tiled NHWC layout every stride-2
or even/odd-parity access along W is an intra-tile relayout. The stem
pool's backward measured 5.5-9.4 ms of the ~15 ms ResNet-18 encoder
backward at (12, 96, 320, 64) across three successively better XLA
formulations (scripts/exp_convnet.py pfx bisection) — the relayouts
dominate no matter how the slicing is phrased, because data must be
repacked across HBM tiles. Inside VMEM the same parity views are register
ops, and HBM traffic drops to the semantic minimum (read x, write out;
read x/out/g, write grad-in).

Mosaic constraints shaped the design (all probed on v5e,
scripts/exp_pool_prims.py):
- no strided slices / lane regroups in-kernel -> the (W, C) -> (W/2, 2C)
  regroup happens OUTSIDE in XLA (a free view in (W, C)-contiguous
  order), so even/odd columns are contiguous LANE HALVES in-kernel
  (lane slicing at 64 measured 0.2 ms/pass);
- ~16 MB VMEM with double buffering -> grid over (B, H-blocks) with BH
  output rows per program; the one-row halos each block needs are
  prepared in XLA as tiny side arrays (outer-dim row slices, cheap) so
  the kernel has no cross-block reads and no program-id conditionals.

Semantics match ops/pooling.max_pool_3x3s2 exactly: forward bit-identical
to torch MaxPool2d(3, 2, 1); backward splits gradient equally among all
window positions achieving the max (per-window mass conserved; ties in
bf16 activations are common, so mass conservation matters — torch routes
ties to the first argmax instead, identical wherever the max is unique).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = float("-inf")
_POS = float("inf")


def _bh_for(ho: int, wo: int = 160, c: int = 64,
            dtype_bytes: int = 2) -> int:
    """Output rows per program: largest divisor of Ho <= 12 that fits the
    16 MB scoped-VMEM limit. The bwd kernel holds ~10 (BH, Wo, C) planes
    plus the double-buffered (2BH, Wo, 2C) input and grad blocks. Two
    compile-time OOM datapoints pin the coefficient: the paired-encoder
    stem (C=128, BH=12) peaked at 17.49 MB = 35.6x BH*Wo*C*db, and the
    COMPLETION stem (352x1216: Wo=304, C=64, BH=11) at 18.01 MB = 42.1x —
    so the model uses 44x with a 15 MB budget (flagship 48x160 keeps
    BH=12, completion drops to BH=8, both compile)."""
    budget = int(15.0e6)
    for d in range(min(ho, 12), 0, -1):
        if ho % d == 0 and 44 * d * wo * c * dtype_bytes <= budget:
            return d
    return 1


def pallas_pool_ok(shape, dtype) -> bool:
    B, H, W, C = shape
    if H % 2 or W % 2 or H < 4 or W < 4:
        return False
    if C % 2:
        return False
    # lane-dense regroup wants 2C a multiple of 128 for full effect, but
    # correctness only needs the reshape to be expressible
    db = jnp.dtype(dtype).itemsize
    return _bh_for(H // 2, W // 2, C, db) >= 4


def _fwd_kernel(xm_ref, ht_ref, o_ref, *, K):
    xm = xm_ref[0, 0]                       # (2BH, Wo, 2K)
    ht = ht_ref[0, 0]                       # (1, Wo, 2K) row 2tBH-1
    BH2 = xm.shape[0]
    BH = BH2 // 2
    r = xm.reshape(BH, 2, xm.shape[1], xm.shape[2])
    e = r[:, 0]                             # rows 2j
    o = r[:, 1]                             # rows 2j+1
    oprev = jnp.concatenate([ht, o[:-1]], 0)  # rows 2j-1
    v = jnp.maximum(jnp.maximum(oprev, e), o)  # (BH, Wo, 2K)
    # shift the FULL-width v, lane-slice after: Mosaic cannot concatenate
    # vectors whose non-concat (lane) offsets differ, so a shifted lane
    # slice must be sliced from a shifted full vector
    vl = jnp.concatenate([v[:, :1], v[:, :-1]], 1)
    f0, f1 = v[..., :K], v[..., K:]
    f1l = vl[..., K:]  # f1[w'-1] (edge-replicated)
    o_ref[0, 0] = jnp.maximum(jnp.maximum(f1l, f0), f1)


def _bwd_kernel(xm_ref, ht_ref, hb_ref, o_ref, on_ref, g_ref, gn_ref,
                gin_ref, *, K):
    f32 = jnp.float32
    xm = xm_ref[0, 0]                       # (2BH, Wo, 2K)
    ht = ht_ref[0, 0]                       # (1, Wo, 2K)  row 2tBH-1
    hb = hb_ref[0, 0]                       # (2, Wo, 2K)  rows 2(t+1)BH, +1
    o = o_ref[0, 0]                         # (BH, Wo, K)
    on = on_ref[0, 0]                       # (1, Wo, K)   out row (t+1)BH
    g = g_ref[0, 0].astype(f32)
    gn = gn_ref[0, 0].astype(f32)           # (1, Wo, K)
    BH = o.shape[0]

    r = xm.reshape(BH, 2, xm.shape[1], xm.shape[2])
    x_e, x_o = r[:, 0], r[:, 1]
    x_ee, x_eo = x_e[..., :K], x_e[..., K:]
    x_oe, x_oo = x_o[..., :K], x_o[..., K:]
    p = jnp.concatenate([ht, x_o[:-1]], 0)  # rows 2j-1

    def lf(t, fill):                        # t[b-1] along Wo
        return jnp.concatenate([jnp.full_like(t[:, :1], fill), t[:, :-1]], 1)

    def rt(t, fill):                        # t[b+1]
        return jnp.concatenate([t[:, 1:], jnp.full_like(t[:, :1], fill)], 1)

    def eq9(tgt, up, mid, dn):
        # rows packed (Wo, 2K); shift BEFORE lane-slicing (Mosaic cannot
        # concat vectors with mismatched lane offsets); compares in f32
        # (v5e has no bf16 vector equality — exact for bf16 values)
        tgt32 = tgt.astype(f32)

        def eq(t):
            return (t.astype(f32) == tgt32).astype(f32)

        total = None
        for row in (up, mid, dn):
            row_l = lf(row, _NEG)
            s = (eq(row_l[..., K:]) + eq(row[..., :K]) + eq(row[..., K:]))
            total = s if total is None else total + s
        return total

    cnt = eq9(o, p, x_e, x_o)
    # next block's first window: up row = our last odd row, mid/down = halo
    cnt_n = eq9(on, x_o[-1:], hb[:1], hb[1:])
    gc = g / jnp.maximum(cnt, 1.0)
    gcn = gn / jnp.maximum(cnt_n, 1.0)

    o_r, gc_r = rt(o, _POS), rt(gc, 0.0)
    o_d = jnp.concatenate([o[1:], on], 0)
    gc_d = jnp.concatenate([gc[1:], gcn], 0)
    o_dr, gc_dr = rt(o_d, _POS), rt(gc_d, 0.0)

    def w(x_p, tgt, grad):
        return jnp.where(x_p.astype(f32) == tgt.astype(f32), grad, 0.0)

    gin_ee = w(x_ee, o, gc)
    gin_eo = w(x_eo, o, gc) + w(x_eo, o_r, gc_r)
    gin_oe = w(x_oe, o, gc) + w(x_oe, o_d, gc_d)
    gin_oo = (w(x_oo, o, gc) + w(x_oo, o_r, gc_r)
              + w(x_oo, o_d, gc_d) + w(x_oo, o_dr, gc_dr))

    row_e = jnp.concatenate([gin_ee, gin_eo], -1)   # (BH, Wo, 2K)
    row_o = jnp.concatenate([gin_oe, gin_oo], -1)
    gin = jnp.stack([row_e, row_o], 1).reshape(xm.shape)
    gin_ref[0, 0] = gin.astype(gin_ref.dtype)


def _prep(x):
    """(B, H, W, C) -> regrouped blocks + halos, all XLA-cheap (free views
    and outer-dim row slices)."""
    B, H, W, C = x.shape
    Ho, Wo = H // 2, W // 2
    BH = _bh_for(Ho, Wo, C, jnp.dtype(x.dtype).itemsize)
    T = Ho // BH
    xr = x.reshape(B, T, 2 * BH, Wo, 2 * C)
    neg = jnp.full((B, 1, 1, Wo, 2 * C), _NEG, x.dtype)
    ht = jnp.concatenate([neg, xr[:, :-1, -1:]], 1)      # row 2tBH-1
    neg2 = jnp.full((B, 1, 2, Wo, 2 * C), _NEG, x.dtype)
    hb = jnp.concatenate([xr[:, 1:, :2], neg2], 1)       # rows 2(t+1)BH, +1
    return xr, ht, hb, (B, T, BH, Ho, Wo, C)


def _specs(B, T, rows, wo, ch):
    return pl.BlockSpec((1, 1, rows, wo, ch), lambda b, t: (b, t, 0, 0, 0),
                        memory_space=pltpu.VMEM)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_3x3s2_pallas(x, interpret: bool = False):
    out, _ = _pool_fwd(x, interpret)
    return out


def _pool_fwd(x, interpret):
    xr, ht, hb, (B, T, BH, Ho, Wo, C) = _prep(x)
    out = pl.pallas_call(
        partial(_fwd_kernel, K=C),
        grid=(B, T),
        in_specs=[_specs(B, T, 2 * BH, Wo, 2 * C),
                  _specs(B, T, 1, Wo, 2 * C)],
        out_specs=_specs(B, T, BH, Wo, C),
        out_shape=jax.ShapeDtypeStruct((B, T, BH, Wo, C), x.dtype),
        interpret=interpret,
    )(xr, ht)
    out = out.reshape(B, Ho, Wo, C)
    return out, (x, out)


def _pool_bwd(interpret, res, g):
    x, out = res
    xr, ht, hb, (B, T, BH, Ho, Wo, C) = _prep(x)
    orr = out.reshape(B, T, BH, Wo, C)
    gr = g.reshape(B, T, BH, Wo, C)
    pos = jnp.full((B, 1, 1, Wo, C), _POS, out.dtype)
    on = jnp.concatenate([orr[:, 1:, :1], pos], 1)       # out row (t+1)BH
    zero = jnp.zeros((B, 1, 1, Wo, C), g.dtype)
    gn = jnp.concatenate([gr[:, 1:, :1], zero], 1)
    gin = pl.pallas_call(
        partial(_bwd_kernel, K=C),
        grid=(B, T),
        in_specs=[_specs(B, T, 2 * BH, Wo, 2 * C),
                  _specs(B, T, 1, Wo, 2 * C),
                  _specs(B, T, 2, Wo, 2 * C),
                  _specs(B, T, BH, Wo, C),
                  _specs(B, T, 1, Wo, C),
                  _specs(B, T, BH, Wo, C),
                  _specs(B, T, 1, Wo, C)],
        out_specs=_specs(B, T, 2 * BH, Wo, 2 * C),
        out_shape=jax.ShapeDtypeStruct((B, T, 2 * BH, Wo, 2 * C), x.dtype),
        interpret=interpret,
    )(xr, ht, hb, orr, on, gr, gn)
    return (gin.reshape(x.shape),)


max_pool_3x3s2_pallas.defvjp(_pool_fwd, _pool_bwd)


def analytic_costs(B, H, W, C, bwd=False, dtype_bytes=2):
    """Analytic (flops, hbm_bytes) per execution of the stem-maxpool
    kernel (input (B, H, W, C), stride-2 3x3), for roofline accounting.

    Forward: 9 compares per output pixel (VPU), reads the input once,
    writes the quarter-size output. Backward: 9 shifted equality compares
    over 4 parity planes at output resolution; reads input + output +
    cotangent, writes the input-resolution gradient.
    """
    out_px = B * (H // 2) * (W // 2) * C
    in_b = B * H * W * C * dtype_bytes
    out_b = out_px * dtype_bytes
    if bwd:
        return 9 * 4 * out_px, in_b + 2 * out_b + out_b + in_b
    return 9 * out_px, in_b + out_b
