"""2x2 max pooling (torch ceil_mode semantics) and masked median — TPU-safe
building blocks for the refiner's pseudo-3D input construction
(reference refiner.py:316-346).

Both avoid lax.reduce_window (no linearization rule under jit in this JAX
version): pooling is a shifted-slice max, the median is sort-based with a
static shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def max_pool_3x3s2(x):
    """torch MaxPool2d(3, 2, padding=1) for NHWC, TPU-shaped (the ResNet
    stem pool — reference resnet_encoder.py via torchvision).

    W lives in the sublane axis of the (8, 128) HBM tile, so stride-2 W
    slices (and their interior-pad transposes in the backward) are
    relayout cliffs — the naive 9-tap formulation measured ~9.4 ms of the
    15.7 ms encoder backward at (12, 96, 320, 64). This implementation
    never strides W:

    - forward: 3-tap vertical max of unit H shifts (H is an untiled outer
      dim; edge replication ≡ the -inf padding for max), H-subsample ::2
      (outer-dim slice), then the free (W, C) -> (W/2, 2C) parity reshape
      turns the horizontal stride-2 window into unit ops on contiguous
      lane halves;
    - backward (custom VJP): each input pixel belongs to at most 2x2
      output windows, so grad-in decomposes into 4 parity planes built
      from 9 shifted equality compares at OUTPUT resolution — free views
      + unit shifts only, no interior-pad scatters.

    Max values are bit-identical to torch. Gradient ties split equally
    among all window positions achieving the max (g/count), a conservative
    policy (per-window gradient mass is conserved); torch routes ties to
    the first argmax, JAX's maximum-chain autodiff to a 0.5-split tree —
    all three agree wherever the window max is unique.
    """
    B, H, W, C = x.shape
    if H % 2 or W % 2:  # KITTI sizes are even; generic path for odd
        return _pool_generic(x)
    import os

    from fusiondepth_tpu.ops.pallas_pool import (
        max_pool_3x3s2_pallas,
        pallas_pool_ok,
    )

    if (os.environ.get("FUSIONDEPTH_PALLAS_POOL", "1") == "1"
            and jax.default_backend() != "cpu"
            and pallas_pool_ok(x.shape, x.dtype)):
        return max_pool_3x3s2_pallas(x)
    return _pool_even(x)


def _pool_generic(x):
    neg = jnp.asarray(-jnp.inf, x.dtype)
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    v = jnp.maximum(jnp.maximum(p[:, :-2], p[:, 1:-1]), p[:, 2:])
    m = jnp.maximum(jnp.maximum(v[:, :, :-2], v[:, :, 1:-1]), v[:, :, 2:])
    return m[:, ::2, ::2, :]


def _pool_even_impl(x):
    B, H, W, C = x.shape
    v = jnp.maximum(x[:, 1:2], x[:, 0:1])  # row 0: max(rows 0, 1)
    mid = jnp.maximum(jnp.maximum(x[:, :-2], x[:, 1:-1]), x[:, 2:])
    v = jnp.concatenate([v, mid, jnp.maximum(x[:, -2:-1], x[:, -1:])], 1)
    v = v[:, ::2]  # (B, H/2, W, C) — outer-dim stride, no tile striding
    r = v.reshape(B, H // 2, W // 2, 2 * C)
    f0, f1 = r[..., :C], r[..., C:]
    f1l = jnp.concatenate([f1[:, :, :1], f1[:, :, :-1]], 2)  # f1[w'-1]
    return jnp.maximum(jnp.maximum(f1l, f0), f1)


@jax.custom_vjp
def _pool_even(x):
    return _pool_even_impl(x)


def _pool_even_fwd(x):
    out = _pool_even_impl(x)
    return out, (x, out)


def _sh_up(p, fill):  # p[a-1] along the output-row axis
    return jnp.concatenate([jnp.full_like(p[:, :1], fill), p[:, :-1]], 1)


def _sh_dn(p, fill):  # p[a+1]
    return jnp.concatenate([p[:, 1:], jnp.full_like(p[:, :1], fill)], 1)


def _sh_left(p, fill):  # p[b-1] along the output-col axis
    return jnp.concatenate([jnp.full_like(p[:, :, :1], fill), p[:, :, :-1]],
                           2)


def _sh_right(p, fill):  # p[b+1]
    return jnp.concatenate([p[:, :, 1:], jnp.full_like(p[:, :, :1], fill)],
                           2)


def _pool_even_bwd(res, g):
    x, out = res
    B, H, W, C = x.shape
    Ho, Wo = H // 2, W // 2
    xv = x.reshape(B, Ho, 2, Wo, 2, C)
    x_ee = xv[:, :, 0, :, 0, :]  # rows 2a,   cols 2b
    x_eo = xv[:, :, 0, :, 1, :]  # rows 2a,   cols 2b+1
    x_oe = xv[:, :, 1, :, 0, :]  # rows 2a+1, cols 2b
    x_oo = xv[:, :, 1, :, 1, :]

    inf = jnp.inf  # out-of-range windows: +inf never equals a window max
    o = out
    # ties per window: 9 taps of window (a, b) expressed from the input
    # parity planes (rows 2a-1|2a|2a+1 -> x_o?[a-1]|x_e?[a]|x_o?[a];
    # cols analogous)
    # accumulate in f32, or f64 under the torch-oracle parity suite
    acc = jnp.promote_types(x.dtype, jnp.float32)

    def _eq(t):
        return (t == o).astype(acc)

    cnt = (
        _eq(_sh_up(_sh_left(x_oo, -inf), -inf))   # (2a-1, 2b-1)
        + _eq(_sh_up(x_oe, -inf))                 # (2a-1, 2b)
        + _eq(_sh_up(x_oo, -inf))                 # (2a-1, 2b+1)
        + _eq(_sh_left(x_eo, -inf))               # (2a,   2b-1)
        + _eq(x_ee)                               # (2a,   2b)
        + _eq(x_eo)                               # (2a,   2b+1)
        + _eq(_sh_left(x_oo, -inf))               # (2a+1, 2b-1)
        + _eq(x_oe)                               # (2a+1, 2b)
        + _eq(x_oo)                               # (2a+1, 2b+1)
    )
    gc = g.astype(acc) / cnt
    gc_d, gc_r = _sh_dn(gc, 0.0), _sh_right(gc, 0.0)
    gc_dr = _sh_dn(gc_r, 0.0)
    o_d, o_r = _sh_dn(o, inf), _sh_right(o, inf)
    o_dr = _sh_dn(o_r, inf)

    gin_ee = jnp.where(x_ee == o, gc, 0.0)
    gin_eo = (jnp.where(x_eo == o, gc, 0.0)
              + jnp.where(x_eo == o_r, gc_r, 0.0))
    gin_oe = (jnp.where(x_oe == o, gc, 0.0)
              + jnp.where(x_oe == o_d, gc_d, 0.0))
    gin_oo = (jnp.where(x_oo == o, gc, 0.0)
              + jnp.where(x_oo == o_r, gc_r, 0.0)
              + jnp.where(x_oo == o_d, gc_d, 0.0)
              + jnp.where(x_oo == o_dr, gc_dr, 0.0))

    row_e = jnp.stack([gin_ee, gin_eo], axis=3).reshape(B, Ho, W, C)
    row_o = jnp.stack([gin_oe, gin_oo], axis=3).reshape(B, Ho, W, C)
    gin = jnp.stack([row_e, row_o], axis=2).reshape(B, H, W, C)
    return (gin.astype(x.dtype),)


_pool_even.defvjp(_pool_even_fwd, _pool_even_bwd)


def max_pool2x2_ceil(x):
    """(B, H, W, C) -> (B, ceil(H/2), ceil(W/2), C), max over 2x2 windows."""
    B, H, W, C = x.shape
    Hp, Wp = -(-H // 2) * 2, -(-W // 2) * 2
    if (Hp, Wp) != (H, W):
        pad_val = jnp.array(-jnp.inf, x.dtype)
        x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)),
                    constant_values=pad_val)
    x = x.reshape(B, Hp // 2, 2, Wp // 2, 2, C)
    return x.max(axis=(2, 4))


def masked_median(x, mask):
    """Median of x where mask, over ALL elements (batch included) — matches
    torch.median(x[mask]) semantics (lower middle element for even counts).

    Static-shaped: invalid entries sort to +inf and the index is computed
    from the valid count. Returns +inf when nothing is valid.
    """
    flat = jnp.where(mask, x, jnp.inf).ravel()
    n = mask.sum()
    sorted_vals = jnp.sort(flat)
    idx = jnp.maximum((n - 1) // 2, 0)
    return sorted_vals[idx]
