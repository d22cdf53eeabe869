"""2x2 max pooling (torch ceil_mode semantics) and masked median — TPU-safe
building blocks for the refiner's pseudo-3D input construction
(reference refiner.py:316-346).

Both avoid lax.reduce_window (no linearization rule under jit in this JAX
version): pooling is a shifted-slice max, the median is sort-based with a
static shape.
"""

from __future__ import annotations

import jax.numpy as jnp


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
