"""On-device 2-channel LiDAR expansion (jit-able, batched).

The same order-independent confidence-level decomposition as the host
implementations (data/two_channel.py numpy, native/fusionio.cpp C++), as
pure jnp over (..., H, W) sparse depth — lets the expansion run inside the
input pipeline on the accelerator when frames arrive as raw projected beams
(the BASELINE north star's "vectorized jax ops inside the input pipeline").
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from fusiondepth_tpu.data.two_channel import ring_offsets


@partial(jax.jit, static_argnames=("expand", "row_range", "col_range"))
def expand_two_channel_jax(
    sparse_depth,
    expand: int = 2,
    row_range: Tuple[int, int] = (76, 190),
    col_range: Tuple[int, int] = (2, 638),
):
    """(..., H, W) sparse depth -> (..., H, W, 2) (expanded, confidence)."""
    H, W = sparse_depth.shape[-2], sparse_depth.shape[-1]
    r0, r1 = row_range
    c0, c1 = col_range

    window = jnp.zeros((H, W), sparse_depth.dtype)
    window = window.at[r0:r1, c0:c1].set(1.0)
    src = sparse_depth * window

    levels = [(1.0, [(0, 0)])]
    for dis in range(1, expand + 1):
        levels.append((1.0 / (dis + 1), ring_offsets(dis)))

    pad = expand
    pad_cfg = [(0, 0)] * (src.ndim - 2) + [(pad, pad), (pad, pad)]
    padded = jnp.pad(src, pad_cfg)

    expanded = jnp.zeros_like(src)
    confidence = jnp.zeros_like(src)
    filled = jnp.zeros(src.shape, bool)

    for conf, offsets in levels:
        ssum = jnp.zeros_like(src)
        scnt = jnp.zeros_like(src)
        for dx, dy in offsets:
            shifted = jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(padded, pad - dx, pad - dx + H,
                                     axis=-2),
                pad - dy, pad - dy + W, axis=-1)
            ssum = ssum + shifted
            scnt = scnt + (shifted != 0).astype(src.dtype)
        take = (~filled) & (scnt > 0)
        expanded = jnp.where(take, ssum / jnp.maximum(scnt, 1.0), expanded)
        confidence = jnp.where(take, conf, confidence)
        filled = filled | take

    return jnp.stack([expanded, confidence], axis=-1)
