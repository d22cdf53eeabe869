"""Bilinear grid sampling (torch `F.grid_sample` semantics: border padding,
align_corners=False) as gather-based jnp — the core of the photometric
reprojection loss (reference trainer.py:467-470).

NHWC layout. The four corner gathers are expressed as `take_along_axis`
over the flattened spatial axis, which XLA lowers to efficient dynamic
gathers and fuses with the surrounding elementwise work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample(img, grid):
    """Sample `img` at normalized coordinates `grid`.

    img:  (B, H, W, C)
    grid: (B, Ho, Wo, 2) with (x, y) in [-1, 1]; align_corners=False,
          padding_mode='border'.
    Returns (B, Ho, Wo, C).
    """
    B, H, W, C = img.shape
    _, Ho, Wo, _ = grid.shape
    dtype = img.dtype
    # accumulate in f32, or f64 when the inputs are f64 (torch-oracle parity)
    acc = jnp.promote_types(jnp.result_type(img, grid), jnp.float32)

    gx = grid[..., 0].astype(acc)
    gy = grid[..., 1].astype(acc)

    # unnormalize (align_corners=False): p = ((g + 1) * size - 1) / 2
    ix = ((gx + 1.0) * W - 1.0) * 0.5
    iy = ((gy + 1.0) * H - 1.0) * 0.5

    # border padding: clamp the *coordinate* into the valid range first
    ix = jnp.clip(ix, 0.0, W - 1)
    iy = jnp.clip(iy, 0.0, H - 1)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = ix - x0
    wy = iy - y0

    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)

    # batch-dim gather: shards cleanly over the leading (data) axis under
    # GSPMD — one code path for 1 and N devices. (The photometric hot loop
    # no longer goes through here; it uses ops/warp.warp_planes.)
    flat_b = img.reshape(B, H * W, C)

    def gather(yi, xi):
        idx = (yi * W + xi).reshape(B, Ho * Wo, 1)
        return jnp.take_along_axis(flat_b, idx,
                                   axis=1).reshape(B, Ho, Wo, C)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)

    wx = wx[..., None].astype(acc)
    wy = wy[..., None].astype(acc)

    out = (
        v00.astype(acc) * (1 - wx) * (1 - wy)
        + v01.astype(acc) * wx * (1 - wy)
        + v10.astype(acc) * (1 - wx) * wy
        + v11.astype(acc) * wx * wy
    )
    return out.astype(dtype)
