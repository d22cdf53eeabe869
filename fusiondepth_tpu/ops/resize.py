"""Image resizing with torch `F.interpolate` semantics, NHWC layout.

- `resize_bilinear` == F.interpolate(mode='bilinear', align_corners=False,
  antialias=False): half-pixel source coordinates, no antialias filter.
- `upsample2x_nearest` == F.interpolate(scale_factor=2, mode='nearest')
  (reference layers.py:229-232), i.e. pixel repetition.
"""

from __future__ import annotations

import jax.numpy as jnp

from fusiondepth_tpu.ops.sampling import grid_sample


def upsample2x_nearest(x):
    """(B, H, W, C) -> (B, 2H, 2W, C) by pixel repetition."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def resize_bilinear(img, height: int, width: int):
    """Bilinear resize of (B, H, W, C) to (B, height, width, C).

    Matches torch bilinear align_corners=False without antialiasing: the
    output pixel (i, j) samples the source at half-pixel-aligned coordinates
    clamped at the border — exactly our border-mode grid_sample, so we reuse
    it (and XLA fuses the shared gather machinery).
    """
    B, H, W, C = img.shape
    if (H, W) == (height, width):
        return img
    # torch: src = (dst + 0.5) * scale - 0.5, clamped to the valid range
    # grid_sample unnormalizes g -> ((g+1)*size-1)/2, so g = (2*src+1)/size - 1
    xs = ((jnp.arange(width, dtype=jnp.float32) + 0.5) * (W / width) - 0.5)
    ys = ((jnp.arange(height, dtype=jnp.float32) + 0.5) * (H / height) - 0.5)
    gx = (2.0 * xs + 1.0) / W - 1.0
    gy = (2.0 * ys + 1.0) / H - 1.0
    gxx, gyy = jnp.meshgrid(gx, gy, indexing="xy")
    grid = jnp.broadcast_to(
        jnp.stack([gxx, gyy], axis=-1)[None], (B, height, width, 2)
    )
    return grid_sample(img, grid)
