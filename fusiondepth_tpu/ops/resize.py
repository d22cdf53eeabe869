"""Image resizing with torch `F.interpolate` semantics, NHWC layout.

- `resize_bilinear` == F.interpolate(mode='bilinear', align_corners=False,
  antialias=False): half-pixel source coordinates, no antialias filter.
- `upsample2x_nearest` == F.interpolate(scale_factor=2, mode='nearest')
  (reference layers.py:229-232), i.e. pixel repetition.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def upsample2x_nearest(x):
    """(B, H, W, C) -> (B, 2H, 2W, C) by pixel repetition."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


@lru_cache(maxsize=64)
def _interp_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) bilinear interpolation weights, torch align_corners=False
    semantics: source coord = (i + 0.5) * src/dst - 0.5, clamped."""
    x = (np.arange(dst, dtype=np.float64) + 0.5) * (src / dst) - 0.5
    x = np.clip(x, 0.0, src - 1.0)
    x0 = np.clip(np.floor(x), 0, max(src - 2, 0)).astype(np.int64)
    w = x - x0
    M = np.zeros((dst, src), np.float32)
    M[np.arange(dst), x0] = 1.0 - w
    M[np.arange(dst), np.minimum(x0 + 1, src - 1)] += w
    return M


def resize_bilinear(img, height: int, width: int):
    """Bilinear resize of (B, H, W, C) to (B, height, width, C).

    Matches torch bilinear align_corners=False without antialiasing.
    Static sampling coordinates -> two separable contractions against
    constant interpolation matrices (MXU matmuls). An earlier formulation
    reused the gather-based grid_sample; TPU gathers are row-granular and
    cost ~10 ms per full-res call, while these matmuls are ~free.
    """
    B, H, W, C = img.shape
    if (H, W) == (height, width):
        return img
    My = jnp.asarray(_interp_matrix(H, height), img.dtype)  # (h, H)
    Mx = jnp.asarray(_interp_matrix(W, width), img.dtype)  # (w, W)
    out = jnp.einsum("hH,bHWc->bhWc", My, img, precision=_HI)
    return jnp.einsum("wW,bhWc->bhwc", Mx, out, precision=_HI)
