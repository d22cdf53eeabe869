"""Backprojection / projection between depth maps and camera space.

NHWC layout throughout (TPU-native). Semantics match reference
layers.py:133-226 (BackprojectDepth / Project3D / Cat_xy), expressed as
einsums over (B, H, W, 3) point maps so XLA can fuse them with the
surrounding loss computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Projection math is precision-critical (pixel coordinates feed the bilinear
# sampler); force full-precision contractions regardless of platform default.
_HI = jax.lax.Precision.HIGHEST


def pixel_grid(height: int, width: int, dtype=jnp.float32):
    """Homogeneous pixel coordinates (H, W, 3): (x, y, 1) per pixel."""
    xs = jnp.arange(width, dtype=dtype)
    ys = jnp.arange(height, dtype=dtype)
    x, y = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def backproject_depth(depth, inv_K):
    """Depth map -> camera-space point map.

    depth: (B, H, W) or (B, H, W, 1); inv_K: (B, 4, 4) (only [:3,:3] used).
    Returns (B, H, W, 3) cam points = depth * inv_K[:3,:3] @ (x, y, 1).
    Reference: layers.py:157-162.
    """
    if depth.ndim == 4:
        depth = depth[..., 0]
    B, H, W = depth.shape
    pix = pixel_grid(H, W, dtype=depth.dtype)  # (H, W, 3)
    rays = jnp.einsum("bij,hwj->bhwi", inv_K[:, :3, :3].astype(depth.dtype),
                      pix, precision=_HI)
    return rays * depth[..., None]


def project_3d(points, K, T, eps: float = 1e-7):
    """Project camera points through pose T and intrinsics K to normalized
    sampling coordinates in [-1, 1] (grid_sample convention).

    points: (B, H, W, 3); K, T: (B, 4, 4). Returns (B, H, W, 2) (x, y).
    Reference: layers.py:204-226.
    """
    B, H, W, _ = points.shape
    P = jnp.matmul(K, T, precision=_HI)[:, :3, :]  # (B, 3, 4)
    cam = jnp.einsum("bij,bhwj->bhwi", P[:, :, :3].astype(points.dtype),
                     points, precision=_HI)
    cam = cam + P[:, None, None, :, 3].astype(points.dtype)
    xy = cam[..., :2] / (cam[..., 2:3] + eps)
    scale = jnp.array([W - 1, H - 1], dtype=points.dtype)
    return (xy / scale - 0.5) * 2.0


def cat_xy(depth, inv_K):
    """Normalized XYZ coordinate maps for the pseudo-3D refine input.

    Same backprojection as :func:`backproject_depth`, then the reference's
    hand-tuned normalizers x/30, y/2, (z-40)/40 (layers.py:189-201).
    Returns (B, H, W, 3).
    """
    pts = backproject_depth(depth, inv_K)
    norm = jnp.array([30.0, 2.0, 40.0], dtype=pts.dtype)
    shift = jnp.array([0.0, 0.0, 40.0], dtype=pts.dtype)
    return (pts - shift) / norm
