"""On-device beam sparsifier (jit-able, fixed-capacity).

Same semantics as the host sparsifier (data/sparsify.py): range filter,
polar-angle binning with last-write-wins bin occupancy, beam-row selection.
numpy's fancy-assignment "last write wins" becomes a deterministic
segment-max over original point indices; outputs use a fixed capacity +
validity mask (device-friendly static shapes).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("H", "W"))
def polar_angle_map_jax(points, valid, H: int = 64, W: int = 1024):
    """(N, 4) points + validity -> (H, W, 4) bin map (-1 = empty).

    The winning point per bin is the highest original index among valid
    points, matching numpy's sequential scatter order.
    """
    N = points.shape[0]
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    dtheta = jnp.radians(0.4 * 64.0 / H)
    dphi = jnp.radians(90.0 / W)

    d = jnp.sqrt(x * x + y * y + z * z)
    r = jnp.sqrt(x * x + y * y)
    d = jnp.where(d == 0, 1e-6, d)
    r = jnp.where(r == 0, 1e-6, r)

    phi = jnp.radians(45.0) - jnp.arcsin(y / r)
    phi_idx = jnp.clip((phi / dphi).astype(jnp.int32), 0, W - 1)
    theta = jnp.radians(2.0) - jnp.arcsin(z / d)
    theta_idx = jnp.clip((theta / dtheta).astype(jnp.int32), 0, H - 1)

    bins = theta_idx * W + phi_idx
    bins = jnp.where(valid, bins, H * W)  # park invalid points off-grid

    winner = jax.ops.segment_max(
        jnp.arange(N), bins, num_segments=H * W + 1,
        indices_are_sorted=False)[: H * W]
    # empty segments come back as the int minimum -> negative
    has = (winner >= 0) & (winner < N)
    amap = jnp.where(has[:, None],
                     points[jnp.clip(winner, 0, N - 1)],
                     -jnp.ones((1, 4), points.dtype))
    return amap.reshape(H, W, 4)


def range_filter_mask(points):
    return (
        (points[:, 0] < 120) & (points[:, 0] >= 0)
        & (points[:, 1] < 50) & (points[:, 1] >= -50)
        & (points[:, 2] < 1.5) & (points[:, 2] >= -2.5)
    )


@partial(jax.jit, static_argnames=("H", "W", "line_spec", "capacity"))
def sparsify_beams_jax(points, H: int = 64, W: int = 1024,
                       line_spec: Tuple[int, ...] = (2, 7, 12, 16),
                       capacity: int = 8192):
    """(N, 4) scan -> (capacity, 4) K-beam points + validity mask."""
    valid = range_filter_mask(points)
    amap = polar_angle_map_jax(points, valid, H, W)
    lines = amap[jnp.array(line_spec), :, :].reshape(-1, 4)
    hit = lines[:, 0] != -1.0
    idx = jnp.nonzero(hit, size=capacity, fill_value=lines.shape[0] - 1)[0]
    out_valid = jnp.arange(capacity) < hit.sum()
    out = jnp.where(out_valid[:, None], lines[idx], 0.0)
    return out, out_valid
