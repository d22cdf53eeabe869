"""Axis-angle pose parameterization -> SE(3) matrices, fully batched.

Semantics match reference layers.py:23-97 (Rodrigues rotation + translation
compose; `invert=True` gives the inverse transform used for past frames).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# 4x4 pose matrices are tiny but precision-critical: force full fp32
# matmuls (the platform default may use reduced-precision passes).
_HI = jax.lax.Precision.HIGHEST


def rot_from_axisangle(vec):
    """Rodrigues: axis-angle vectors (..., 3) -> rotation matrices (..., 4, 4).

    Reference: layers.py:59-97 (eps 1e-7 on the angle norm).
    """
    vec = jnp.asarray(vec)
    angle = jnp.linalg.norm(vec, axis=-1, keepdims=True)  # (..., 1)
    axis = vec / (angle + 1e-7)

    ca = jnp.cos(angle)[..., 0]
    sa = jnp.sin(angle)[..., 0]
    C = 1.0 - ca

    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC

    zeros = jnp.zeros_like(ca)
    ones = jnp.ones_like(ca)
    rot = jnp.stack(
        [
            x * xC + ca, xyC - zs, zxC + ys, zeros,
            xyC + zs, y * yC + ca, yzC - xs, zeros,
            zxC - ys, yzC + xs, z * zC + ca, zeros,
            zeros, zeros, zeros, ones,
        ],
        axis=-1,
    ).reshape(vec.shape[:-1] + (4, 4))
    return rot


def _translation_matrix(t):
    """Translation vectors (..., 3) -> 4x4 matrices."""
    t = jnp.asarray(t)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=t.dtype), t.shape[:-1] + (4, 4))
    return eye.at[..., :3, 3].set(t)


def transformation_from_parameters(axisangle, translation, invert: bool = False):
    """(axisangle (...,3), translation (...,3)) -> SE(3) matrices (...,4,4).

    invert=False: T @ R;  invert=True: R^T @ T(-t).
    Reference: layers.py:23-40.
    """
    R = rot_from_axisangle(axisangle)
    t = translation
    if invert:
        R = jnp.swapaxes(R, -1, -2)
        t = -t
    T = _translation_matrix(t)
    if invert:
        return jnp.matmul(R, T, precision=_HI)
    return jnp.matmul(T, R, precision=_HI)
