"""SSIM dissimilarity used in the photometric loss.

Semantics match reference layers.py:251-281: reflect-pad by 1, 3x3 average
pools, C1=0.01^2, C2=0.03^2, output clamp((1 - SSIM)/2, 0, 1). NHWC layout;
the 3x3 mean is a `lax.reduce_window` sum that XLA fuses on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fusiondepth_tpu.ops.padding import reflect_pad_hw

_C1 = 0.01**2
_C2 = 0.03**2


def _mean3x3(x):
    """3x3 box filter over reflect-padded H, W of an NHWC tensor.

    Nine shifted adds instead of lax.reduce_window: reduce_window lacks a
    linearization rule under jit in this JAX version, and XLA fuses the
    shifted adds into one elementwise kernel anyway.
    """
    x = reflect_pad_hw(x, 1)
    H, W = x.shape[1] - 2, x.shape[2] - 2
    s = None
    for di in range(3):
        for dj in range(3):
            t = x[:, di:di + H, dj:dj + W, :]
            s = t if s is None else s + t
    return s / 9.0


def ssim(x, y):
    """Per-pixel, per-channel SSIM *loss* map in [0, 1] (0 = identical).

    x, y: (B, H, W, C). Returns (B, H, W, C).
    """
    mu_x = _mean3x3(x)
    mu_y = _mean3x3(y)

    sigma_x = _mean3x3(x * x) - mu_x * mu_x
    sigma_y = _mean3x3(y * y) - mu_y * mu_y
    sigma_xy = _mean3x3(x * y) - mu_x * mu_y

    n = (2 * mu_x * mu_y + _C1) * (2 * sigma_xy + _C2)
    d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)

    return jnp.clip((1 - n / d) / 2, 0.0, 1.0)
