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

    A depthwise convolution: one HLO op with a fast MXU/VPU lowering and a
    conv-transpose gradient. (reduce_window lacks a linearization rule
    under jit in this JAX version; an earlier shifted-slice formulation was
    differentiable but materialized ~10 full-size arrays per call — the
    pad/slice chains did NOT fuse, costing ~45 GB of HBM traffic per
    train step at 640x192 batch 12.)
    """
    x = reflect_pad_hw(x, 1)
    C = x.shape[-1]
    kernel = jnp.full((3, 3, 1, C), 1.0 / 9.0, x.dtype)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C)


def ssim(x, y):
    """Per-pixel, per-channel SSIM *loss* map in [0, 1] (0 = identical).

    x, y: (B, H, W, C). Returns (B, H, W, C).
    The five 3x3 means run as ONE depthwise conv over stacked channels.
    """
    C = x.shape[-1]
    stacked = jnp.concatenate([x, y, x * x, y * y, x * y], axis=-1)
    m = _mean3x3(stacked)
    mu_x = m[..., 0:C]
    mu_y = m[..., C:2 * C]
    sigma_x = m[..., 2 * C:3 * C] - mu_x * mu_x
    sigma_y = m[..., 3 * C:4 * C] - mu_y * mu_y
    sigma_xy = m[..., 4 * C:5 * C] - mu_x * mu_y

    n = (2 * mu_x * mu_y + _C1) * (2 * sigma_xy + _C2)
    d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)

    return jnp.clip((1 - n / d) / 2, 0.0, 1.0)
