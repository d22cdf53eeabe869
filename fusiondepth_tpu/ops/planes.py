"""Photometric-loss building blocks in "planes" layout: (..., H, W).

Why this layout: on TPU the minor-most axis maps to the 128 vector lanes.
The NHWC formulation of the loss puts C=1..3 channels in the lane axis, so
every elementwise op over full-resolution maps wastes >40x of the VPU and
every intermediate wastes the same factor of HBM bandwidth once padded.
With W minor (640 = 5 x 128 lanes) and H in sublanes the whole loss path is
lane-dense, and the candidate/scale/frame axes become LEADING axes, so
batch-axis sharding (axis inside, untouched) propagates cleanly under GSPMD
— one code path for 1 chip and for an N-chip data mesh (no cross-batch
concats anywhere).

SSIM's 3x3 box filters run as two separable banded matmuls against constant
(H, H) / (W, W) reflect-boundary matrices: exactly two MXU contractions per
field (the MXU is idle during the loss), with fp32 accumulation. Numerics
match ops/ssim.py (reflect-pad + 3x3 mean, reference layers.py:251-281) to
float rounding.

Reference semantics covered here: layers.py:251-281 (SSIM), layers.py:
235-248 (smoothness), trainer.py:476-488 (0.85 SSIM + 0.15 L1).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

_C1 = 0.01**2
_C2 = 0.03**2


def to_planes(nhwc):
    """(B, H, W, C) -> (B, C, H, W)."""
    return jnp.moveaxis(nhwc, -1, -3)


def from_planes(planes):
    """(..., C, H, W) -> (..., H, W, C)."""
    return jnp.moveaxis(planes, -3, -1)


@lru_cache(maxsize=32)
def _box3_matrix(n: int) -> np.ndarray:
    """(n, n) matrix applying a 3-tap mean with reflect boundary, i.e.
    reflect-pad by 1 then 3x1 average (torch ReflectionPad2d semantics:
    index -1 -> 1, index n -> n-2)."""
    M = np.zeros((n, n), np.float32)
    for i in range(n):
        for d in (-1, 0, 1):
            j = i + d
            if j < 0:
                j = -j
            elif j >= n:
                j = 2 * (n - 1) - j
            M[i, j] += 1.0 / 3.0
    return M


def _precision_for(dtype):
    # bf16 training rounds through the MXU everywhere else too; fp32 math
    # keeps full precision (this box's default matmul precision is reduced
    # even on CPU)
    if dtype == jnp.bfloat16:
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision.HIGHEST


def box3(x):
    """3x3 reflect-boundary box mean over the trailing (H, W) axes.

    x: (..., H, W). Two separable banded matmuls (MXU) with fp32 accumulate.
    """
    H, W = x.shape[-2], x.shape[-1]
    prec = _precision_for(x.dtype)
    V = jnp.asarray(_box3_matrix(H), x.dtype)
    Hm = jnp.asarray(_box3_matrix(W), x.dtype)
    y = jnp.einsum("ih,...hw->...iw", V, x, precision=prec,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("jw,...hw->...hj", Hm, y.astype(x.dtype), precision=prec,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def ssim_planes(pred, target):
    """Per-pixel, per-channel SSIM loss map, planes layout.

    pred: (..., C, H, W); target: broadcastable to pred with FEWER leading
    axes (e.g. (B, C, H, W) against (n, k, B, C, H, W)) — target statistics
    are computed once and broadcast, pred-side statistics per candidate.
    Returns clip((1 - SSIM)/2, 0, 1) with pred's full shape.
    """
    p32 = pred
    t32 = target
    # pred-side stats: mu_x, E[x^2], E[xy]  (xy needs the broadcast product)
    pt = p32 * t32  # broadcasts to pred shape
    sp = box3(jnp.stack([p32, p32 * p32, pt]))
    mu_x, ex2, exy = sp[0], sp[1], sp[2]
    # target-side stats once
    st = box3(jnp.stack([t32, t32 * t32]))
    mu_y, ey2 = st[0], st[1]

    sigma_x = ex2 - mu_x * mu_x
    sigma_y = ey2 - mu_y * mu_y
    sigma_xy = exy - mu_x * mu_y

    n = (2 * mu_x * mu_y + _C1) * (2 * sigma_xy + _C2)
    d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
    return jnp.clip((1 - n / d) / 2, 0.0, 1.0)


def reprojection_loss_planes(pred, target, use_ssim: bool = True):
    """0.85 * SSIM + 0.15 * L1, channel-meaned, planes layout.

    pred: (..., C, H, W); target broadcastable. Returns (..., H, W).
    Reference: trainer.py:476-488.
    """
    l1 = jnp.abs(target - pred).mean(axis=-3)
    if not use_ssim:
        return l1
    ssim_err = ssim_planes(pred, target).mean(axis=-3)
    return 0.85 * ssim_err + 0.15 * l1


def resize_planes(x, height: int, width: int):
    """Bilinear resize (torch align_corners=False, no antialias) of the
    trailing (H, W) axes — separable MXU contractions like ops/resize.py."""
    from fusiondepth_tpu.ops.resize import _interp_matrix

    H, W = x.shape[-2], x.shape[-1]
    if (H, W) == (height, width):
        return x
    prec = _precision_for(x.dtype)
    My = jnp.asarray(_interp_matrix(H, height), x.dtype)  # (h, H)
    Mx = jnp.asarray(_interp_matrix(W, width), x.dtype)  # (w, W)
    y = jnp.einsum("ih,...hw->...iw", My, x, precision=prec)
    return jnp.einsum("jw,...hw->...hj", Mx, y, precision=prec)


def smoothness_planes(disp, img):
    """Edge-aware first-order smoothness, planes layout.

    disp: (..., H, W); img: (..., C, H, W). Scalar. Same math as
    ops/losses.smoothness_loss (reference layers.py:235-248).
    """
    gdx = jnp.abs(disp[..., :, :-1] - disp[..., :, 1:])
    gdy = jnp.abs(disp[..., :-1, :] - disp[..., 1:, :])
    gix = jnp.abs(img[..., :, :-1] - img[..., :, 1:]).mean(-3)
    giy = jnp.abs(img[..., :-1, :] - img[..., 1:, :]).mean(-3)
    # f32 accumulation: safe under a bf16 image path (f64 stays f64)
    acc = jnp.promote_types(gdx.dtype, jnp.float32)
    return ((gdx * jnp.exp(-gix)).mean(dtype=acc)
            + (gdy * jnp.exp(-giy)).mean(dtype=acc))


def normalized_smoothness_planes(disp, color):
    """Mean-normalized disparity smoothness (reference trainer.py:566-571)."""
    mean_disp = disp.mean(axis=(-2, -1), keepdims=True,
                          dtype=jnp.promote_types(disp.dtype, jnp.float32)
                          ).astype(disp.dtype)
    return smoothness_planes(disp / (mean_disp + 1e-7), color)
