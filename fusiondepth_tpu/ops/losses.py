"""Loss building blocks for the self-supervised photometric objective.

Semantics match the reference loss path (trainer.py:476-596, layers.py:235-248)
with TPU-friendly static-shape masking (weighted means instead of boolean
indexing).
"""

from __future__ import annotations

import jax.numpy as jnp

from fusiondepth_tpu.ops.ssim import ssim


def masked_mean(x, mask, eps: float = 1.0):
    """Mean of `x` over entries where `mask` is nonzero (static shapes)."""
    w = mask.astype(jnp.float32)
    return (x.astype(jnp.float32) * w).sum() / jnp.maximum(w.sum(), eps)


def reprojection_loss(pred, target, use_ssim: bool = True):
    """Per-pixel photometric error between warped and target images.

    pred/target: (B, H, W, C). Returns (B, H, W, 1).
    0.85 * SSIM + 0.15 * L1 (reference trainer.py:476-488).
    """
    l1 = jnp.abs(target - pred).mean(axis=-1, keepdims=True)
    if not use_ssim:
        return l1
    ssim_err = ssim(pred, target).mean(axis=-1, keepdims=True)
    return 0.85 * ssim_err + 0.15 * l1


def smoothness_loss(disp, img):
    """Edge-aware first-order smoothness of `disp` guided by `img`.

    disp: (B, H, W, 1), img: (B, H, W, C). Scalar.
    Reference: layers.py:235-248 (caller normalizes disp by its mean,
    trainer.py:566-571 — see `normalized_smoothness`).
    """
    gdx = jnp.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    gdy = jnp.abs(disp[:, :-1, :, :] - disp[:, 1:, :, :])

    gix = jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]).mean(-1, keepdims=True)
    giy = jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]).mean(-1, keepdims=True)

    return (gdx * jnp.exp(-gix)).mean() + (gdy * jnp.exp(-giy)).mean()


def normalized_smoothness(disp, color):
    """Mean-normalized disparity smoothness as used in the trainer."""
    mean_disp = disp.mean(axis=(1, 2), keepdims=True)
    return smoothness_loss(disp / (mean_disp + 1e-7), color)


def si_loss(depth, ref_depth, threshold: float = 5.0, si_var: float = 0.3,
            min_d: float = 1.0, max_d: float = 80.0, scale: float = 0.1):
    """Scale-invariant log loss of `depth` against sparse `ref_depth`.

    Valid pixels: ref > 1m, depth in (1, 80) m, |depth - ref| < threshold.
    loss = sqrt(mean(d^2) - si_var * mean(d)^2) * scale over valid pixels,
    d = log(depth) - log(ref). Reference: trainer.py:577-589.

    Callers apply the reference's hard-coded metric factor (depth * 26.0)
    before calling. Returns a scalar; 0 when no pixel is valid.
    """
    acc = jnp.promote_types(jnp.result_type(depth, ref_depth), jnp.float32)
    depth = depth.astype(acc)
    ref_depth = ref_depth.astype(acc)
    valid = (
        (ref_depth > min_d)
        & (depth < max_d)
        & (depth > min_d)
        & (jnp.abs(depth - ref_depth) < threshold)
    )
    w = valid.astype(acc)
    n = w.sum()
    safe_depth = jnp.where(valid, depth, 1.0)
    safe_ref = jnp.where(valid, ref_depth, 1.0)
    d = jnp.log(safe_depth) - jnp.log(safe_ref)
    denom = jnp.maximum(n, 1.0)
    mean_d2 = (d * d * w).sum() / denom
    mean_d = (d * w).sum() / denom
    var = jnp.maximum(mean_d2 - si_var * mean_d * mean_d, 0.0)
    return jnp.where(n > 0, jnp.sqrt(var) * scale, 0.0)
