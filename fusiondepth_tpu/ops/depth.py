"""Disparity <-> depth conversion and depth-error metrics.

Semantics match the reference formulas (reference layers.py:11-20 and
layers.py:284-302) but are pure jnp functions over NHWC/flat arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


def disp_to_depth(disp, min_depth: float, max_depth: float):
    """Convert a sigmoid disparity in [0, 1] to (scaled_disp, depth).

    depth ranges over [min_depth, max_depth] (defaults 0.1 / 100 m).
    Reference: layers.py:11-20.
    """
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    depth = 1.0 / scaled_disp
    return scaled_disp, depth


def depth_to_disp(depth, min_depth: float, max_depth: float):
    """Inverse of :func:`disp_to_depth`: metric depth -> sigmoid disparity."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = 1.0 / depth
    return (scaled_disp - min_disp) / (max_disp - min_disp)


def depth_errors(gt, pred, mask=None):
    """The 7 standard depth metrics (abs_rel, sq_rel, rmse, rmse_log, a1-a3).

    `gt`/`pred` are arrays of positive depths; `mask` optionally selects valid
    entries (static shape — masked entries are excluded via weighted means,
    not boolean indexing, so this is jittable on TPU).
    Reference: layers.py:284-302 / evaluate_depth.py:42-60.
    """
    gt = jnp.asarray(gt, jnp.float32)
    pred = jnp.asarray(pred, jnp.float32)
    if mask is None:
        w = jnp.ones_like(gt)
    else:
        w = mask.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)

    def wmean(x):
        return (x * w).sum() / n

    # avoid nan from masked-out entries feeding log/div
    safe_gt = jnp.where(w > 0, gt, 1.0)
    safe_pred = jnp.where(w > 0, pred, 1.0)

    thresh = jnp.maximum(safe_gt / safe_pred, safe_pred / safe_gt)
    a1 = wmean((thresh < 1.25).astype(jnp.float32))
    a2 = wmean((thresh < 1.25**2).astype(jnp.float32))
    a3 = wmean((thresh < 1.25**3).astype(jnp.float32))

    rmse = jnp.sqrt(wmean((safe_gt - safe_pred) ** 2))
    rmse_log = jnp.sqrt(wmean((jnp.log(safe_gt) - jnp.log(safe_pred)) ** 2))
    abs_rel = wmean(jnp.abs(safe_gt - safe_pred) / safe_gt)
    sq_rel = wmean((safe_gt - safe_pred) ** 2 / safe_gt)

    return {
        "de/abs_rel": abs_rel,
        "de/sq_rel": sq_rel,
        "de/rms": rmse,
        "de/log_rms": rmse_log,
        "da/a1": a1,
        "da/a2": a2,
        "da/a3": a3,
    }
