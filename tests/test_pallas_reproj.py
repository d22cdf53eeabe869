"""Fused SSIM+L1 reprojection-loss kernel (ops/pallas_reproj.py) vs the
XLA planes path — forward and warped-cotangent, interpret mode."""

import numpy as np
import jax
import jax.numpy as jnp

from fusiondepth_tpu.ops.pallas_reproj import (
    reproj_loss_pallas,
    pallas_reproj_ok,
)
from fusiondepth_tpu.ops.planes import box3, reprojection_loss_planes


def _data(dtype=np.float32, H=48, W=128):
    n, k, B, C = 2, 2, 1, 3
    rng = np.random.RandomState(0)
    warped = jnp.asarray(rng.rand(n, k, B, C, H, W).astype(dtype))
    target = jnp.asarray(rng.rand(B, C, H, W).astype(dtype))
    return warped, target


def test_fused_reproj_matches_planes():
    warped, target = _data()
    assert pallas_reproj_ok(warped.shape[-2])
    muy = box3(target)
    ey2 = box3(target * target)
    ref = reprojection_loss_planes(warped, target[None, None])
    out = reproj_loss_pallas(warped, target, muy, ey2, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)

    g = jnp.asarray(np.random.RandomState(1).standard_normal(
        ref.shape).astype(np.float32))
    _, vr = jax.vjp(
        lambda w: reprojection_loss_planes(w, target[None, None]), warped)
    _, vp = jax.vjp(
        lambda w: reproj_loss_pallas(w, target, muy, ey2, True), warped)
    np.testing.assert_allclose(np.asarray(vp(g)[0]), np.asarray(vr(g)[0]),
                               atol=5e-5)


def test_fused_reproj_identity_shape():
    """The identity-reprojection call pattern: (n, B, C, H, W) sources as
    a k=1 candidate axis."""
    warped, target = _data()
    sources = warped[:, 0]
    muy = box3(target)
    ey2 = box3(target * target)
    out = reproj_loss_pallas(sources[:, None], target, muy, ey2, True)[:, 0]
    ref = reprojection_loss_planes(sources, target[None])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)
