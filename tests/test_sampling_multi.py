"""ops/warp.warp_planes (the fused multi-warp sampler feeding the
photometric loss) must agree with per-warp grid_sample in both backends."""

import jax
import jax.numpy as jnp
import numpy as np

from fusiondepth_tpu.ops.sampling import grid_sample
from fusiondepth_tpu.ops.warp import warp_planes, warp_planes_xla


def _setup(seed=0, n=2, k=3, B=2, H=16, W=24, C=3):
    rng = np.random.default_rng(seed)
    srcs = jnp.asarray(rng.random((n, B, C, H, W), np.float32))
    grids = jnp.asarray(rng.uniform(-1.1, 1.1, (n, k, B, H, W, 2))
                        .astype(np.float32))
    return srcs, grids


def _oracle(srcs, grids):
    n, k = grids.shape[:2]
    outs = np.zeros(srcs.shape[:2] + (k,) + srcs.shape[2:], np.float32)
    for i in range(n):
        img = jnp.moveaxis(srcs[i], 1, -1)  # NHWC
        for j in range(k):
            o = grid_sample(img, grids[i, j])
            outs[i, :, j] = np.moveaxis(np.asarray(o), -1, 1)
    return np.moveaxis(outs, 1, 2)  # (n, k, B, C, H, W)


def test_warp_planes_xla_matches_grid_sample():
    srcs, grids = _setup()
    got = np.asarray(warp_planes_xla(srcs, grids))
    want = _oracle(srcs, grids)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_warp_planes_default_dispatch_is_xla_off_tpu():
    srcs, grids = _setup(seed=1)
    got = np.asarray(warp_planes(srcs, grids, use_pallas=False))
    want = _oracle(srcs, grids)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_warp_planes_border_clamp_far_out_of_range():
    srcs, grids = _setup(seed=2, n=1, k=1)
    far = jnp.full_like(grids, 5.0)  # way past the border
    out = np.asarray(warp_planes_xla(srcs, far))[0, 0]
    # border mode: every sample clamps to the bottom-right pixel
    corner = np.asarray(srcs)[0, :, :, -1, -1][:, :, None, None]
    np.testing.assert_allclose(out, np.broadcast_to(corner, out.shape),
                               atol=1e-6)


def test_warp_planes_grad_flows_to_grids():
    srcs, grids = _setup(seed=3, n=1, k=2, H=8, W=8)

    def loss(g):
        return warp_planes_xla(srcs, g).sum()

    grad = jax.grad(loss)(grids * 0.3)
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).sum()) > 0
