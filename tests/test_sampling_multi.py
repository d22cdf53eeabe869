"""grid_sample_multi (the fused multi-warp gather feeding the photometric
loss) must agree with the reference-parity per-warp grid_sample."""

import numpy as np
import jax.numpy as jnp

from fusiondepth_tpu.ops.sampling import grid_sample, grid_sample_multi


def test_multi_matches_single():
    rng = np.random.default_rng(0)
    B, H, W, C = 2, 16, 24, 3
    srcs = [jnp.asarray(rng.uniform(size=(B, H, W, C)).astype(np.float32))
            for _ in range(2)]
    grids = [jnp.asarray(
        rng.uniform(-1.2, 1.2, size=(B, H, W, 2)).astype(np.float32))
        for _ in range(5)]
    warps = [(i % 2, g) for i, g in enumerate(grids)]
    outs = grid_sample_multi(srcs, warps)
    assert len(outs) == 5
    for (si, g), o in zip(warps, outs):
        np.testing.assert_allclose(np.asarray(o),
                                   np.asarray(grid_sample(srcs[si], g)),
                                   atol=1e-6)


def test_multi_border_clamp():
    src = jnp.arange(12, dtype=jnp.float32).reshape(1, 3, 4, 1)
    far = jnp.full((1, 3, 4, 2), 5.0)  # way outside [-1, 1]
    (out,) = grid_sample_multi([src], [(0, far)])
    np.testing.assert_allclose(np.asarray(out)[0, :, :, 0], 11.0)
