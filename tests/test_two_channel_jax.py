"""On-device 2-channel expansion matches the host (numpy/C++) paths."""

import numpy as np
import jax.numpy as jnp

from fusiondepth_tpu.data.two_channel import expand_two_channel
from fusiondepth_tpu.ops.two_channel_jax import expand_two_channel_jax


def test_jax_matches_host():
    rng = np.random.default_rng(0)
    sparse = np.zeros((192, 640), np.float32)
    for r in (80, 100, 140, 180):
        hits = rng.uniform(size=640) < 0.3
        sparse[r, hits] = rng.uniform(0.05, 0.8, hits.sum())
    host = expand_two_channel(sparse)
    dev = np.asarray(expand_two_channel_jax(jnp.array(sparse)))
    np.testing.assert_allclose(dev, host, atol=1e-6)


def test_jax_batched():
    rng = np.random.default_rng(1)
    sparse = np.zeros((3, 192, 64), np.float32)
    sparse[:, 100, ::5] = rng.uniform(0.1, 0.5, (3, 13))
    out = np.asarray(expand_two_channel_jax(
        jnp.array(sparse), col_range=(2, 62)))
    assert out.shape == (3, 192, 64, 2)
    for b in range(3):
        ref = expand_two_channel(sparse[b], col_range=(2, 62))
        np.testing.assert_allclose(out[b], ref, atol=1e-6)
