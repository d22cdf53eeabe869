"""Pallas streaming KNN: exactness vs the XLA path (TPU only — Mosaic
kernels don't run on the CPU test platform)."""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform == "cpu",
    reason="pallas TPU kernel; CPU test platform")


def test_pallas_knn_matches_xla():
    import jax.numpy as jnp

    from fusiondepth_tpu.gdc.gdc import knn_brute
    from fusiondepth_tpu.gdc.pallas_knn import knn_pallas

    rng = np.random.default_rng(0)
    N, k = 4096, 10
    pts = rng.normal(size=(N, 3)).astype(np.float32) * 10
    ref = np.asarray(knn_brute(jnp.array(pts), jnp.ones(N, bool), k=k,
                               block=512))
    out = np.asarray(knn_pallas(jnp.array(pts), k=k))
    d_ref = np.sort(np.linalg.norm(pts[:, None] - pts[ref], axis=-1), 1)
    d_out = np.sort(np.linalg.norm(pts[:, None] - pts[out], axis=-1), 1)
    np.testing.assert_allclose(d_out, d_ref, atol=1e-5)
