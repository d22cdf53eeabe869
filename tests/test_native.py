"""Native C++ data-path kernels: build, and parity with the numpy paths."""

import numpy as np
import pytest

from fusiondepth_tpu.native import (
    available,
    expand_two_channel_native,
    max_pool2_native,
    project_points_native,
)

pytestmark = pytest.mark.skipif(not available(),
                                reason="no C++ toolchain available")


def test_project_points_parity():
    from fusiondepth_tpu.data import kitti_io

    rng = np.random.default_rng(0)
    n = 5000
    velo = np.stack([
        rng.uniform(-5, 60, n), rng.uniform(-30, 30, n),
        rng.uniform(-3, 2, n), np.ones(n)], 1).astype(np.float32)
    P = np.array([[700, 0, 600, 40], [0, 700, 170, 1], [0, 0, 1, 0.003]],
                 np.float64)
    native = project_points_native(velo, P, (375, 1242))
    # numpy reference path (bypass the native fast path inside)
    pts = velo[velo[:, 0] >= 0]
    proj = pts @ P.T
    z = proj[:, 2]
    u = np.round(proj[:, 0] / z) - 1
    v = np.round(proj[:, 1] / z) - 1
    d = z
    ok = (u >= 0) & (v >= 0) & (u < 1242) & (v < 375)
    ref = np.full(375 * 1242, np.inf)
    np.minimum.at(ref, (v[ok] * 1242 + u[ok]).astype(np.int64), d[ok])
    ref[~np.isfinite(ref)] = 0
    ref = ref.reshape(375, 1242)
    ref[ref < 0] = 0
    np.testing.assert_allclose(native, ref, atol=1e-9)


def test_expand_two_channel_parity_with_oracle():
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_data import _oracle_two_channel

    rng = np.random.default_rng(1)
    sparse = np.zeros((192, 64), np.float32)
    for r in (80, 120, 160):
        hits = rng.uniform(size=64) < 0.3
        sparse[r, hits] = rng.uniform(0.05, 0.8, hits.sum())
    native = expand_two_channel_native(sparse, 2, (76, 190), (2, 62))
    oracle = _oracle_two_channel(sparse, col_range=(2, 62))
    np.testing.assert_allclose(native, oracle, atol=1e-6)


def test_max_pool2_parity():
    rng = np.random.default_rng(2)
    for shape in [(384, 1280), (7, 9)]:
        x = rng.normal(size=shape)
        native = max_pool2_native(x)
        from fusiondepth_tpu.data.two_channel import max_pool2

        np.testing.assert_allclose(native, max_pool2(x))
