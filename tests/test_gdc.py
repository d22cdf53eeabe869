"""GDC solver tests: KNN correctness, LLE weight properties, end-to-end
correction on a synthetic scene."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fusiondepth_tpu.gdc.gdc import (
    GDCCalib,
    depth_to_points,
    frustum_mask,
    gdc_correct,
    knn_brute,
    lle_weights,
)


def test_knn_matches_scipy():
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    valid = np.ones(300, bool)
    ours = np.asarray(knn_brute(jnp.array(pts), jnp.array(valid), k=5,
                                block=64))
    tree = cKDTree(pts)
    theirs = tree.query(pts, k=6)[1][:, 1:]
    # distances must match even if equidistant indices differ
    d_ours = np.linalg.norm(pts[:, None] - pts[ours], axis=-1)
    d_theirs = np.linalg.norm(pts[:, None] - pts[theirs], axis=-1)
    np.testing.assert_allclose(np.sort(d_ours, 1), np.sort(d_theirs, 1),
                               atol=1e-4)


def test_knn_ignores_invalid_points():
    pts = np.zeros((8, 3), np.float32)
    pts[:4] = np.arange(4)[:, None] * 0.1
    pts[4:] = 1e8 + np.arange(4)[:, None]  # padded sentinels
    valid = np.array([True] * 4 + [False] * 4)
    nb = np.asarray(knn_brute(jnp.array(pts), jnp.array(valid), k=2,
                              block=8))
    assert (nb[:4] < 4).all(), "valid points picked padded neighbors"


def test_lle_weights_reconstruct():
    rng = np.random.default_rng(1)
    x = rng.uniform(5, 50, size=64).astype(np.float32)
    nb = rng.integers(0, 64, size=(64, 10)).astype(np.int32)
    valid = np.ones(64, bool)
    W = np.asarray(lle_weights(jnp.array(x), jnp.array(nb),
                               jnp.array(valid), W_tol=3e-5))
    # weights sum to ~1 and reconstruct x_i from neighbor depths
    np.testing.assert_allclose(W.sum(1), 1.0, atol=1e-3)
    recon = (W * x[nb]).sum(1)
    np.testing.assert_allclose(recon, x, atol=0.05 * np.abs(x).max())


def test_lle_weights_invalid_rows_zero():
    x = jnp.ones(8)
    nb = jnp.zeros((8, 3), jnp.int32)
    valid = jnp.array([True] * 4 + [False] * 4)
    W = np.asarray(lle_weights(x, nb, valid, 1e-4))
    assert (W[4:] == 0).all()


def _toy_scene(H=48, W=64):
    """A fronto-parallel-ish scene inside the GDC frustum with sparse
    anchors: GT is a smooth depth ramp, pred is GT scaled by 1.05."""
    calib = GDCCalib(*[jnp.asarray(v, jnp.float32) for v in
                       (W / 2, H / 2, 100.0, 100.0, 0.0, 0.0)])
    v = np.arange(H)[:, None]
    gt_depth_dense = 10.0 + 0.1 * np.tile(np.arange(W), (H, 1)) \
        + 0.05 * v
    pred = (gt_depth_dense * 1.05).astype(np.float32)
    gt_sparse = np.zeros((H, W), np.float32)
    gt_sparse[::6, ::4] = gt_depth_dense[::6, ::4]
    return calib, pred, gt_sparse, gt_depth_dense.astype(np.float32)


def test_gdc_correct_improves_depth():
    calib, pred, gt_sparse, gt_dense = _toy_scene()
    out = np.asarray(gdc_correct(
        jnp.array(pred), jnp.array(gt_sparse), calib,
        k=6, cap_pl=4096, cap_l=256, maxiter=100, knn_block=256,
        consider_range=(-90.0, 90.0), depth_agree=5.0))
    # anchors pasted exactly
    m = gt_sparse > 0
    np.testing.assert_allclose(out[m], gt_sparse[m])
    # frustum region (excluding anchors): closer to GT than before
    pts = depth_to_points(jnp.array(pred), calib)
    region = np.asarray(frustum_mask(pts)).reshape(pred.shape) & ~m
    err_before = np.abs(pred - gt_dense)[region].mean()
    err_after = np.abs(out - gt_dense)[region].mean()
    assert err_after < err_before * 0.7, (err_before, err_after)


def test_gdc_correct_jits_and_is_finite():
    calib, pred, gt_sparse, _ = _toy_scene(H=32, W=32)
    out = np.asarray(gdc_correct(
        jnp.array(pred), jnp.array(gt_sparse), calib,
        k=4, cap_pl=1024, cap_l=128, maxiter=50, knn_block=128,
        consider_range=(-90.0, 90.0), depth_agree=5.0))
    assert np.isfinite(out).all()
    assert out.shape == pred.shape
