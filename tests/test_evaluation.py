"""Evaluation protocol unit tests: garg crop, median scaling, flip
postprocess, metric math."""

import numpy as np
import pytest

from fusiondepth_tpu.training.evaluation import (
    compute_errors_np,
    evaluate_one,
    flip_postprocess,
    garg_crop_mask,
)


def test_garg_crop_bounds():
    m = garg_crop_mask(375, 1242)
    rows = np.where(m.any(axis=1))[0]
    cols = np.where(m.any(axis=0))[0]
    assert rows[0] == int(0.40810811 * 375)
    assert rows[-1] == int(0.99189189 * 375) - 1
    assert cols[0] == int(0.03594771 * 1242)
    assert cols[-1] == int(0.96405229 * 1242) - 1


def test_evaluate_one_perfect_prediction():
    rng = np.random.default_rng(0)
    gt = rng.uniform(5, 50, size=(100, 200)).astype(np.float32)
    disp = 1.0 / gt
    metrics, ratio = evaluate_one(disp, gt)
    assert metrics["abs_rel"] == pytest.approx(0.0, abs=1e-5)
    assert metrics["a1"] == 1.0
    assert ratio == pytest.approx(1.0, rel=1e-5)


def test_evaluate_one_median_scaling_fixes_scale():
    rng = np.random.default_rng(1)
    # keep 2x depth below the 80 m protocol clamp
    gt = rng.uniform(5, 35, size=(100, 200)).astype(np.float32)
    disp = 1.0 / (2.0 * gt)  # prediction is 2x too deep
    m_scaled, ratio = evaluate_one(disp, gt)
    assert ratio == pytest.approx(0.5, rel=1e-4)
    assert m_scaled["abs_rel"] == pytest.approx(0.0, abs=1e-4)
    m_raw, _ = evaluate_one(disp, gt, disable_median_scaling=True)
    assert m_raw["abs_rel"] == pytest.approx(1.0, rel=1e-3)
    assert m_raw["a1"] == 0.0


def test_flip_postprocess_identity_on_symmetric():
    rng = np.random.default_rng(2)
    d = rng.uniform(0.01, 0.5, size=(2, 20, 40)).astype(np.float32)
    out = flip_postprocess(d, d)
    np.testing.assert_allclose(out, d, rtol=1e-5)


def test_compute_errors_known_values():
    gt = np.array([10.0, 20.0], np.float32)
    pred = np.array([11.0, 18.0], np.float32)
    m = compute_errors_np(gt, pred)
    assert m["abs_rel"] == pytest.approx((0.1 + 0.1) / 2)
    assert m["rmse"] == pytest.approx(np.sqrt((1 + 4) / 2))
    assert m["a1"] == 1.0  # both within 1.25
