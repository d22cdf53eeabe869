"""Evaluation-mode wiring: stereo x5.4 protocol, no_eval export-only mode,
benchmark png export (reference evaluate_depth.py:287-324)."""

import os

import numpy as np
import pytest

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.training.eval_driver import evaluate
from fusiondepth_tpu.training.evaluation import (
    STEREO_SCALE_FACTOR,
    evaluate_one,
)


class _FakeDataset:
    """Pre-baked disparities via ext_disp_to_eval; only GT comes from here."""

    def __init__(self, gts):
        self.gts = gts

    def __len__(self):
        return len(self.gts)

    def __getitem__(self, i):
        return {"depth_gt": self.gts[i]}


def _ext_disps(tmp_path, n=3, h=24, w=48, depth=10.0):
    disps = np.full((n, h, w), 1.0 / depth, np.float32)
    path = str(tmp_path / "disps.npy")
    np.save(path, disps)
    return path


def test_stereo_eval_disables_median_and_scales(tmp_path):
    # GT = 5.4 * raw depth: perfect under the stereo protocol, badly wrong
    # without the x5.4 (if median scaling were still on it would also be
    # perfect — so a correct stereo run must both disable it and scale)
    gh, gw = 96, 320
    gt = np.full((gh, gw), 10.0 * STEREO_SCALE_FACTOR, np.float32)
    ext = _ext_disps(tmp_path, n=2, depth=10.0)
    cfg = Config(eval_stereo=True, ext_disp_to_eval=ext,
                 log_dir=str(tmp_path), eval_split="eigen")
    metrics = evaluate(cfg, dataset=_FakeDataset([gt, gt]))
    assert metrics["abs_rel"] == pytest.approx(0.0, abs=1e-5)
    assert metrics["med_ratio"] == pytest.approx(1.0)  # median scaling off

    # mono protocol on the same data: median scaling hides the scale error
    cfg_mono = Config(ext_disp_to_eval=ext, log_dir=str(tmp_path))
    m = evaluate(cfg_mono, dataset=_FakeDataset([gt, gt]))
    assert m["med_ratio"] == pytest.approx(STEREO_SCALE_FACTOR, rel=1e-3)


def test_evaluate_one_stereo_fields():
    gt = np.full((64, 128), 27.0, np.float32)
    pred_disp = np.full((32, 64), 1.0 / 5.0, np.float32)
    m, ratio = evaluate_one(pred_disp, gt, disable_median_scaling=True,
                            pred_depth_scale_factor=STEREO_SCALE_FACTOR)
    assert ratio == 1.0
    assert m["abs_rel"] == pytest.approx(0.0, abs=1e-6)


def test_no_eval_exports_and_skips_metrics(tmp_path):
    ext = _ext_disps(tmp_path)
    cfg = Config(no_eval=True, save_pred_disps=True, ext_disp_to_eval=ext,
                 log_dir=str(tmp_path / "log"))
    gt = np.full((24, 48), 10.0, np.float32)
    out = evaluate(cfg, dataset=_FakeDataset([gt] * 3))
    assert out is None
    assert os.path.exists(str(tmp_path / "log" / "disps_eigen_split.npy"))


def test_benchmark_split_exports_uint16_pngs(tmp_path):
    import cv2

    ext = _ext_disps(tmp_path, n=2, depth=10.0)
    cfg = Config(eval_split="benchmark", ext_disp_to_eval=ext,
                 log_dir=str(tmp_path / "log"))
    out = evaluate(cfg, dataset=_FakeDataset(
        [np.full((24, 48), 10.0, np.float32)] * 2))
    assert out is None
    p = str(tmp_path / "log" / "benchmark_predictions" / "0000000000.png")
    assert os.path.exists(p)
    img = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    assert img.dtype == np.uint16 and img.shape == (352, 1216)
    # depth = 5.4 / disp = 54 m -> stored x256
    assert abs(int(img[176, 608]) - int(54 * 256)) <= 256
