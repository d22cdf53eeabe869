"""Completion subsystem tests: dataset contract over a synthetic on-disk
layout, metrics, and a tiny completor train step."""

import os

import numpy as np
import pytest
from PIL import Image

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.data.completion_dataset import (
    KITTICompletion,
    bottom_crop,
    discover_paths,
    load_depth_png,
)
from fusiondepth_tpu.training.completor import completion_metrics


@pytest.fixture(scope="module")
def completion_tree(tmp_path_factory):
    """Minimal completion layout: 3 consecutive frames of one drive."""
    root = tmp_path_factory.mktemp("completion")
    drive = "2011_09_26_drive_0001_sync"
    rgb_dir = root / "data_rgb" / "train" / drive / "image_02" / "data"
    d_dir = (root / "data_depth_velodyne" / "train" / drive / "proj_depth"
             / "velodyne_raw" / "image_02")
    gt_dir = (root / "data_depth_annotated" / "train" / drive / "proj_depth"
              / "groundtruth" / "image_02")
    for d in (rgb_dir, d_dir, gt_dir):
        d.mkdir(parents=True)

    rng = np.random.default_rng(0)
    H, W = 375, 1242
    for i in range(3):
        img = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
        Image.fromarray(img).save(rgb_dir / f"{i:010d}.png")
        sparse = np.zeros((H, W), np.uint16)
        hits = rng.uniform(size=(H, W)) < 0.05
        sparse[hits] = (rng.uniform(2, 80, hits.sum()) * 256).astype(
            np.uint16)
        Image.fromarray(sparse).save(d_dir / f"{i:010d}.png")
        Image.fromarray(sparse).save(gt_dir / f"{i:010d}.png")
    return str(root)


def test_discover_paths_train_verifies_neighbors(completion_tree):
    paths = discover_paths(completion_tree, "train", "select")
    # only the middle frame has both neighbors
    assert len(paths["rgb"]) == 1
    assert "0000000001" in paths["rgb"][0]


def test_bottom_crop_shape():
    x = np.zeros((375, 1242, 3))
    assert bottom_crop(x).shape == (352, 1216, 3)
    assert bottom_crop(np.zeros((375, 1242))).shape == (352, 1216)


def test_load_depth_png(completion_tree):
    paths = discover_paths(completion_tree, "train", "select")
    d = load_depth_png(paths["d"][0])
    assert d.dtype == np.float32
    assert d.max() < 300  # meters


def test_completion_dataset_contract(completion_tree):
    cfg = Config()
    ds = KITTICompletion(completion_tree, frame_ids=(0, -1, 1),
                         is_train=True, cfg=cfg)
    assert len(ds) == 1
    s = ds[0]
    assert s["color"].shape == (3, 352, 1216, 3)
    assert s["color_aug"].shape == (3, 352, 1216, 3)
    assert s["two_channel"].shape == (3, 352, 1216, 2)
    assert s["four_beam"].shape == (352, 1216, 1)
    assert s["depth_gt"].shape == (352, 1216)
    assert s["K"].shape == (4, 4)
    # sparse depth normalized by /100
    assert s["four_beam"].max() < 1.0


def test_completion_metrics_perfect_and_offset():
    gt = np.zeros((10, 10), np.float32)
    gt[5:, :] = 10.0
    m = completion_metrics(gt, gt.copy())
    assert m["rmse"] == 0.0 and m["imae"] == 0.0
    pred = gt + 0.5  # +500mm everywhere valid
    m2 = completion_metrics(gt, pred)
    assert m2["mae"] == pytest.approx(500.0, rel=1e-3)
