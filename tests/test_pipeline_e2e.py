"""Full two-stage pipeline integration test over a synthetic on-disk KITTI
tree: stage-1 train steps -> checkpoint -> offline inference cache ->
offline GDC cache -> stage-2 refiner step -> evaluation. This is the CI
equivalent of the reference's filesystem-mediated control flow
(SURVEY §1: sparsify -> gen2channel -> trainer -> inf_depth_map -> inf_gdc
-> refiner -> evaluate_depth).
"""

import os

import numpy as np
import pytest

from fusiondepth_tpu.config import Config

H, W = 64, 96  # network resolution for the test
DRIVE = "2011_09_26/2011_09_26_drive_0001_sync"


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    """3-frame synthetic KITTI drive: calib, images, velodyne, 4beam bins,
    2channel caches (at the test resolution)."""
    from fusiondepth_tpu.data.fixtures import build_synthetic_kitti_tree

    return build_synthetic_kitti_tree(
        str(tmp_path_factory.mktemp("kitti")), n_frames=3, height=H, width=W)


@pytest.fixture(scope="module")
def cfg(kitti_tree, tmp_path_factory):
    return Config(
        data_path=kitti_tree, height=H, width=W, num_layers=18,
        batch_size=1, eval_batch_size=1, num_workers=1, log_frequency=1,
        log_dir=str(tmp_path_factory.mktemp("log")))


def test_full_two_stage_pipeline(cfg, kitti_tree):
    from fusiondepth_tpu.data.kitti_dataset import KITTIRAWDataset
    from fusiondepth_tpu.data.loader import DataLoader
    from fusiondepth_tpu.training import checkpoint as ckpt
    from fusiondepth_tpu.training.evaluation import evaluate_disparities
    from fusiondepth_tpu.training.gdc_driver import run_inf_gdc
    from fusiondepth_tpu.training.infer_driver import Infer
    from fusiondepth_tpu.training.refiner_driver import Refiner
    from fusiondepth_tpu.training.trainer import Trainer, device_batch

    lines = [f"{DRIVE} 1 l"]  # middle frame has both temporal neighbors

    # ---- stage 1: a couple of train steps + checkpoint ----
    train_ds = KITTIRAWDataset(kitti_tree, lines, H, W, cfg.frame_ids,
                               is_train=True, cfg=cfg)
    tr = Trainer(cfg, train_dataset=train_ds, val_dataset=None)
    for batch in DataLoader(train_ds, 1, num_workers=1):
        losses = tr.run_step(batch)
        assert np.isfinite(float(losses["loss"]))
    stage1_path = ckpt.save_checkpoint(cfg, tr.state, "e2e")
    assert os.path.isdir(stage1_path)

    # ---- offline caches: inf_depth -> inf_gdc ----
    infer_cfg = cfg.replace(load_weights_folder=stage1_path)
    infer_ds = KITTIRAWDataset(kitti_tree, lines, H, W, [0],
                               is_train=False, cfg=cfg)
    n = Infer(infer_cfg).run_split(infer_ds, kitti_tree)
    assert n == 1
    assert os.path.exists(
        f"{kitti_tree}/{DRIVE}/inf_depth_4beam/1_l.npy")

    n = run_inf_gdc(cfg, lines, cap_pl=4096, cap_l=1024)
    assert n == 1
    gdc = np.load(f"{kitti_tree}/{DRIVE}/inf_gdc_4beam/1_l.npy")
    assert np.isfinite(gdc).all()

    # ---- stage 2: one refiner step consuming the caches ----
    ref_cfg = cfg.replace(refine_load_weights_folder=stage1_path,
                          clone_gdc=True)
    ref_train = KITTIRAWDataset(kitti_tree, lines, H, W, cfg.frame_ids,
                                is_train=True, cfg=ref_cfg)
    refiner = Refiner(ref_cfg, ref_train, None)
    for batch in DataLoader(ref_train, 1, num_workers=1):
        losses = refiner.run_step(batch)
        assert np.isfinite(float(losses["loss"]))

    # ---- evaluation over the frame ----
    disps, gts = [], []
    for batch in DataLoader(infer_ds, 1, num_workers=1):
        disp = refiner.infer(refiner.refine_params,
                             refiner.frozen_variables, device_batch(batch))
        disps.extend(np.asarray(disp)[..., 0])
        gts.extend(batch["depth_gt"])
    metrics = evaluate_disparities(disps, gts)
    for k in ("abs_rel", "rmse", "a1"):
        assert np.isfinite(metrics[k]), metrics
