"""Offline GDC runner (reference inf_gdc.py:41-110): for every frame of the
train+test splits, load the cached inf_depth disparity, convert to metric
depth at native resolution, median-scale against the K-beam LiDAR inside
the eigen crop, run GDC, and cache inf_gdc_{n}beam/{idx}_{side}.npy.

TPU-native: the reference fans a CPU process pool over frames with
pykdtree+scipy per worker; here the whole correction is one jitted JAX
computation per frame (KNN on the MXU, batched solves, matrix-free CG) —
no pool needed, the accelerator is the parallelism. GDC failure (reference
bare `except: print`) maps to a finite-value guard that falls back to the
uncorrected depth.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.data.calibration import Calibration
from fusiondepth_tpu.data.kitti_io import generate_depth_map
from fusiondepth_tpu.gdc.gdc import GDCCalib, gdc_correct
from fusiondepth_tpu.ops.depth import disp_to_depth
from fusiondepth_tpu.training.evaluation import garg_crop_mask


def median_scale_to_beams(pred_depth: np.ndarray, beam_depth: np.ndarray
                          ) -> np.ndarray:
    """Eigen-crop median ratio scaling (reference inf_gdc.py:65-73)."""
    gh, gw = beam_depth.shape
    mask = (beam_depth > 1e-3) & (beam_depth < 80) & garg_crop_mask(gh, gw)
    if mask.sum() == 0:
        return pred_depth
    ratio = np.median(beam_depth[mask]) / np.median(pred_depth[mask])
    return pred_depth * ratio


def gdc_one_frame(cfg: Config, data_path: str, folder: str, idx: int,
                  side: str, calib: Optional[Calibration] = None,
                  cap_pl: int = 32768, cap_l: int = 8192) -> np.ndarray:
    """Full per-frame correction; returns the depth map that gets cached."""
    import cv2

    date = folder.split("/")[0]
    if calib is None:
        calib = Calibration.from_file(
            os.path.join(data_path, date, "calib_cam_to_cam.txt"))

    if cfg.random_sample > 0:
        beam_dir, depth_dir = (f"random{cfg.random_sample}",
                               f"inf_depth_r{cfg.random_sample}")
        consider_range = (-1.5, 9.0)
    else:
        beam_dir, depth_dir = (f"{cfg.nbeams}beam",
                               f"inf_depth_{cfg.nbeams}beam")
        consider_range = (-0.1, 4.0)

    beam_bin = os.path.join(data_path, folder, beam_dir, f"{idx:010d}.bin")
    side_cam = {"l": 2, "r": 3}[side]
    beams = generate_depth_map(
        os.path.join(data_path, date), beam_bin, side_cam, vel_depth=True)

    disp = np.load(os.path.join(
        data_path, folder, depth_dir, f"{idx}_{side}.npy"))[0][0]
    scaled_disp, _ = disp_to_depth(disp, cfg.min_depth, cfg.max_depth)
    gh, gw = beams.shape
    scaled_disp = cv2.resize(np.asarray(scaled_disp), (gw, gh))
    pred_depth = 1.0 / scaled_disp

    pred_depth = median_scale_to_beams(pred_depth, beams)

    gtd = beams.copy()
    gtd[gtd == 0] = -1

    corrected, info = gdc_correct(
        pred_depth.astype(np.float32), gtd.astype(np.float32),
        GDCCalib.from_calibration(calib),
        k=10, W_tol=3e-5, recon_tol=5e-4,
        consider_range=consider_range,
        cap_pl=cap_pl, cap_l=cap_l, return_info=True)
    corrected = np.asarray(corrected)
    if bool(info["overflow"]):
        print(f"WARNING: GDC capacity overflow for {folder} {idx} {side}: "
              f"n_pl={int(info['n_pl'])}/{cap_pl} "
              f"n_l={int(info['n_l'])}/{cap_l} — points beyond capacity "
              "were dropped; raise cap_pl/cap_l", flush=True)

    if not np.isfinite(corrected).all():
        print(f"GDC failed for {folder} {idx} {side}; keeping uncorrected")
        corrected = pred_depth
    return corrected


def run_inf_gdc(cfg: Config, lines: Sequence[str],
                data_path: Optional[str] = None,
                cap_pl: int = 32768, cap_l: int = 8192) -> int:
    """Process every `folder idx side` line; returns frames written."""
    data_path = data_path or cfg.data_path
    n = 0
    calib_cache = {}
    for line in lines:
        folder, idx, side = line.split()
        idx = int(idx)
        date = folder.split("/")[0]
        if date not in calib_cache:
            calib_cache[date] = Calibration.from_file(
                os.path.join(data_path, date, "calib_cam_to_cam.txt"))
        depth = gdc_one_frame(cfg, data_path, folder, idx, side,
                              calib_cache[date], cap_pl=cap_pl,
                              cap_l=cap_l)
        if cfg.random_sample > 0:
            out_dir = os.path.join(data_path, folder,
                                   f"inf_gdc_r{cfg.random_sample}")
        else:
            out_dir = os.path.join(data_path, folder,
                                   f"inf_gdc_{cfg.nbeams}beam")
        os.makedirs(out_dir, exist_ok=True)
        np.save(os.path.join(out_dir, f"{idx}_{side}.npy"),
                depth.astype(np.float32))
        n += 1
    return n
