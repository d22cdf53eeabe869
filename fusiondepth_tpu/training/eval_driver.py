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
    STEREO_SCALE_FACTOR,
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


def predict_refined_disparities(cfg: Config, dataset):
    """Stage-2 (refine2d) inference replay for evaluation (reference
    evaluate_depth.py:197-233): frozen stage-1 forward, pseudo-3D input
    construction, refine decoder. Stage-1 weights come from
    cfg.refine_load_weights_folder; refine weights from
    cfg.load_weights_folder (an orbax refine checkpoint)."""
    from fusiondepth_tpu.data.loader import DataLoader
    from fusiondepth_tpu.training.refiner_driver import Refiner
    from fusiondepth_tpu.training.trainer import device_batch

    refiner = Refiner(cfg)
    if cfg.load_weights_folder and os.path.isdir(cfg.load_weights_folder):
        try:
            refiner.load(cfg.load_weights_folder)
        except Exception as e:
            print(f"WARNING: refine checkpoint load failed ({e}); "
                  "evaluating random refine init")

    loader = DataLoader(dataset, cfg.eval_batch_size, shuffle=False)
    disps, gts = [], []
    for batch in loader:
        db = device_batch(batch)
        disp = np.asarray(refiner.infer(
            refiner.refine_params, refiner.frozen_variables, db))[..., 0]
        if cfg.post_process:
            # flip post-process through the FULL refine pipeline (reference
            # evaluate_depth.py:168-170,240-242 duplicates the batch with
            # mirrored inputs before the refine loop)
            flipped = {
                k: (v[..., ::-1, :] if k in ("color", "color_aug",
                                             "two_channel", "four_beam")
                    else v)
                for k, v in db.items()
            }
            disp_f = np.asarray(refiner.infer(
                refiner.refine_params, refiner.frozen_variables,
                flipped))[..., 0]
            disp = flip_postprocess(disp, disp_f[:, :, ::-1])
        disps.extend(disp)
        gts.extend(batch.get("depth_gt", []))
    return disps, gts


def gdc_on_disparities(cfg: Config, dataset, disps):
    """Online GDC at evaluation (reference evaluate_depth.py:387-405):
    per frame, median-scale the predicted depth to the K-beam LiDAR inside
    the eigen crop, run the GDC solver with per-frame calibration, convert
    back to disparity. Falls back to the uncorrected frame if the solve
    goes non-finite (reference's bare try/except)."""
    import cv2

    from fusiondepth_tpu.data.calibration import Calibration
    from fusiondepth_tpu.data.kitti_io import generate_depth_map
    from fusiondepth_tpu.gdc.gdc import GDCCalib, gdc_correct
    from fusiondepth_tpu.training.gdc_driver import median_scale_to_beams

    out = []
    calib_cache = {}
    for i, disp in enumerate(disps):
        folder, idx, side = dataset.parse_line(i)
        date = folder.split("/")[0]
        if date not in calib_cache:
            calib_cache[date] = Calibration.from_file(os.path.join(
                cfg.data_path, date, "calib_cam_to_cam.txt"))
        calib = calib_cache[date]

        beam_bin = os.path.join(
            cfg.data_path, folder, dataset.beam_folder(),
            dataset.frame_str(idx) + ".bin")
        side_cam = {"l": 2, "r": 3}[side]
        beams = generate_depth_map(os.path.join(cfg.data_path, date),
                                   beam_bin, side_cam, vel_depth=True)
        gh, gw = beams.shape
        d = np.asarray(disp, np.float32)
        depth = 1.0 / np.maximum(cv2.resize(d, (gw, gh)), 1e-12)
        depth = median_scale_to_beams(depth, beams)
        gtd = beams.copy()
        gtd[gtd == 0] = -1
        corrected, info = gdc_correct(
            depth.astype(np.float32), gtd.astype(np.float32),
            GDCCalib.from_calibration(calib),
            k=10, W_tol=3e-5, recon_tol=5e-4, return_info=True)
        corrected = np.asarray(corrected)
        if bool(info["overflow"]):
            print(f"WARNING: GDC capacity overflow at frame {i}: "
                  f"n_pl={int(info['n_pl'])} n_l={int(info['n_l'])} — "
                  "points beyond capacity were dropped", flush=True)
        if not np.isfinite(corrected).all():
            print(f"GDC failed at frame {i}; keeping uncorrected")
            out.append(disp)
        else:
            out.append(cv2.resize(1.0 / np.maximum(corrected, 1e-6),
                                  (d.shape[1], d.shape[0])))
    return out


def save_visualizations(cfg: Config, disps, out_dir: str) -> None:
    """Colormapped disparity dumps (reference evaluate_depth.py:407-449's
    magma rendering, minus the wandb/open3d hooks)."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    for i, disp in enumerate(disps):
        d = np.asarray(disp, np.float32)
        vmax = np.percentile(d, 95)
        norm = np.clip(d / max(vmax, 1e-9), 0, 1)
        img = cv2.applyColorMap((norm * 255).astype(np.uint8),
                                cv2.COLORMAP_MAGMA)
        cv2.imwrite(os.path.join(out_dir, f"{i}{cfg.vis_name}depth.png"),
                    img, [cv2.IMWRITE_PNG_COMPRESSION, 0])


def evaluate_per_semantic(cfg: Config, disps, gts) -> Optional[np.ndarray]:
    """Per-semantic-class metric breakdown (reference
    evaluate_depth.py:451-467): requires externally produced segmentation
    masks pred_mask{i}.png under cfg.semantic_mask_path."""
    from PIL import Image

    from fusiondepth_tpu.training.evaluation import (
        compute_errors_np,
        garg_crop_mask,
    )
    import cv2

    if not os.path.isdir(cfg.semantic_mask_path):
        print(f"per_semantic: mask dir {cfg.semantic_mask_path!r} missing")
        return None
    n_classes = 34
    rows = np.zeros((n_classes, len(disps), 7))
    counts = np.zeros((n_classes, len(disps)))
    for i, (disp, gt) in enumerate(zip(disps, gts)):
        gh, gw = gt.shape
        pred = 1.0 / np.maximum(
            cv2.resize(np.asarray(disp, np.float32), (gw, gh)), 1e-12)
        mask = (gt > 1e-3) & (gt < 80) & garg_crop_mask(gh, gw)
        if mask.sum():
            ratio = np.median(gt[mask]) / np.median(pred[mask])
            pred = pred * ratio
        sem = np.asarray(Image.open(os.path.join(
            cfg.semantic_mask_path, f"pred_mask{i}.png")))
        for sid in range(n_classes):
            m = mask & (sem == sid)
            counts[sid, i] = m.sum()
            if counts[sid, i] > 0:
                p = np.clip(pred[m], 1e-3, 80)
                rows[sid, i] = list(compute_errors_np(gt[m], p).values())
    weights = counts / np.maximum(counts.sum(1, keepdims=True), 1)
    per_class = (rows * weights[..., None]).sum(1)
    for sid in range(n_classes):
        if counts[sid].sum() > 0:
            print(f"  class {sid:2d}: absrel {per_class[sid, 0]:.3f} "
                  f"({int(counts[sid].sum())} px)")
    return per_class


def evaluate(cfg: Config, dataset=None):
    if dataset is None:
        from fusiondepth_tpu.data.kitti_dataset import (
            KITTIDepthDataset,
            KITTIRAWDataset,
        )
        from fusiondepth_tpu.data.kitti_io import readlines

        split_dir = os.path.join(os.path.dirname(__file__), "..", "..",
                                 "splits")
        if cfg.demo:
            # demo mode evaluates the frames listed in splits/demo/demo.txt
            # (reference evaluate_depth.py:95-97)
            files = readlines(os.path.join(split_dir, "demo", "demo.txt"))
        else:
            files = readlines(os.path.join(
                split_dir, cfg.eval_split, "test_files.txt"))
        # eigen_benchmark evaluates against the improved (annotated-png) GT
        # of the KITTI depth benchmark; its protocol masks gt>0 with no garg
        # crop (evaluation.evaluate_one handles non-"eigen" splits)
        cls = (KITTIDepthDataset if cfg.eval_split == "eigen_benchmark"
               else KITTIRAWDataset)
        dataset = cls(
            cfg.data_path, files, cfg.height, cfg.width, [0],
            is_train=False, img_ext=".png" if cfg.png else ".jpg", cfg=cfg)

    if cfg.ext_disp_to_eval:
        # evaluate externally produced disparities
        # (reference evaluate_depth.py:246-262)
        disps = list(np.load(cfg.ext_disp_to_eval, allow_pickle=True))
        gts = [dataset[i]["depth_gt"] for i in range(len(dataset))]
    elif cfg.refine_2d:
        disps, gts = predict_refined_disparities(cfg, dataset)
    else:
        disps, gts = predict_disparities(cfg, dataset)

    if cfg.save_pred_disps:
        out = os.path.join(cfg.log_dir,
                           f"disps_{cfg.eval_split}_split.npy")
        os.makedirs(cfg.log_dir, exist_ok=True)
        np.save(out, np.array([np.asarray(d) for d in disps],
                              dtype=object), allow_pickle=True)
        print(f"saved predicted disparities -> {out}")

    if cfg.no_eval:
        # export-only mode (reference evaluate_depth.py:287-289)
        print("-> Evaluation disabled. Done.")
        return None

    if cfg.eval_split == "benchmark":
        # KITTI benchmark test set has no public GT: export uint16 depth
        # pngs at 1216x352 instead (reference evaluate_depth.py:291-305)
        import cv2

        save_dir = os.path.join(cfg.log_dir, "benchmark_predictions")
        os.makedirs(save_dir, exist_ok=True)
        for idx, disp in enumerate(disps):
            d = cv2.resize(np.asarray(disp, np.float32), (1216, 352))
            depth = np.clip(STEREO_SCALE_FACTOR / np.maximum(d, 1e-9), 0, 80)
            cv2.imwrite(os.path.join(save_dir, f"{idx:010d}.png"),
                        np.uint16(depth * 256))
        print(f"-> Saved benchmark predictions to {save_dir}; "
              "no ground truth available, not evaluating.")
        return None

    if cfg.visualize:
        save_visualizations(cfg, disps,
                            os.path.join(cfg.log_dir, "visualization"))

    if cfg.per_semantic:
        evaluate_per_semantic(cfg, disps, gts)

    if cfg.eval_gdc:
        disps = gdc_on_disparities(cfg, dataset, disps)

    if cfg.eval_stereo:
        # stereo protocol: no median scaling, fixed x5.4 metric scale
        # (reference evaluate_depth.py:320-324)
        print("   Stereo evaluation - disabling median scaling, "
              f"scaling by {STEREO_SCALE_FACTOR}")
        cfg = cfg.replace(disable_median_scaling=True,
                          pred_depth_scale_factor=STEREO_SCALE_FACTOR)

    metrics = evaluate_disparities(
        disps, gts,
        disable_median_scaling=cfg.disable_median_scaling,
        pred_depth_scale_factor=cfg.pred_depth_scale_factor,
        eval_split=cfg.eval_split)

    print("  " + ("{:>11} " * 7).format(*METRIC_NAMES))
    print("  " + ("{:11.3f} " * 7).format(
        *[metrics[k] for k in METRIC_NAMES]))
    return metrics
