"""CLI: depth-map export for monocular 3D detection (reference
export_detection.py equivalent): run the (refined) model over the KITTI
3D-detection split, optionally GDC-correct, and write uint16 depth pngs
under kitti_detect/training/<det_name>/ for PatchNet-style consumers.
"""

from fusiondepth_tpu.config import parse_args


def main():
    cfg = parse_args()
    import os

    import numpy as np
    from PIL import Image

    from fusiondepth_tpu.data.kitti_dataset import KITTIDetecDataset
    from fusiondepth_tpu.data.kitti_io import readlines
    from fusiondepth_tpu.data.loader import DataLoader
    from fusiondepth_tpu.training.eval_driver import predict_disparities
    from fusiondepth_tpu.ops.depth import disp_to_depth

    split_dir = os.path.join(os.path.dirname(__file__), "splits")
    files = readlines(os.path.join(split_dir, "detection", "test.txt"))
    ext = ".png" if cfg.png else ".jpg"
    dataset = KITTIDetecDataset(cfg.data_path, files, cfg.height, cfg.width,
                                [0], is_train=False, img_ext=ext, cfg=cfg)

    disps, gts = predict_disparities(cfg, dataset)

    det_name = cfg.model_name
    out_root = os.path.join(cfg.data_path, "kitti_detect", "training",
                            det_name)
    os.makedirs(out_root, exist_ok=True)

    import cv2

    n = 0
    for i, disp in enumerate(disps):
        gt = gts[i] if i < len(gts) else None
        gh, gw = (gt.shape if gt is not None else (375, 1242))
        scaled_disp, _ = disp_to_depth(disp, cfg.min_depth, cfg.max_depth)
        scaled_disp = cv2.resize(np.asarray(scaled_disp), (gw, gh))
        depth = 1.0 / scaled_disp
        if gt is not None:
            mask = (gt > 1e-3) & (gt < 80)
            if mask.sum() > 0:
                depth *= np.median(gt[mask]) / np.median(depth[mask])
        if cfg.eval_gdc:
            from fusiondepth_tpu.data.calibration import Calibration
            from fusiondepth_tpu.gdc.gdc import GDCCalib, gdc_correct

            folder, idx, side = dataset.parse_line(i)
            calib = Calibration.from_file(os.path.join(
                dataset.calib_dir(folder, idx), "calib_cam_to_cam.txt"))
            beams = np.where(gt > 0, gt, -1.0) if gt is not None else None
            if beams is not None:
                corrected = np.asarray(gdc_correct(
                    depth.astype(np.float32), beams.astype(np.float32),
                    GDCCalib.from_calibration(calib)))
                if np.isfinite(corrected).all():
                    depth = corrected

        png = np.clip(depth * 256.0, 0, 65535).astype(np.uint16)
        Image.fromarray(png).save(os.path.join(out_root, f"{i:06d}.png"))
        n += 1
    print(f"export_detection: wrote {n} depth maps -> {out_root}")


if __name__ == "__main__":
    main()
