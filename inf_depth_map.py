"""CLI: offline depth-map inference cache (reference inf_depth_map.py
equivalent): run the frozen stage-1 model over train+test splits and save
raw disparities for GDC / refiner consumption.
"""

from fusiondepth_tpu.config import parse_args


def main():
    cfg = parse_args()
    import os

    from fusiondepth_tpu.data.kitti_dataset import KITTIRAWDataset
    from fusiondepth_tpu.data.kitti_io import readlines
    from fusiondepth_tpu.training.infer_driver import Infer

    split_dir = os.path.join(os.path.dirname(__file__), "splits")
    ext = ".png" if cfg.png else ".jpg"
    datasets = []
    for split_file in (
            os.path.join(split_dir, cfg.split, "train_files.txt"),
            os.path.join(split_dir, "eigen", "test_files.txt")):
        datasets.append(KITTIRAWDataset(
            cfg.data_path, readlines(split_file), cfg.height, cfg.width,
            [0], is_train=False, img_ext=ext, cfg=cfg))
    Infer(cfg, datasets).run()


if __name__ == "__main__":
    main()
