"""CLI: stage-2 refine training (reference refiner.py equivalent):
distills offline GDC into the feed-forward refine2d decoder.
"""

from fusiondepth_tpu.config import parse_args


def main():
    cfg = parse_args()
    from fusiondepth_tpu.data.kitti_dataset import KITTIRAWDataset
    from fusiondepth_tpu.data.kitti_io import readlines
    from fusiondepth_tpu.training.refiner_driver import Refiner
    import os

    split_dir = os.path.join(os.path.dirname(__file__), "splits")
    ext = ".png" if cfg.png else ".jpg"
    cfg = cfg.replace(clone_gdc=True, refine_2d=True)
    train = KITTIRAWDataset(
        cfg.data_path,
        readlines(os.path.join(split_dir, cfg.split, "train_files.txt")),
        cfg.height, cfg.width, cfg.frame_ids, is_train=True, img_ext=ext,
        cfg=cfg)
    val = KITTIRAWDataset(
        cfg.data_path,
        readlines(os.path.join(split_dir, "eigen", "test_files.txt")),
        cfg.height, cfg.width, [0], is_train=False, img_ext=ext, cfg=cfg)
    if cfg.refine_shallow or cfg.refineUnet or cfg.refine_deep:
        # sparse-3D refinement family (reference options.py:259-267 declares
        # the selectors; the nets live in models/refine_net3d.py)
        from fusiondepth_tpu.training.refiner3d import Refiner3D

        Refiner3D(cfg, train, val).train()
    else:
        Refiner(cfg, train, val).train()


if __name__ == "__main__":
    main()
