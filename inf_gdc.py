"""CLI: offline GDC correction cache (reference inf_gdc.py equivalent):
graph-based depth correction of every cached inf_depth frame, accelerated
as one jitted JAX computation per frame instead of a CPU process pool.
"""

from fusiondepth_tpu.config import parse_args


def main():
    cfg = parse_args()
    import os

    from fusiondepth_tpu.data.kitti_io import readlines
    from fusiondepth_tpu.training.gdc_driver import run_inf_gdc

    split_dir = os.path.join(os.path.dirname(__file__), "splits")
    lines = []
    for split_file in (
            os.path.join(split_dir, cfg.split, "train_files.txt"),
            os.path.join(split_dir, "eigen", "test_files.txt")):
        lines.extend(readlines(split_file))
    n = run_inf_gdc(cfg, lines)
    print(f"inf_gdc: wrote {n} frames")


if __name__ == "__main__":
    main()
