"""CLI: beam sparsifier (reference sparsify/sparsify.py equivalent):
downsample 64-beam velodyne scans to K beams (or a random point subset) and
write {nbeams}beam/*.bin next to the data. Vectorized numpy; one process.

Usage: python sparsify.py --split_file splits/eigen_zhou/train_files.txt \
           --data_path kitti_data --nbeams 4
"""

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--split_file", required=True)
    p.add_argument("--data_path", default="kitti_data")
    p.add_argument("--output_path", default=None,
                   help="defaults to data_path")
    p.add_argument("--nbeams", type=int, default=4)
    p.add_argument("--H", type=int, default=64)
    p.add_argument("--W", type=int, default=1024)
    p.add_argument("--line_spec", type=int, nargs="*", default=None)
    p.add_argument("--slice", type=int, default=1)
    p.add_argument("--random_sample", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from fusiondepth_tpu.data.kitti_io import load_velodyne_points, readlines
    from fusiondepth_tpu.data.sparsify import sparsify_beams

    out_root = args.output_path or args.data_path
    rng = np.random.default_rng(args.seed)
    lines = readlines(args.split_file)
    n = 0
    for line in lines:
        parts = line.split()
        folder, idx = parts[0], int(parts[1])
        velo = os.path.join(args.data_path, folder,
                            "velodyne_points/data", f"{idx:010d}.bin")
        if not os.path.exists(velo):
            continue
        pts = load_velodyne_points(velo)
        sparse = sparsify_beams(
            pts, nbeams=args.nbeams, H=args.H, W=args.W,
            line_spec=args.line_spec, slice_step=args.slice,
            random_sample=args.random_sample, rng=rng)
        if args.random_sample == 0:
            sub = f"{args.nbeams}beam"
        else:
            sub = f"random{args.random_sample}"
        out_dir = os.path.join(out_root, folder, sub)
        os.makedirs(out_dir, exist_ok=True)
        sparse.astype(np.float32).tofile(
            os.path.join(out_dir, f"{idx:010d}.bin"))
        n += 1
    print(f"sparsify: wrote {n} scans")


if __name__ == "__main__":
    main()
