"""CLI: 2-channel LiDAR encoding cache (reference gen2channel.py
equivalent): for each frame (and its horizontal flip), project the sparse
beams and expand to (expanded depth, confidence), saved as
2channel[/{n}beam]/{idx}_{side}_{flip}.npy.

Vectorized: the reference's O(H*W*expand^2) per-pixel Python loop is a
handful of shifted scatter-adds (fusiondepth_tpu/data/two_channel.py).
"""

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--split_file", required=True)
    p.add_argument("--data_path", default="kitti_data")
    p.add_argument("--nbeams", type=int, default=4)
    p.add_argument("--expand", type=int, default=2)
    p.add_argument("--test_only", action="store_true")
    p.add_argument("--regenerate", action="store_true")
    p.add_argument("--random_sample", type=int, default=0,
                   help="encode random-sample bins (random{N}/ -> "
                        "r{N}_2cha/, reference gen2channel.py:18-25)")
    args = p.parse_args()

    from fusiondepth_tpu.data.kitti_io import readlines
    from fusiondepth_tpu.data.two_channel import sparse_beam_to_2channel

    if args.random_sample > 0:
        in_name = f"random{args.random_sample}"
        out_name = f"r{args.random_sample}_2cha"
    else:
        in_name = f"{args.nbeams}beam"
        out_name = ("2channel" if args.nbeams == 4
                    else f"2channel{args.nbeams}beam")
    side_cam = {"l": 2, "r": 3, "2": 2, "3": 3}
    n = 0
    for line in readlines(args.split_file):
        folder, idx, side = line.split()
        idx = int(idx)
        date = folder.split("/")[0]
        calib_dir = os.path.join(args.data_path, date)
        velo = os.path.join(args.data_path, folder,
                            in_name, f"{idx:010d}.bin")
        if not os.path.exists(velo):
            continue
        out_dir = os.path.join(args.data_path, folder, out_name)
        os.makedirs(out_dir, exist_ok=True)
        for flip in (False, True):
            out = os.path.join(out_dir, f"{idx}_{side}_{flip}.npy")
            if os.path.exists(out) and not args.regenerate:
                continue
            two = sparse_beam_to_2channel(
                calib_dir, velo, side_cam[side], flip, expand=args.expand)
            np.save(out, two.astype(np.float32))
            n += 1
    print(f"gen2channel: wrote {n} maps")


if __name__ == "__main__":
    main()
