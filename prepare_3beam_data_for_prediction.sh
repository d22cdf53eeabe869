#!/usr/bin/env bash
# One-command offline prep, mirroring reference prepare_3beam_data_for_prediction.sh:1-10:
# sparsify the 64-beam scans for every training/eval split, bake the
# GT + beam depth npz, and generate the 2-channel encodings.
# DATA_PATH overrides the KITTI root (default kitti_data).
set -e
cd "$(dirname "$0")"
DATA="${DATA_PATH:-kitti_data}"

python sparsify.py --W 1024 --H 64 --line_spec 7 9 11 --nbeams 3 --data_path "$DATA" --split_file splits/eigen_zhou/train_files.txt
python sparsify.py --W 1024 --H 64 --line_spec 7 9 11 --nbeams 3 --data_path "$DATA" --split_file splits/eigen_zhou/val_files.txt
python sparsify.py --W 1024 --H 64 --line_spec 7 9 11 --nbeams 3 --data_path "$DATA" --split_file splits/eigen_full/train_files.txt
python sparsify.py --W 1024 --H 64 --line_spec 7 9 11 --nbeams 3 --data_path "$DATA" --split_file splits/eigen_full/val_files.txt
python sparsify.py --W 1024 --H 64 --line_spec 7 9 11 --nbeams 3 --data_path "$DATA" --split_file splits/eigen/test_files.txt

python export_gt_depth.py --split eigen --data_path "$DATA"
python export_gt_depth.py --split eigen --export_4beam --nbeams 3 --data_path "$DATA"

python gen2channel.py --nbeams 3 --data_path "$DATA" --split_file splits/eigen_zhou/train_files.txt
python gen2channel.py --nbeams 3 --data_path "$DATA" --split_file splits/eigen_zhou/val_files.txt
python gen2channel.py --nbeams 3 --data_path "$DATA" --split_file splits/eigen_full/train_files.txt
python gen2channel.py --nbeams 3 --data_path "$DATA" --split_file splits/eigen_full/val_files.txt
python gen2channel.py --nbeams 3 --data_path "$DATA" --split_file splits/eigen/test_files.txt
