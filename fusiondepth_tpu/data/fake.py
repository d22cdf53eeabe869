"""In-memory fake KITTI dataset: exercises the full MonoDataset contract
(aug, flip, intrinsics, 4beam/2channel loading) without KITTI on disk.

Used by trainer/e2e tests — the equivalent of faking the dict-of-keys
contract of reference datasets/mono_dataset.py:109-132.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

from fusiondepth_tpu.data.kitti_dataset import NORMALIZED_K
from fusiondepth_tpu.data.mono_dataset import MonoDataset
from fusiondepth_tpu.data.two_channel import expand_two_channel


class FakeKITTIDataset(MonoDataset):
    K = NORMALIZED_K
    full_res_shape = (128, 48)

    def __init__(self, n_frames: int = 8, **kwargs):
        self._rng = np.random.default_rng(123)
        self.n_frames = n_frames
        filenames = [f"2011_09_26/seq {i + 2} l" for i in range(n_frames)]
        super().__init__("/nonexistent", filenames, **kwargs)
        # deterministic per-frame imagery at native res
        W, H = self.full_res_shape
        self._images = self._rng.uniform(
            0, 1, size=(n_frames + 4, H, W, 3)).astype(np.float32)
        self._beams = np.zeros((n_frames + 4, self.height, self.width),
                               np.float32)
        rows = np.linspace(int(self.height * 0.5),
                           int(self.height * 0.95), 4).astype(int)
        for f in range(n_frames + 4):
            for r in rows:
                hits = self._rng.uniform(size=self.width) < 0.3
                self._beams[f, r, hits] = self._rng.uniform(
                    500, 6000, hits.sum())  # meters*100 scale pre-division

    def check_depth(self) -> bool:
        return True

    def get_color(self, folder, frame_index, side, do_flip):
        img = self._images[frame_index % len(self._images)]
        pil = Image.fromarray((img * 255).astype(np.uint8))
        if do_flip:
            pil = pil.transpose(Image.FLIP_LEFT_RIGHT)
        return pil

    def get_depth(self, folder, frame_index, side, do_flip):
        H, W = 48, 128
        d = np.fromfunction(
            lambda i, j: 5.0 + 0.1 * i + 0.02 * j, (H, W), dtype=np.float32)
        if do_flip:
            d = np.fliplr(d)
        return d

    def get_4beam(self, folder, frame_index, side, do_flip):
        b = self._beams[frame_index % len(self._beams)]
        if do_flip:
            b = np.fliplr(b)
        return b

    def load_4beam_2channel(self, folder, frame_index, side, do_flip):
        fb = self.get_4beam(folder, frame_index, side, do_flip) / 100.0
        return expand_two_channel(
            fb, row_range=(0, self.height), col_range=(0, self.width))

    def load_gdc(self, folder, frame_index, side, do_flip):
        d = np.full((self.height, self.width), 10.0, np.float32)
        return d[..., None]
