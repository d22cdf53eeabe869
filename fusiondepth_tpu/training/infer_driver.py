"""Offline depth-map inference (reference inf_depth_map.py:23-182): run the
frozen stage-1 model over the train and test splits (unshuffled) and cache
raw scale-0 disparities as inf_depth_{n}beam/{idx}_{side}.npy next to the
data, for GDC correction and refiner distillation.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.models.fusion import FusionNets
from fusiondepth_tpu.training import checkpoint as ckpt
from fusiondepth_tpu.training.train_state import (
    combine_variables,
    create_train_state,
    make_optimizer,
)


class Infer:
    def __init__(self, cfg: Config, datasets=None):
        self.cfg = cfg
        self.nets = FusionNets(cfg)
        tx = make_optimizer(cfg, 1)
        state = create_train_state(cfg, self.nets, jax.random.PRNGKey(0), tx)
        if cfg.load_weights_folder and os.path.isdir(cfg.load_weights_folder):
            state, _ = ckpt.load_checkpoint(cfg.load_weights_folder, state)
        self.variables = combine_variables(state.params, state.batch_stats)
        self._infer = jax.jit(lambda v, b: self.nets.forward_depth(
            v, b, train=False)[0][("disp", 0)])
        self.datasets = datasets

    def out_folder(self) -> str:
        if self.cfg.random_sample > 0:
            return f"inf_depth_r{self.cfg.random_sample}"
        return f"inf_depth_{self.cfg.nbeams}beam"

    def run_split(self, dataset, data_path: str) -> int:
        """Save one npy per frame; returns the number written."""
        from fusiondepth_tpu.data.loader import DataLoader
        from fusiondepth_tpu.training.trainer import device_batch

        loader = DataLoader(dataset, self.cfg.eval_batch_size, shuffle=False)
        n = 0
        it = iter(loader)
        for bi, batch in enumerate(it):
            disp = np.asarray(self._infer(self.variables,
                                          device_batch(batch)))
            bs = disp.shape[0]
            for j in range(bs):
                index = bi * self.cfg.eval_batch_size + j
                folder, frame_index, side = dataset.parse_line(index)
                out_dir = os.path.join(data_path, folder, self.out_folder())
                os.makedirs(out_dir, exist_ok=True)
                # stored as (1, 1, H, W) float32 to match the reference's
                # tensor dump layout (inf_depth_map.py:146-153)
                arr = disp[j, :, :, 0][None, None].astype(np.float32)
                np.save(os.path.join(
                    out_dir, f"{int(frame_index)}_{side}.npy"), arr)
                n += 1
        return n

    def run(self) -> None:
        assert self.datasets is not None, "construct with datasets or call " \
            "run_split directly"
        for ds in self.datasets:
            self.run_split(ds, self.cfg.data_path)
