"""Stage-1 self-supervised trainer driver.

Orchestrates the jitted train step over the host input pipeline, with the
reference's schedule semantics (trainer.py:24-266):
  num_epochs   = (8 * 17) // batch_size
  lr           = learning_rate * batch_size / 8
  StepLR step  = scheduler_step_size * 8 / batch_size (gamma 0.1)
and the reference's val protocol: periodic full-eval on the eigen test
split, best-AbsRel checkpointing (trainer.py:390-423).

TPU-first: the whole optimization step (forward + warp + losses + grads +
Adam) is one XLA computation; gradient accumulation is lax.scan
microbatching (config.grad_accum_steps); multi-chip data parallelism comes
from sharding the batch over the mesh.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.models.fusion import FusionNets
from fusiondepth_tpu.parallel import (
    global_batch,
    local_batch_size,
    make_mesh,
    replicated_sharding,
    shard_batch,
    shard_lines,
)
from fusiondepth_tpu.training import checkpoint as ckpt
from fusiondepth_tpu.training.evaluation import evaluate_disparities
from fusiondepth_tpu.training.train_state import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from fusiondepth_tpu.utils.logging import MetricLogger, sec_to_hm_str

_BATCH_KEYS = ("color", "color_aug", "two_channel", "four_beam", "K",
               "inv_K", "stereo_T", "inf_gdc")


def device_batch(batch: Dict[str, object]) -> Dict[str, jnp.ndarray]:
    return {k: jnp.asarray(batch[k]) for k in _BATCH_KEYS if k in batch}


class Trainer:
    def __init__(self, cfg: Config, train_dataset=None, val_dataset=None,
                 use_mesh: Optional[bool] = None):
        cfg = cfg.replace(num_epochs=max((8 * 17) // cfg.batch_size, 1))
        if cfg.use_stereo and "s" not in cfg.frame_ids:
            # stereo adds the opposite-side frame (reference trainer.py:63-64)
            cfg = cfg.replace(frame_ids=tuple(cfg.frame_ids) + ("s",))
        self.cfg = cfg
        assert cfg.height % 32 == 0 and cfg.width % 32 == 0, \
            "height/width must be multiples of 32"

        self.nets = FusionNets(cfg)
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset

        if train_dataset is None and cfg.dataset in ("kitti", "kitti_odom"):
            self._build_kitti_datasets()

        steps_per_epoch = (
            max(len(self.train_dataset) // cfg.batch_size, 1)
            if self.train_dataset is not None else 1000)
        self.tx = make_optimizer(cfg, steps_per_epoch)
        self.state = create_train_state(
            cfg, self.nets, jax.random.PRNGKey(cfg.seed), self.tx)

        # data parallelism: honor cfg.use_mesh / cfg.mesh_shape from the CLI
        # (the ctor arg overrides for tests); params replicated, batches
        # sharded on the leading axis, GSPMD inserts the gradient psum.
        if use_mesh is None:
            use_mesh = cfg.use_mesh
        # multi-host: each process drives its local chips; the mesh spans
        # every process's devices, batches assemble per-host (multihost.py)
        self.process_count = jax.process_count()
        self.is_lead_host = jax.process_index() == 0
        self.mesh = (make_mesh(cfg.mesh_shape)
                     if use_mesh or self.process_count > 1 else None)
        if self.mesh is not None:
            n_data = self.mesh.shape["data"]
            assert cfg.batch_size % n_data == 0, (
                f"batch_size {cfg.batch_size} not divisible by the mesh's "
                f"data axis ({n_data} devices)")
            self.state = jax.device_put(
                self.state, replicated_sharding(self.mesh))

        self.train_step = jax.jit(
            make_train_step(cfg, self.nets, self.tx, mesh=self.mesh),
            donate_argnums=0)
        self._infer = jax.jit(
            lambda variables, batch: self.nets.forward_depth(
                variables, batch, train=False)[0][("disp", 0)])

        self.log_path = os.path.join(cfg.log_dir, cfg.model_name)
        self.loggers = {
            mode: MetricLogger(self.log_path, mode)
            for mode in ("train", "val")}
        # offline wandb.alert equivalent (reference trainer.py:43,653)
        self.loggers["train"].add_watch("loss", "nan",
                                        title="non-finite training loss")
        if self.is_lead_host:
            ckpt.save_options(cfg)

        if cfg.train_load_weights_folder:
            # resume restricted to --models_to_load, with the beam encoders
            # appended when they exist (reference trainer.py:725-730)
            to_load = list(cfg.models_to_load)
            if cfg.beam_encoder:
                to_load += ["beam_encoder", "beam_encoder_pose"]
            self.state, _ = ckpt.load_checkpoint(
                cfg.train_load_weights_folder, self.state,
                models_to_load=to_load)

        self.best_absrel = float("inf")
        self.rng = jax.random.PRNGKey(cfg.seed + 1)
        self.step = int(self.state.step)
        self.epoch = 0
        self._t_start = time.time()

    # ---- data ----

    def _build_kitti_datasets(self):
        from fusiondepth_tpu.data.kitti_dataset import (
            KITTIOdomDataset,
            KITTIRAWDataset,
        )
        from fusiondepth_tpu.data.kitti_io import readlines

        cfg = self.cfg
        cls = (KITTIOdomDataset if cfg.dataset == "kitti_odom"
               else KITTIRAWDataset)
        split_dir = os.path.join(os.path.dirname(__file__), "..", "..",
                                 "splits")
        # multi-host: every process reads a disjoint strided slice of the
        # split (parallel/multihost.py); single-process this is identity
        train_files = shard_lines(readlines(
            os.path.join(split_dir, cfg.split, "train_files.txt")))
        test_files = readlines(
            os.path.join(split_dir, "eigen", "test_files.txt"))
        ext = ".png" if cfg.png else ".jpg"
        self.train_dataset = cls(cfg.data_path, train_files, cfg.height,
                                 cfg.width, cfg.frame_ids, is_train=True,
                                 img_ext=ext, cfg=cfg)
        # reference quirk kept on purpose: the val loader IS the eigen test
        # split (trainer.py:161-171)
        self.val_dataset = cls(cfg.data_path, test_files, cfg.height,
                               cfg.width, [0], is_train=False, img_ext=ext,
                               cfg=cfg)

    def _loader(self, dataset, shuffle: bool):
        from fusiondepth_tpu.data.loader import DataLoader

        # cfg.batch_size is the GLOBAL batch; each host loads its share
        bs = local_batch_size(self.cfg.batch_size, self.process_count)
        return DataLoader(dataset, bs, shuffle=shuffle,
                          drop_last=shuffle, num_workers=self.cfg.num_workers)

    # ---- training ----

    def variables(self):
        from fusiondepth_tpu.training.train_state import combine_variables

        return combine_variables(self.state.params, self.state.batch_stats)

    def put_batch(self, batch) -> Dict[str, jnp.ndarray]:
        """Host batch -> device-resident (sharded under a mesh) batch."""
        if self.mesh is not None and self.process_count > 1:
            # per-host local arrays -> globally batch-sharded jax.Arrays
            return global_batch(
                {k: batch[k] for k in _BATCH_KEYS if k in batch}, self.mesh)
        db = device_batch(batch)
        if self.mesh is not None:
            db = shard_batch(db, self.mesh)
        return db

    def run_step(self, batch, on_device: bool = False) -> Dict[str, float]:
        db = batch if on_device else self.put_batch(batch)
        self.rng, key = jax.random.split(self.rng)
        self.state, losses = self.train_step(self.state, db, key)
        self.step += 1
        return losses

    def run_epoch(self) -> None:
        from fusiondepth_tpu.data.prefetch import prefetch_to_device

        cfg = self.cfg
        loader = self._loader(self.train_dataset, shuffle=True)
        t_last, n_last = time.time(), 0
        # device uploads run `size` batches ahead of the compute stream; the
        # loop below only syncs (reads a loss) every log_frequency steps
        for db in prefetch_to_device(loader, self.put_batch, size=2):
            losses = self.run_step(db, on_device=True)
            n_last += cfg.batch_size
            if self.step % cfg.log_frequency == 0:
                loss = float(losses["loss"])  # device sync point
                dt = time.time() - t_last
                eps = n_last / max(dt, 1e-9)
                print(f"epoch {self.epoch:3d} | step {self.step:6d} | "
                      f"loss {loss:.4f} | {eps:7.1f} ex/s | "
                      f"elapsed {sec_to_hm_str(time.time() - self._t_start)}",
                      flush=True)
                self.loggers["train"].log_scalars(
                    self.step, {"loss": loss, "examples_per_sec": eps})
                t_last, n_last = time.time(), 0

    def train(self) -> None:
        for self.epoch in range(self.cfg.num_epochs):
            self.run_epoch()
            metrics = self.validate()
            if metrics and self.cfg.save_frequency > 0 and self.is_lead_host:
                ckpt.save_checkpoint(self.cfg, self.state, f"{self.epoch}")

    # ---- validation (eigen protocol) ----

    def validate(self) -> Optional[Dict[str, float]]:
        if self.val_dataset is None:
            return None
        variables = self.variables()
        loader = self._loader(self.val_dataset, shuffle=False)
        disps, gts = [], []
        sample_logged = False
        for batch in loader:
            db = device_batch(batch)
            disp = self._infer(variables, db)
            disps.extend(np.asarray(disp)[..., 0])
            gts.extend(batch.get("depth_gt", []))
            if (self.cfg.save_sample or self.cfg.visualize) \
                    and not sample_logged:
                d = np.asarray(disp)[0, :, :, 0]
                self.loggers["val"].log_image(
                    self.step, "disp_0", d / max(float(d.max()), 1e-9))
                self.loggers["val"].log_image(
                    self.step, "color_0", np.asarray(batch["color"])[0, 0])
                sample_logged = True
        if not gts:
            return None
        metrics = evaluate_disparities(disps, gts)
        self.loggers["val"].log_scalars(self.step, metrics)
        print("val | " + " | ".join(
            f"{k} {v:.4f}" for k, v in metrics.items()), flush=True)
        if metrics["abs_rel"] < self.best_absrel:
            self.best_absrel = metrics["abs_rel"]
            if self.is_lead_host:
                ckpt.save_checkpoint(self.cfg, self.state, "best")
                ckpt.save_checkpoint(
                    self.cfg, self.state,
                    f"absrel{int(metrics['abs_rel'] * 1e5)}")
        return metrics
