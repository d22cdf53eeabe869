"""Depth-completion trainer (reference completor.py:28-888): the stage-1
skeleton at full 352x1216 resolution over the KITTI completion layout, with
a completion_num_layers / completion_pose_num_layers encoder split, SI (or
L1) supervision against the sparse velodyne_raw input (again with the
hard-coded depth*26 metric factor, completor.py:701), and best-checkpoint
tracking by completion RMSE in millimeters.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.models.fusion import FusionNets
from fusiondepth_tpu.training import checkpoint as ckpt
from fusiondepth_tpu.training.photometric import (
    build_color_pyramid,
    compute_losses,
    generate_images_pred,
)
from fusiondepth_tpu.training.train_state import (
    TrainState,
    combine_variables,
    create_train_state,
)
from fusiondepth_tpu.utils.logging import MetricLogger, sec_to_hm_str


def make_completion_optimizer(cfg: Config, steps_per_epoch: int
                              ) -> optax.GradientTransformation:
    """Adam at the RAW learning rate with StepLR(completion_scheduler_step_size,
    gamma=0.1) — the completor does NOT apply the stage-1 trainer's
    batch-size lr rescaling (reference completor.py:121-123)."""
    boundary = max(cfg.completion_scheduler_step_size, 1) * max(
        steps_per_epoch, 1)
    schedule = optax.piecewise_constant_schedule(
        cfg.learning_rate, {boundary * (i + 1): 0.1 for i in range(3)})
    return optax.adam(schedule, eps=1e-8)


def completion_metrics(gt_m: np.ndarray, pred_m: np.ndarray,
                       eigen_crop: bool = False) -> Dict[str, float]:
    """rmse/mae/irmse/imae in mm / 1-per-km (reference
    evaluate_completion.py:31-48). Inputs in meters, valid where gt > 0.
    `eigen_crop` restricts to the completor's garg/eigen window
    [153:371, 44:1197] (reference completor.py:744-747)."""
    mask = gt_m > 0
    if eigen_crop:
        crop = np.zeros_like(mask)
        crop[153:371, 44:1197] = True
        mask &= crop
    gt = gt_m[mask]
    pred = np.clip(pred_m[mask], 1e-3, None)
    err_mm = (gt - pred) * 1000.0
    ierr_km = 1.0 / gt / 1e-3 - 1.0 / pred / 1e-3  # 1/km
    return {
        "rmse": float(np.sqrt((err_mm**2).mean())),
        "mae": float(np.abs(err_mm).mean()),
        "irmse": float(np.sqrt((ierr_km**2).mean())),
        "imae": float(np.abs(ierr_km).mean()),
    }


def make_completion_loss_fn(cfg: Config, nets: FusionNets):
    """Photometric objective + completion SI/L1 supervision vs velodyne_raw."""

    fwd = lambda variables, batch: nets.forward(variables, batch, train=True)
    if cfg.remat:
        fwd = jax.checkpoint(fwd)

    def loss_fn(params, batch_stats, batch, rng):
        variables = combine_variables(params, batch_stats)
        batch = dict(batch)
        batch["color_pyramid"] = build_color_pyramid(cfg, batch["color"][:, 0])
        outputs, updates = fwd(variables, batch)
        outputs = generate_images_pred(cfg, batch, outputs,
                                       list(cfg.frame_ids))
        # base photometric losses with the trainer's SI term disabled —
        # completion has its own supervision flags
        base_cfg = cfg.replace(trainer_siloss=False)
        losses = compute_losses(base_cfg, batch, outputs, rng)
        total = losses["loss"] * cfg.num_scales  # undo the mean to re-add

        from fusiondepth_tpu.ops.depth import disp_to_depth
        from fusiondepth_tpu.ops.losses import si_loss
        from fusiondepth_tpu.ops.resize import resize_bilinear

        for scale in cfg.scales:
            if not (cfg.completion_siloss_all_scale or scale == 0):
                continue
            disp = resize_bilinear(outputs[("disp", scale)], cfg.height,
                                   cfg.width)
            _, depth = disp_to_depth(disp, cfg.min_depth, cfg.max_depth)
            beam_depth = batch["four_beam"] * 100.0
            depth = depth * 26.0  # reference completor.py:701
            if cfg.completion_siloss:
                # the reference's live SI term hard-codes *0.1 — equal to
                # completion_siloss_weight's default (completor.py:711,
                # options.py:339-341; its in-loop `weight *= 2.0` mutation
                # at :693 feeds only commented-out code)
                si = si_loss(depth, beam_depth,
                             threshold=cfg.gdc_loss_threshold,
                             si_var=cfg.si_var,
                             scale=cfg.completion_siloss_weight)
                total = total + si
                losses[f"loss/si_loss{scale}"] = si
            elif cfg.completion_l1loss:
                valid = ((beam_depth > 1) & (depth < 80) & (depth > 1))
                w = valid.astype(jnp.float32)
                l1 = (jnp.abs(depth - beam_depth) * w).sum() / jnp.maximum(
                    w.sum(), 1.0) * 0.001
                total = total + l1
                losses[f"loss/l1_loss{scale}"] = l1

        total = total / cfg.num_scales
        losses["loss"] = total
        new_stats = {
            k: (updates[k]["batch_stats"] if k in updates
                else batch_stats.get(k, {}))
            for k in batch_stats
        }
        return total, (losses, new_stats)

    return loss_fn


class Completor:
    def __init__(self, cfg: Config, train_dataset=None, val_dataset=None):
        # reference forces full-res completion shapes (completor.py:31-34)
        if not cfg.completion_not_full_res:
            cfg = cfg.replace(height=352, width=1216)
        else:
            cfg = cfg.replace(height=192, width=640)
        cfg = cfg.replace(num_layers=cfg.completion_num_layers,
                          num_epochs=cfg.completion_num_epochs)
        self.cfg = cfg
        self.nets = FusionNets(cfg, pose_depth=cfg.completion_pose_num_layers)
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset

        steps = (max(len(train_dataset) // cfg.batch_size, 1)
                 if train_dataset is not None else 1000)
        self.tx = make_completion_optimizer(cfg, steps)
        self.state = create_train_state(
            cfg, self.nets, jax.random.PRNGKey(cfg.seed), self.tx)

        loss_fn = make_completion_loss_fn(cfg, self.nets)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def train_step(state: TrainState, batch, rng):
            (_, (losses, new_stats)), grads = grad_fn(
                state.params, state.batch_stats, batch, rng)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, new_stats, opt_state,
                              state.step + 1), losses

        self.train_step = jax.jit(train_step, donate_argnums=0)
        self._infer = jax.jit(lambda v, b: self.nets.forward_depth(
            v, b, train=False)[0][("disp", 0)])

        self.log_path = os.path.join(cfg.log_dir,
                                     cfg.model_name + "_completion")
        self.loggers = {m: MetricLogger(self.log_path, m)
                        for m in ("train", "val")}
        self.best_rmse = float("inf")
        self.rng = jax.random.PRNGKey(cfg.seed + 1)
        self.step = 0
        self._t0 = time.time()

    def run_step(self, batch) -> Dict[str, float]:
        from fusiondepth_tpu.training.trainer import device_batch

        self.rng, key = jax.random.split(self.rng)
        self.state, losses = self.train_step(self.state,
                                             device_batch(batch), key)
        self.step += 1
        return losses

    def train(self) -> None:
        from fusiondepth_tpu.data.loader import DataLoader

        for epoch in range(self.cfg.num_epochs):
            loader = DataLoader(self.train_dataset, self.cfg.batch_size,
                                shuffle=True, drop_last=True)
            for batch in loader:
                losses = self.run_step(batch)
                if self.step % self.cfg.log_frequency == 0:
                    loss = float(losses["loss"])
                    print(f"completion epoch {epoch} step {self.step} "
                          f"loss {loss:.4f} "
                          f"({sec_to_hm_str(time.time() - self._t0)})",
                          flush=True)
                    self.loggers["train"].log_scalars(self.step,
                                                      {"loss": loss})
            self.validate(epoch)

    def predict_depth(self, batch) -> np.ndarray:
        """Completion-scaled metric depth for a batch (median-scaled to the
        sparse input like the reference eval, evaluate_completion.py)."""
        from fusiondepth_tpu.ops.depth import disp_to_depth
        from fusiondepth_tpu.training.trainer import device_batch

        variables = combine_variables(self.state.params,
                                      self.state.batch_stats)
        disp = np.asarray(self._infer(variables, device_batch(batch)))
        _, depth = disp_to_depth(disp, self.cfg.min_depth, self.cfg.max_depth)
        depth = np.asarray(depth)[..., 0]
        sparse = np.asarray(batch["four_beam"])[..., 0] * 100.0
        out = []
        for i in range(depth.shape[0]):
            m = sparse[i] > 0
            d = depth[i]
            if m.sum() > 0:
                d = d * (np.median(sparse[i][m]) / np.median(d[m]))
            out.append(d)
        return np.stack(out)

    def validate(self, epoch: int = 0) -> Optional[Dict[str, float]]:
        if self.val_dataset is None:
            return None
        from fusiondepth_tpu.data.loader import DataLoader

        loader = DataLoader(self.val_dataset, self.cfg.eval_batch_size)
        rows = []
        for batch in loader:
            depth = self.predict_depth(batch)
            for i, gt in enumerate(batch.get("depth_gt", [])):
                rows.append(completion_metrics(
                    np.asarray(gt), depth[i],
                    eigen_crop=self.cfg.completion_eigen_crop))
        if not rows:
            return None
        metrics = {k: float(np.mean([r[k] for r in rows]))
                   for k in rows[0]}
        self.loggers["val"].log_scalars(self.step, metrics)
        print("completion val | " + " | ".join(
            f"{k} {v:.2f}" for k, v in metrics.items()), flush=True)
        if metrics["rmse"] < self.best_rmse:
            self.best_rmse = metrics["rmse"]
            ckpt.save_checkpoint(self.cfg, self.state, "best_completion")
        return metrics
