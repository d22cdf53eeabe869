"""Refiner training driver (reference refiner.py:25-264 orchestration):
loads frozen stage-1 weights, trains only the refine2d decoder with the
GDC-clone objective, validates on the eigen test split with best-AbsRel
checkpointing.
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
from fusiondepth_tpu.training import checkpoint as ckpt
from fusiondepth_tpu.training.evaluation import evaluate_disparities
from fusiondepth_tpu.training.refiner import RefinerNets, make_refine_loss_fn
from fusiondepth_tpu.training.train_state import (
    combine_variables,
    create_train_state,
    make_optimizer,
)
from fusiondepth_tpu.utils.logging import MetricLogger, sec_to_hm_str


class Refiner:
    def __init__(self, cfg: Config, train_dataset=None, val_dataset=None):
        # the reference forces these on (refiner.py:29-30)
        cfg = cfg.replace(clone_gdc=True, refine_2d=True)
        self.cfg = cfg
        self.nets = RefinerNets(cfg)
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset

        # frozen stage-1 weights
        tx1 = make_optimizer(cfg, 1)
        s1_state = create_train_state(
            cfg, self.nets.stage1, jax.random.PRNGKey(cfg.seed), tx1)
        if cfg.refine_load_weights_folder and os.path.isdir(
                cfg.refine_load_weights_folder):
            s1_state, _ = ckpt.load_checkpoint(
                cfg.refine_load_weights_folder, s1_state)
        self.frozen_variables = combine_variables(
            s1_state.params, s1_state.batch_stats)

        # trainable refine decoder
        self.refine_params = self.nets.init_refine(
            jax.random.PRNGKey(cfg.seed + 2))
        lr = cfg.learning_rate * (cfg.batch_size / 8.0)
        self.tx = optax.adam(lr)

        loss_fn = make_refine_loss_fn(cfg, self.nets)

        if cfg.train_entire_net:
            # --train_entire_net ablation: the stage-1 nets' parameters join
            # the optimizer while their BatchNorm stays in eval mode with
            # frozen running stats (reference refiner.py:89-143 adds every
            # stage-1 net to parameters_to_train but keeps .eval()).
            self._s1_stats = {
                k: v.get("batch_stats", {})
                for k, v in self.frozen_variables.items()}

            def entire_loss(trainable, batch, rng):
                frozen = {}
                for k, p in trainable["stage1"].items():
                    v = {"params": p}
                    if self._s1_stats[k]:
                        v["batch_stats"] = self._s1_stats[k]
                    frozen[k] = v
                return loss_fn(trainable["refine"], frozen, batch, rng)

            grad_fn = jax.value_and_grad(entire_loss, has_aux=True)
            trainable0 = {
                "refine": self.refine_params,
                "stage1": {k: v["params"]
                           for k, v in self.frozen_variables.items()},
            }
            self.opt_state = self.tx.init(trainable0)

            def train_step(refine_params, s1_params, opt_state, batch, rng):
                trainable = {"refine": refine_params, "stage1": s1_params}
                (loss, losses), grads = grad_fn(trainable, batch, rng)
                updates, opt_state = self.tx.update(grads, opt_state,
                                                    trainable)
                trainable = optax.apply_updates(trainable, updates)
                return (trainable["refine"], trainable["stage1"], opt_state,
                        losses)

            self.train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))
        else:
            self.opt_state = self.tx.init(self.refine_params)
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

            def train_step(refine_params, opt_state, frozen, batch, rng):
                (loss, losses), grads = grad_fn(refine_params, frozen, batch,
                                                rng)
                updates, opt_state = self.tx.update(grads, opt_state,
                                                    refine_params)
                refine_params = optax.apply_updates(refine_params, updates)
                return refine_params, opt_state, losses

            self.train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._build_infer()

        self.log_path = os.path.join(cfg.log_dir, cfg.model_name + "_refine")
        self.loggers = {m: MetricLogger(self.log_path, m)
                        for m in ("train", "val")}
        self.best_absrel = float("inf")
        self.rng = jax.random.PRNGKey(cfg.seed + 3)
        self.step = 0
        self._t0 = time.time()

    def _build_infer(self):
        cfg, nets = self.cfg, self.nets

        def infer(refine_params, frozen, batch):
            s1 = nets.stage1
            feats = s1.encoder.apply(frozen["encoder"],
                                     batch["color_aug"][:, 0], train=False)
            beam_feats = s1.beam_encoder.apply(
                frozen["beam_encoder"], batch["two_channel"][:, 0],
                train=False)
            if cfg.refine_depthnet_with_beam:
                outputs = s1.depth.apply(frozen["depth"], feats,
                                         beam_features=beam_feats)
            else:
                outputs = s1.depth.apply(frozen["depth"], feats)
            depth_maps = nets.build_pseudo3d(batch, outputs)
            refined = nets.refine2d.apply(refine_params, feats,
                                          beam_features=beam_feats,
                                          depth_maps=depth_maps)
            return refined[("disp", 0)]

        self.infer = jax.jit(infer)

    def run_step(self, batch) -> Dict[str, float]:
        from fusiondepth_tpu.training.trainer import device_batch

        db = device_batch(batch)
        self.rng, key = jax.random.split(self.rng)
        if self.cfg.train_entire_net:
            s1_params = {k: v["params"]
                         for k, v in self.frozen_variables.items()}
            (self.refine_params, s1_params, self.opt_state,
             losses) = self.train_step(self.refine_params, s1_params,
                                       self.opt_state, db, key)
            self.frozen_variables = {
                k: ({"params": p, "batch_stats": self._s1_stats[k]}
                    if self._s1_stats[k] else {"params": p})
                for k, p in s1_params.items()}
        else:
            self.refine_params, self.opt_state, losses = self.train_step(
                self.refine_params, self.opt_state, self.frozen_variables,
                db, key)
        self.step += 1
        return losses

    def run_epoch(self, epoch: int = 0) -> None:
        from fusiondepth_tpu.data.loader import DataLoader

        loader = DataLoader(self.train_dataset, self.cfg.batch_size,
                            shuffle=True, drop_last=True)
        for batch in loader:
            losses = self.run_step(batch)
            if self.step % self.cfg.log_frequency == 0:
                loss = float(losses["loss"])
                print(f"refine epoch {epoch} step {self.step} "
                      f"loss {loss:.4f} "
                      f"({sec_to_hm_str(time.time() - self._t0)})",
                      flush=True)
                self.loggers["train"].log_scalars(self.step, {"loss": loss})

    def train(self) -> None:
        for epoch in range(self.cfg.num_epochs):
            self.run_epoch(epoch)
            self.validate()

    def validate(self) -> Optional[Dict[str, float]]:
        if self.val_dataset is None:
            return None
        from fusiondepth_tpu.data.loader import DataLoader
        from fusiondepth_tpu.training.trainer import device_batch

        loader = DataLoader(self.val_dataset, self.cfg.eval_batch_size)
        disps, gts = [], []
        for batch in loader:
            disp = self.infer(self.refine_params, self.frozen_variables,
                              device_batch(batch))
            disps.extend(np.asarray(disp)[..., 0])
            gts.extend(batch.get("depth_gt", []))
        if not gts:
            return None
        metrics = evaluate_disparities(disps, gts)
        self.loggers["val"].log_scalars(self.step, metrics)
        print("refine val | " + " | ".join(
            f"{k} {v:.4f}" for k, v in metrics.items()), flush=True)
        if metrics["abs_rel"] < self.best_absrel:
            self.best_absrel = metrics["abs_rel"]
            self.save("best_refine")
        return metrics

    # ---- checkpointing (refine decoder only; stage-1 weights live in
    # their own stage-1 checkpoint) ----

    def save(self, tag: str) -> str:
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(
            self.cfg.log_dir, self.cfg.model_name + "_refine", "models",
            f"weights_{tag}"))
        bundle = {"refine_params": self.refine_params,
                  "opt_state": self.opt_state}
        if self.cfg.train_entire_net:
            # the fine-tuned stage-1 weights are part of the result
            bundle["stage1_variables"] = self.frozen_variables
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, bundle, force=True)
        ckptr.wait_until_finished()
        return path

    def load(self, path: str) -> None:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        tmpl = {"refine_params": self.refine_params,
                "opt_state": self.opt_state}
        if self.cfg.train_entire_net:
            tmpl["stage1_variables"] = self.frozen_variables
        restored = ckptr.restore(os.path.abspath(path), tmpl)
        self.refine_params = restored["refine_params"]
        self.opt_state = restored["opt_state"]
        if self.cfg.train_entire_net:
            self.frozen_variables = restored["stage1_variables"]
