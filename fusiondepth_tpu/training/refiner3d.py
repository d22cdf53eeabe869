"""Sparse-3D refinement path: --refine_shallow / --refineUnet / --refine_deep.

The reference declares these selectors (reference options.py:259-267) for the
MinkowskiEngine RefineNet family (reference networks/refine_net.py:13-270)
but never imports the nets from any entry point — the shipped refiner forces
refine_2d=True instead (reference refiner.py:30). Here the TPU-native voxel
nets (models/refine_net3d.py) are actually reachable: Refiner3D freezes the
stage-1 nets exactly like the 2-D refiner and trains a sparse voxel net to
emit a tanh disparity offset, distilling the cached GDC correction
(clone_gdc SI objective, reference refiner.py:678-688).

Per sample: stage-1 disparity -> depth -> voxelize (fixed capacity) ->
sparse conv stack -> per-pixel offset gathered back to the image ->
refined disparity. The whole step (stage-1 forward + voxelization + net +
loss + Adam) is one jitted computation; the batch dimension is vmapped.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.models.fusion import FusionNets
from fusiondepth_tpu.models.refine_net3d import (
    RefineNet3DDeep,
    RefineNet3DShallow,
    RefineNet3DUNet,
    _kernel_offsets,
    build_voxel_pyramid,
    depth_to_voxels,
    neighbor_table,
)
from fusiondepth_tpu.ops.depth import disp_to_depth
from fusiondepth_tpu.training import checkpoint as ckpt
from fusiondepth_tpu.training.refiner import refiner_si_loss
from fusiondepth_tpu.training.train_state import (
    combine_variables,
    create_train_state,
    make_optimizer,
)

# tanh offset (in [-1,1]) -> disparity delta; the sigmoid-disparity domain
# is [0,1] so 0.1 bounds the correction at 10% of the range
OFFSET_SCALE = 0.1


def select_refine_net3d(cfg: Config):
    """Map the reference's selector flags to a voxel net, or None."""
    chosen = [f for f in ("refine_shallow", "refineUnet", "refine_deep")
              if getattr(cfg, f)]
    assert len(chosen) <= 1, f"at most one 3D refine selector, got {chosen}"
    if not chosen:
        return None
    return {
        "refine_shallow": RefineNet3DShallow(),
        "refine_deep": RefineNet3DDeep(),
        "refineUnet": RefineNet3DUNet(widths=(16, 32, 64, 64)),
    }[chosen[0]]


class Refiner3D:
    def __init__(self, cfg: Config, train_dataset=None, val_dataset=None,
                 voxel_size: float = 0.5, capacity: int = 16384):
        self.net = select_refine_net3d(cfg)
        assert self.net is not None, (
            "set one of --refine_shallow/--refineUnet/--refine_deep")
        self.cfg = cfg
        self.voxel_size = voxel_size
        self.capacity = capacity
        self.is_unet = isinstance(self.net, RefineNet3DUNet)
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset

        # frozen stage-1 (same bundle + loading as the 2-D refiner)
        self.stage1 = FusionNets(cfg)
        tx1 = make_optimizer(cfg, 1)
        s1_state = create_train_state(
            cfg, self.stage1, jax.random.PRNGKey(cfg.seed), tx1)
        if cfg.refine_load_weights_folder and os.path.isdir(
                cfg.refine_load_weights_folder):
            s1_state, _ = ckpt.load_checkpoint(
                cfg.refine_load_weights_folder, s1_state)
        self.frozen_variables = combine_variables(
            s1_state.params, s1_state.batch_stats)

        # net init from a representative voxel scene
        dummy_depth = jnp.full((cfg.height, cfg.width), 10.0)
        dummy_invK = jnp.eye(4)
        coords, feats, valid, p2v, keys = depth_to_voxels(
            dummy_depth, dummy_invK, voxel_size, capacity)
        if self.is_unet:
            levels = len(self.net.widths) - 1
            tables, c2p = build_voxel_pyramid(coords, keys, valid, levels,
                                              capacity)
            self.net_variables = self.net.init(
                jax.random.PRNGKey(cfg.seed + 4), feats, tables, c2p)
        else:
            nb = neighbor_table(coords, keys, valid, _kernel_offsets(3))
            self.net_variables = self.net.init(
                jax.random.PRNGKey(cfg.seed + 4), feats, nb, valid)

        lr = cfg.learning_rate * (cfg.batch_size / 8.0)
        self.tx = optax.adam(lr)
        self.opt_state = self.tx.init(self.net_variables)

        self._build_steps()
        self.rng = jax.random.PRNGKey(cfg.seed + 5)
        self.step = 0

    # ---- jitted paths ----

    def _refine_sample(self, net_variables, depth_hw, disp_hw, inv_K):
        """One sample: voxelize -> sparse net -> per-pixel offset ->
        refined disparity (the dense gather of reference
        refine_net.py:96-111)."""
        coords, feats, valid, p2v, keys = depth_to_voxels(
            depth_hw, inv_K, self.voxel_size, self.capacity)
        if self.is_unet:
            levels = len(self.net.widths) - 1
            tables, c2p = build_voxel_pyramid(coords, keys, valid, levels,
                                              self.capacity)
            off = self.net.apply(net_variables, feats, tables, c2p)
        else:
            nb = neighbor_table(coords, keys, valid, _kernel_offsets(3))
            off = self.net.apply(net_variables, feats, nb, valid)
        off_img = off[:, 0][p2v].reshape(depth_hw.shape)
        return jnp.clip(disp_hw + OFFSET_SCALE * off_img, 1e-4, 1.0)

    def _forward(self, net_variables, frozen, batch):
        cfg = self.cfg
        outputs, _, _ = self.stage1.forward_depth(frozen, batch, train=False)
        disp = outputs[("disp", 0)][..., 0]  # (B, H, W)
        _, depth = disp_to_depth(disp, cfg.min_depth, cfg.max_depth)
        refined_disp = jax.vmap(
            lambda d, s, k: self._refine_sample(net_variables, d, s, k)
        )(depth, disp, batch["inv_K"])
        _, refined_depth = disp_to_depth(refined_disp, cfg.min_depth,
                                         cfg.max_depth)
        return refined_disp, refined_depth

    def _build_steps(self):
        cfg = self.cfg

        def loss_fn(net_variables, frozen, batch):
            from fusiondepth_tpu.ops.pooling import masked_median

            _, refined_depth = self._forward(net_variables, frozen, batch)
            # GDC-clone objective (reference refiner.py:678-688): SI loss
            # against the cached offline-GDC depth. Like the 2-D refiner's
            # pseudo-3D construction (refiner.py:328-333), the prediction is
            # median-ratio scaled to the target first — stage-1 depth is
            # scale-ambiguous and the SI validity window needs overlap.
            target = batch["inf_gdc"][..., 0]
            tmask = target > 0
            ratio = jax.lax.stop_gradient(
                masked_median(target, tmask)
                / jnp.maximum(masked_median(refined_depth, tmask), 1e-6))
            ratio = jnp.where(jnp.isfinite(ratio), ratio, 1.0)
            si = refiner_si_loss(refined_depth * ratio, target,
                                 threshold=cfg.gdc_loss_threshold,
                                 si_var=cfg.si_var)
            return si * cfg.gdc_loss_weight * 4.0

        grad_fn = jax.value_and_grad(loss_fn)

        def train_step(net_variables, opt_state, frozen, batch):
            loss, grads = grad_fn(net_variables, frozen, batch)
            updates, opt_state = self.tx.update(grads, opt_state,
                                                net_variables)
            net_variables = optax.apply_updates(net_variables, updates)
            return net_variables, opt_state, loss

        self.train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self.infer = jax.jit(
            lambda nv, fv, b: self._forward(nv, fv, b)[0])

    # ---- driver ----

    def run_step(self, batch) -> float:
        from fusiondepth_tpu.training.trainer import device_batch

        self.net_variables, self.opt_state, loss = self.train_step(
            self.net_variables, self.opt_state, self.frozen_variables,
            device_batch(batch))
        self.step += 1
        return float(loss)

    def train(self) -> None:
        from fusiondepth_tpu.data.loader import DataLoader

        for epoch in range(self.cfg.num_epochs):
            loader = DataLoader(self.train_dataset, self.cfg.batch_size,
                                shuffle=True, drop_last=True,
                                num_workers=self.cfg.num_workers)
            for batch in loader:
                loss = self.run_step(batch)
                if self.step % self.cfg.log_frequency == 0:
                    print(f"refine3d epoch {epoch} step {self.step} "
                          f"loss {loss:.4f}", flush=True)
