"""Train state + the single jitted train step.

Replaces the reference's eager loop (trainer.py:230-266): forward, view
synthesis, losses, backward, and Adam update all trace into ONE XLA
computation. Gradient accumulation is a `lax.scan` over microbatches
(replacing the VRAM-heuristic accumulate_step, trainer.py:30-41).

Data parallelism: call the jitted step with a batch whose leading axis is
sharded over the mesh's 'data' axis and replicated params — GSPMD inserts
the gradient all-reduce over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.models.fusion import FusionNets
from fusiondepth_tpu.training.photometric import (
    build_color_pyramid,
    compute_losses,
    generate_images_pred,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Dict[str, Any]  # {net_name: params pytree}
    batch_stats: Dict[str, Any]  # {net_name: batch_stats pytree}
    opt_state: Any
    step: jnp.ndarray


def split_variables(variables: Dict[str, Any]):
    params = {k: v["params"] for k, v in variables.items()}
    stats = {
        k: v.get("batch_stats", {}) for k, v in variables.items()
    }
    return params, stats


def combine_variables(params: Dict[str, Any], stats: Dict[str, Any]):
    out = {}
    for k in params:
        v = {"params": params[k]}
        if stats.get(k):
            v["batch_stats"] = stats[k]
        out[k] = v
    return out


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam + StepLR(gamma=0.1), with the reference's batch-size rescaling
    (trainer.py:39-40): lr *= batch/8, scheduler_step_size *= 8/batch.
    """
    lr = cfg.learning_rate * (cfg.batch_size / 8.0)
    sched_epochs = int(cfg.scheduler_step_size * (8.0 / cfg.batch_size))
    boundary = max(sched_epochs, 1) * max(steps_per_epoch, 1)
    schedule = optax.piecewise_constant_schedule(
        lr, {boundary * (i + 1): 0.1 for i in range(3)})
    return optax.adam(schedule, eps=1e-8)


def make_loss_fn(cfg: Config, nets: FusionNets, mesh=None) -> Callable:
    fwd = lambda variables, batch: nets.forward(variables, batch, train=True)
    if cfg.remat:
        # trade recompute for activation memory (useful at 352x1216)
        fwd = jax.checkpoint(fwd)

    def loss_fn(params, batch_stats, batch, rng):
        variables = combine_variables(params, batch_stats)
        batch = dict(batch)
        batch["color_pyramid"] = build_color_pyramid(cfg, batch["color"][:, 0])
        outputs, updates = fwd(variables, batch)
        outputs = generate_images_pred(cfg, batch, outputs,
                                       list(cfg.frame_ids), mesh=mesh)
        losses = compute_losses(cfg, batch, outputs, rng, mesh=mesh)
        new_stats = {
            k: (updates[k]["batch_stats"] if k in updates
                else batch_stats.get(k, {}))
            for k in batch_stats
        }
        return losses["loss"], (losses, new_stats)

    return loss_fn


def make_train_step(cfg: Config, nets: FusionNets,
                    tx: optax.GradientTransformation,
                    mesh=None) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, losses).

    With cfg.grad_accum_steps > 1, the batch's leading axis is split into
    microbatches processed by lax.scan with gradient averaging. `mesh` (a
    data-parallel Mesh, or None) lets the Pallas warp kernel run per-shard
    via shard_map — the same fast loss path serves 1 and N devices.
    """
    loss_fn = make_loss_fn(cfg, nets, mesh=mesh)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    accum = max(cfg.grad_accum_steps, 1)

    def train_step(state: TrainState, batch, rng):
        if accum == 1:
            (_, (losses, new_stats)), grads = grad_fn(
                state.params, state.batch_stats, batch, rng)
        else:
            def micro(carry, xs):
                grads_acc, stats = carry
                mb, key = xs
                (_, (losses, new_stats)), grads = grad_fn(
                    state.params, stats, mb, key)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                return (grads_acc, new_stats), losses

            micro_batches = jax.tree.map(
                lambda x: x.reshape((accum, x.shape[0] // accum) + x.shape[1:]),
                batch)
            keys = jax.random.split(rng, accum)
            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (grads, new_stats), losses_seq = jax.lax.scan(
                micro, (zeros, state.batch_stats), (micro_batches, keys))
            grads = jax.tree.map(lambda g: g / accum, grads)
            losses = jax.tree.map(lambda x: x.mean(), losses_seq)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, losses

    return train_step


def create_train_state(cfg: Config, nets: FusionNets, rng,
                       tx: optax.GradientTransformation,
                       batch_size: int = 1) -> TrainState:
    variables = nets.init(rng, batch_size=batch_size)
    if cfg.weights_init == "pretrained":
        # reference default: every ResNet encoder starts from converted
        # torchvision ImageNet weights (networks/resnet_encoder.py:33-50)
        from fusiondepth_tpu.models.pretrained import apply_pretrained

        variables = apply_pretrained(cfg, nets, variables)
    params, stats = split_variables(variables)
    return TrainState(
        params=params,
        batch_stats=stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
