"""Spatial (H-axis) sharding: a 2x4 (data x space) mesh produces the same
loss as unsharded execution — GSPMD inserts halo exchanges / gather
collectives without changing the math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.data.synthetic import make_batch
from fusiondepth_tpu.models.fusion import FusionNets
from fusiondepth_tpu.parallel import (
    make_mesh_2d,
    replicated_sharding,
    shard_batch_spatial,
)
from fusiondepth_tpu.training.train_state import (
    make_loss_fn,
    split_variables,
)


def test_spatial_sharding_matches_unsharded():
    assert len(jax.devices()) == 8
    cfg = Config(height=64, width=96, num_layers=18)
    nets = FusionNets(cfg)
    params, stats = split_variables(nets.init(jax.random.PRNGKey(0), 1))
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=2))
    rng = jax.random.PRNGKey(1)
    loss_fn = jax.jit(make_loss_fn(cfg, nets))

    l_plain, _ = loss_fn(params, stats, batch, rng)

    mesh = make_mesh_2d(2, 4)
    rep = replicated_sharding(mesh)
    params_s = jax.device_put(params, rep)
    stats_s = jax.device_put(stats, rep)
    batch_s = shard_batch_spatial(batch, mesh)
    l_shard, _ = loss_fn(params_s, stats_s, batch_s, rng)

    np.testing.assert_allclose(float(l_plain), float(l_shard), rtol=2e-4)
