"""Rematerialization: remat'd loss matches the plain loss bit-for-bit."""

import numpy as np
import jax
import jax.numpy as jnp

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.data.synthetic import make_batch
from fusiondepth_tpu.models.fusion import FusionNets
from fusiondepth_tpu.training.train_state import (
    make_loss_fn,
    split_variables,
)


def test_remat_matches_plain():
    cfg = Config(height=64, width=96, num_layers=18)
    nets = FusionNets(cfg)
    params, stats = split_variables(nets.init(jax.random.PRNGKey(0), 1))
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=2))
    rng = jax.random.PRNGKey(1)

    plain = make_loss_fn(cfg, nets)
    remat = make_loss_fn(cfg.replace(remat=True), nets)

    l0, _ = plain(params, stats, batch, rng)
    l1, _ = remat(params, stats, batch, rng)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)

    g0 = jax.grad(lambda p: plain(p, stats, batch, rng)[0])(params)
    g1 = jax.grad(lambda p: remat(p, stats, batch, rng)[0])(params)
    # the backward pass recomputes the forward under remat; 1-ulp
    # differences can flip min/argmin tie selections in the automask, so a
    # handful of elements legitimately route gradient through a different
    # branch. Assert tight elementwise agreement with room for those flips
    # plus per-leaf scale agreement.
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, atol=1e-3)
        if np.abs(a).sum() > 1e-5:
            np.testing.assert_allclose(
                np.abs(a).sum(), np.abs(b).sum(), rtol=1e-2)
