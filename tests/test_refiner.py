"""Refiner (stage-2) tests: pseudo-3D input construction, masked median,
pooling, and the full refine train step on tiny shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
import torch
import torch.nn.functional as F

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.data.synthetic import make_batch
from fusiondepth_tpu.ops.pooling import masked_median, max_pool2x2_ceil
from fusiondepth_tpu.training.refiner import (
    RefinerNets,
    make_refine_loss_fn,
    refiner_si_loss,
)
from fusiondepth_tpu.training.train_state import (
    combine_variables,
    create_train_state,
    make_optimizer,
)

TINY = dict(height=64, width=96, num_layers=18)


def test_max_pool2x2_ceil_matches_torch():
    rng = np.random.default_rng(0)
    for H, W in [(8, 12), (7, 11)]:
        x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
        ours = np.asarray(max_pool2x2_ceil(jnp.array(x)))
        theirs = F.max_pool2d(
            torch.from_numpy(np.moveaxis(x, -1, 1).copy()), 2,
            ceil_mode=True).numpy()
        np.testing.assert_allclose(ours, np.moveaxis(theirs, 1, -1))


def test_masked_median_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 10, 10)).astype(np.float32)
    mask = rng.uniform(size=x.shape) < 0.4
    ours = float(masked_median(jnp.array(x), jnp.array(mask)))
    theirs = float(torch.median(torch.from_numpy(x[mask])))
    assert ours == pytest.approx(theirs)


def test_refiner_si_loss_constants():
    pred = jnp.full((4, 4), 10.0)
    target = jnp.full((4, 4), 9.0)
    out = float(refiner_si_loss(pred, target, threshold=2.0, si_var=0.3))
    d = np.log(10.0) - np.log(9.0)
    expect = np.sqrt(d**2 - 0.3 * d**2) * 10.0
    assert out == pytest.approx(expect, rel=1e-5)
    # out-of-threshold -> 0
    assert float(refiner_si_loss(pred, jnp.full((4, 4), 1.0), 2.0, 0.3)) == 0


@pytest.fixture(scope="module")
def refine_setup():
    cfg = Config(**TINY, clone_gdc=True, refine_2d=True)
    nets = RefinerNets(cfg)
    tx1 = make_optimizer(cfg, 1)
    s1 = create_train_state(cfg, nets.stage1, jax.random.PRNGKey(0), tx1)
    frozen = combine_variables(s1.params, s1.batch_stats)
    refine_params = nets.init_refine(jax.random.PRNGKey(1))
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=2))
    batch["inf_gdc"] = jnp.full((2, cfg.height, cfg.width, 1), 12.0)
    return cfg, nets, frozen, refine_params, batch


def test_pseudo3d_input_shapes(refine_setup):
    cfg, nets, frozen, refine_params, batch = refine_setup
    feats = nets.stage1.encoder.apply(frozen["encoder"],
                                      batch["color_aug"][:, 0], train=False)
    outputs = nets.stage1.depth.apply(frozen["depth"], feats)
    dm = nets.build_pseudo3d(batch, outputs)
    for s in cfg.scales:
        h, w = cfg.height // 2**s, cfg.width // 2**s
        assert dm[("disp", s)].shape == (2, h, w, 6), s  # 1 + 3(xyz) + 2
        assert np.isfinite(np.asarray(dm[("disp", s)])).all()


def test_refine_loss_and_grads(refine_setup):
    cfg, nets, frozen, refine_params, batch = refine_setup
    loss_fn = make_refine_loss_fn(cfg, nets)
    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        refine_params, frozen, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert gnorm > 0
    assert "iter0/loss/gdc_scale0" in losses
    # gdc loss only on scale 0 by default
    assert "iter0/loss/gdc_scale1" not in losses


def test_refine_step_updates_only_refine_params(refine_setup):
    cfg, nets, frozen, refine_params, batch = refine_setup
    loss_fn = make_refine_loss_fn(cfg, nets)
    tx = optax.adam(1e-4)
    opt_state = tx.init(refine_params)

    @jax.jit
    def step(rp, os_, fr, b, rng):
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            rp, fr, b, rng)
        updates, os_ = tx.update(grads, os_, rp)
        return optax.apply_updates(rp, updates), os_, losses

    rp2, _, losses = step(refine_params, opt_state, frozen, batch,
                          jax.random.PRNGKey(3))
    before = jax.tree.leaves(refine_params)[0]
    after = jax.tree.leaves(rp2)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    assert np.isfinite(float(losses["loss"]))
