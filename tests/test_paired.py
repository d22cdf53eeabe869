"""Paired grouped-conv encoder apply (models/paired.py) must match two
separate ResnetEncoder applies exactly — features, and the running-stat
updates written back per tree."""

import numpy as np
import jax
import jax.numpy as jnp

from fusiondepth_tpu.models.paired import (
    paired_resnet_apply,
    split_halves,
    sum_halves,
)
from fusiondepth_tpu.models.resnet import ResnetEncoder


def _setup(ca, cb, depth=18):
    rng = np.random.RandomState(0)
    enc_a = ResnetEncoder(depth=depth, in_channels=ca)
    enc_b = ResnetEncoder(depth=depth, in_channels=cb)
    xa = jnp.asarray(rng.standard_normal((2, 64, 96, ca)).astype(np.float32))
    xb = jnp.asarray(rng.standard_normal((2, 64, 96, cb)).astype(np.float32))
    va = enc_a.init(jax.random.PRNGKey(0), xa, train=True)
    vb = enc_b.init(jax.random.PRNGKey(1), xb, train=True)
    return enc_a, enc_b, va, vb, xa, xb


def test_paired_matches_separate_train():
    enc_a, enc_b, va, vb, xa, xb = _setup(3, 2)
    fa, upd_a = enc_a.apply(va, xa, train=True, mutable=["batch_stats"])
    fb, upd_b = enc_b.apply(vb, xb, train=True, mutable=["batch_stats"])
    paired, pua, pub = paired_resnet_apply(
        18, va, vb, xa, xb, train=True, dtype=jnp.float32)
    assert len(paired) == 5
    for lvl, (ra, rb) in enumerate(zip(fa, fb)):
        ha, hb = split_halves(paired[lvl])
        np.testing.assert_allclose(np.asarray(ha), np.asarray(ra),
                                   atol=2e-5, err_msg=f"lvl{lvl} a")
        np.testing.assert_allclose(np.asarray(hb), np.asarray(rb),
                                   atol=2e-5, err_msg=f"lvl{lvl} b")
        np.testing.assert_allclose(np.asarray(sum_halves(paired[lvl])),
                                   np.asarray(ra + rb), atol=4e-5)
    # running-stat updates equal per tree
    for ref, got in ((upd_a["batch_stats"], pua["batch_stats"]),
                     (upd_b["batch_stats"], pub["batch_stats"])):
        rl = jax.tree_util.tree_leaves_with_path(ref)
        gl = dict(jax.tree_util.tree_leaves_with_path(got))
        assert len(rl) == len(gl)
        for path, leaf in rl:
            np.testing.assert_allclose(np.asarray(gl[path]),
                                       np.asarray(leaf), atol=1e-5,
                                       err_msg=str(path))


def test_paired_matches_separate_eval():
    enc_a, enc_b, va, vb, xa, xb = _setup(6, 4)
    fa = enc_a.apply(va, xa, train=False)
    fb = enc_b.apply(vb, xb, train=False)
    paired, pua, pub = paired_resnet_apply(
        18, va, vb, xa, xb, train=False, dtype=jnp.float32)
    assert pua == {} and pub == {}
    for lvl, (ra, rb) in enumerate(zip(fa, fb)):
        ha, hb = split_halves(paired[lvl])
        np.testing.assert_allclose(np.asarray(ha), np.asarray(ra), atol=2e-5)
        np.testing.assert_allclose(np.asarray(hb), np.asarray(rb), atol=2e-5)


def test_paired_full_loss_matches_unpaired():
    """End-to-end: the full training loss (forward + view synthesis +
    losses) is identical with paired_encoders on and off (f32)."""
    from fusiondepth_tpu.config import Config
    from fusiondepth_tpu.data.synthetic import make_batch
    from fusiondepth_tpu.models.fusion import FusionNets
    from fusiondepth_tpu.training.train_state import (
        create_train_state,
        make_loss_fn,
        make_optimizer,
    )

    losses = {}
    for paired in (False, True):
        cfg = Config(num_layers=18, height=96, width=320, batch_size=2,
                     paired_encoders=paired)
        nets = FusionNets(cfg)
        tx = make_optimizer(cfg, 100)
        state = create_train_state(cfg, nets, jax.random.PRNGKey(0), tx)
        batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=2))
        loss_fn = make_loss_fn(cfg, nets)
        (loss, _), _ = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, jax.random.PRNGKey(1))
        losses[paired] = float(loss)
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)
