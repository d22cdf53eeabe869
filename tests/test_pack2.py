"""Batch-pair packed encoder region (models/resnet.pack2) is an exact
reformulation: same parameter tree, outputs/grads/batch-stats match the
unpacked path to dtype tolerance.

The packing exists for TPU lane density (the C=64 region fills half of
every 128-lane tile; see Config.pack2_encoder) — these tests pin the
semantics on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusiondepth_tpu.models.resnet import (
    ResnetEncoder,
    pack2,
    unpack2,
)


def _mk(pack, dtype=jnp.float32):
    return ResnetEncoder(depth=18, in_channels=3, pack2=pack, dtype=dtype)


@pytest.fixture(scope="module")
def setup():
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 64, 64, 3))
    v = _mk(False).init(rng, x, train=True)
    return x, v


def test_pack_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(2), (6, 8, 10, 64))
    np.testing.assert_array_equal(unpack2(pack2(x)), x)


def test_param_tree_identical(setup):
    x, v = setup
    vp = _mk(True).init(jax.random.PRNGKey(0), x, train=True)
    flat = jax.tree_util.tree_structure(v)
    flatp = jax.tree_util.tree_structure(vp)
    assert flat == flatp
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(v),
            jax.tree_util.tree_leaves_with_path(vp)):
        assert a.shape == b.shape, (ka, a.shape, b.shape)


def test_forward_and_stats_match(setup):
    x, v = setup
    out_u, upd_u = _mk(False).apply(v, x, train=True,
                                    mutable=["batch_stats"])
    out_p, upd_p = _mk(True).apply(v, x, train=True,
                                   mutable=["batch_stats"])
    assert len(out_u) == len(out_p)
    for a, b in zip(out_u, out_p):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(upd_u),
            jax.tree_util.tree_leaves_with_path(upd_p)):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4, err_msg=str(ka))


def test_eval_mode_matches(setup):
    x, v = setup
    out_u = _mk(False).apply(v, x, train=False)
    out_p = _mk(True).apply(v, x, train=False)
    for a, b in zip(out_u, out_p):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_grads_match_f64():
    """Gradient equivalence is only decidable above f32: in f32 the two
    paths reduce BN batch statistics in different orders, and that ~1e-7
    noise is amplified through the train-mode BN coupling and relu/pool
    tie flips into ~1e-3 grad scatter (both trajectories are self-
    consistent — verified vs finite differences). In scoped f64 the
    formulations agree to ~1e-12, pinning mathematical exactness."""
    with jax.enable_x64():
        rng = jax.random.PRNGKey(0)
        x = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3),
                               dtype=jnp.float64)

        def mk(p):
            return ResnetEncoder(depth=18, in_channels=3, pack2=p,
                                 dtype=jnp.float64)

        v = mk(False).init(rng, x, train=True)
        v = jax.tree.map(lambda t: t.astype(jnp.float64), v)

        def loss(params, mod):
            feats, _ = mod.apply(
                {"params": params, "batch_stats": v["batch_stats"]}, x,
                train=True, mutable=["batch_stats"])
            return sum(jnp.sum(f * f) for f in feats)

        gu = jax.grad(lambda p: loss(p, mk(False)))(v["params"])
        gp = jax.grad(lambda p: loss(p, mk(True)))(v["params"])
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(gu),
                jax.tree_util.tree_leaves_with_path(gp)):
            scale = float(np.max(np.abs(np.asarray(a)))) + 1e-30
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale,
                atol=1e-9, err_msg=str(ka))


def test_odd_batch_falls_back(setup):
    _, v = setup
    x3 = jax.random.uniform(jax.random.PRNGKey(3), (3, 64, 64, 3))
    out_u = _mk(False).apply(v, x3, train=False)
    out_p = _mk(True).apply(v, x3, train=False)  # must not crash
    for a, b in zip(out_u, out_p):
        np.testing.assert_allclose(a, b, atol=1e-6)
