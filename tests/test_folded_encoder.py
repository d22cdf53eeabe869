"""W-folded encoder C=64 region (models/resnet fold64) is an exact
reformulation: same parameter tree, outputs/grads/batch-stats match the
generic path to dtype tolerance.

The fold exists for TPU lane density with zero transposes (the fold is a
free reshape; see Config.fold64_encoder) — these tests pin the semantics
on CPU, same structure as tests/test_pack2.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusiondepth_tpu.models.resnet import ResnetEncoder


def _mk(fold, dtype=jnp.float32):
    return ResnetEncoder(depth=18, in_channels=3, fold64=fold, dtype=dtype)


@pytest.fixture(scope="module")
def setup():
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 96, 3))
    v = _mk(False).init(rng, x, train=True)
    return x, v


def test_param_tree_identical(setup):
    x, v = setup
    vf = _mk(True).init(jax.random.PRNGKey(0), x, train=True)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(vf))
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(v),
            jax.tree_util.tree_leaves_with_path(vf)):
        assert a.shape == b.shape, (ka, a.shape, b.shape)


def test_forward_and_stats_match(setup):
    x, v = setup
    out_u, upd_u = _mk(False).apply(v, x, train=True,
                                    mutable=["batch_stats"])
    out_f, upd_f = _mk(True).apply(v, x, train=True,
                                   mutable=["batch_stats"])
    assert len(out_u) == len(out_f)
    for a, b in zip(out_u, out_f):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(upd_u),
            jax.tree_util.tree_leaves_with_path(upd_f)):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4,
                                   err_msg=str(ka))


def test_eval_mode_matches(setup):
    x, v = setup
    out_u = _mk(False).apply(v, x, train=False)
    out_f = _mk(True).apply(v, x, train=False)
    for a, b in zip(out_u, out_f):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_grads_match_f64():
    """Same rationale as test_pack2.test_grads_match_f64: f32 BN-stat
    reassociation noise amplifies through train-mode coupling; scoped f64
    pins mathematical exactness to ~1e-12."""
    with jax.enable_x64():
        rng = jax.random.PRNGKey(0)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 48, 3),
                               dtype=jnp.float64)

        def mk(f):
            return ResnetEncoder(depth=18, in_channels=3, fold64=f,
                                 dtype=jnp.float64)

        v = mk(False).init(rng, x, train=True)
        v = jax.tree.map(lambda t: t.astype(jnp.float64), v)

        def loss(params, mod):
            feats, _ = mod.apply(
                {"params": params, "batch_stats": v["batch_stats"]}, x,
                train=True, mutable=["batch_stats"])
            return sum(jnp.sum(f * f) for f in feats)

        gu = jax.grad(lambda p: loss(p, mk(False)))(v["params"])
        gf = jax.grad(lambda p: loss(p, mk(True)))(v["params"])
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(gu),
                jax.tree_util.tree_leaves_with_path(gf)):
            scale = float(np.max(np.abs(np.asarray(a)))) + 1e-30
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale,
                atol=1e-9, err_msg=str(ka))


def test_fold_stem_param_tree_and_forward(setup):
    """_FoldStemConv emits the folded layout directly from conv1 with the
    same (7,7,C,64) param under the same name — outputs must match the
    generic encoder."""
    x, v = setup
    enc = ResnetEncoder(depth=18, in_channels=3, fold64=True, fold_stem=True)
    vf = enc.init(jax.random.PRNGKey(0), x, train=True)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(vf))
    for (ka, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(v),
            jax.tree_util.tree_leaves_with_path(vf)):
        assert a.shape == b.shape, (ka, a.shape, b.shape)
    out_u = _mk(False).apply(v, x, train=False)
    out_f = enc.apply(v, x, train=False)
    assert len(out_u) == len(out_f)
    for a, b in zip(out_u, out_f):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_fold_stem_grads_match_f64():
    with jax.enable_x64():
        rng = jax.random.PRNGKey(0)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 48, 3),
                               dtype=jnp.float64)

        def mk(fs):
            return ResnetEncoder(depth=18, in_channels=3, fold64=True,
                                 fold_stem=fs, dtype=jnp.float64)

        v = mk(False).init(rng, x, train=True)
        v = jax.tree.map(lambda t: t.astype(jnp.float64), v)

        def loss(params, mod):
            feats, _ = mod.apply(
                {"params": params, "batch_stats": v["batch_stats"]}, x,
                train=True, mutable=["batch_stats"])
            return sum(jnp.sum(f * f) for f in feats)

        gu = jax.grad(lambda p: loss(p, mk(False)))(v["params"])
        gf = jax.grad(lambda p: loss(p, mk(True)))(v["params"])
        for (ka, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(gu),
                jax.tree_util.tree_leaves_with_path(gf)):
            scale = float(np.max(np.abs(np.asarray(a)))) + 1e-30
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale,
                atol=1e-9, err_msg=str(ka))


def test_odd_width_falls_back(setup):
    _, v = setup
    x3 = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 62, 3))
    out_u = _mk(False).apply(v, x3, train=False)
    out_f = _mk(True).apply(v, x3, train=False)  # must not crash
    for a, b in zip(out_u, out_f):
        np.testing.assert_allclose(a, b, atol=1e-6)
