"""Folded encoder->decoder seam (Config.folded_seam) is pure reshape
elision: the fold64 encoder hands its C=64 pyramid levels to the folded
decoder still folded at F=2 (ResnetEncoder.folded_features +
DepthDecoder.skip_fold), skipping the unfold/refold pair that the
{3,0,2,1} conv output layout turns into real HBM relayouts on TPU
(PERF.md HLO byte anatomy). Same parameter tree, same multiply-add set:
forward is bit-identical in f32, grads match to f64 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.models.fusion import FusionNets


def _nets(seam, dtype="float32"):
    cfg = Config(height=64, width=64, batch_size=2, num_layers=18,
                 beam_encoder=True, fold64_encoder=True, folded_decoder=True,
                 compute_dtype=dtype, pallas_warp=False, folded_seam=seam)
    return FusionNets(cfg)


def _batch(dtype=jnp.float32):
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    return {
        "color_aug": jax.random.uniform(k1, (2, 3, 64, 64, 3), dtype),
        "two_channel": jax.random.uniform(k2, (2, 3, 64, 64, 2), dtype),
    }


@pytest.fixture(scope="module")
def pair():
    n_on, n_off = _nets(True), _nets(False)
    assert n_on.seam_fold == 2 and n_off.seam_fold == 1
    rng = jax.random.PRNGKey(0)
    return n_on, n_off, n_on.init(rng, 2), n_off.init(rng, 2)


def test_param_tree_identical(pair):
    n_on, n_off, v_on, v_off = pair
    assert (jax.tree_util.tree_structure(v_on)
            == jax.tree_util.tree_structure(v_off))
    for (ka, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(v_on),
                               jax.tree_util.tree_leaves_with_path(v_off)):
        assert a.shape == b.shape, (ka, a.shape, b.shape)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_forward_bit_identical_f32(pair):
    n_on, n_off, v_on, v_off = pair
    batch = _batch()
    o_on, _, _ = n_on.forward_depth(v_on, batch, train=False)
    o_off, _, _ = n_off.forward_depth(v_off, batch, train=False)
    for s in range(4):
        a, b = np.asarray(o_on[("disp", s)]), np.asarray(o_off[("disp", s)])
        assert a.shape == b.shape
        np.testing.assert_array_equal(a, b)


def test_grads_match_f64():
    with jax.enable_x64():
        n_on, n_off = _nets(True, "float64"), _nets(False, "float64")
        rng = jax.random.PRNGKey(0)
        to64 = lambda t: jax.tree.map(lambda x: x.astype(jnp.float64), t)
        v_on, v_off = to64(n_on.init(rng, 2)), to64(n_off.init(rng, 2))
        batch = _batch(jnp.float64)

        def mkloss(nets):
            def loss(v):
                o, _, _ = nets.forward_depth(v, batch, train=True)
                return sum(jnp.sum(o[("disp", s)] ** 2) for s in range(4))
            return loss

        g_on = jax.jit(jax.grad(mkloss(n_on)))(v_on)
        g_off = jax.jit(jax.grad(mkloss(n_off)))(v_off)
        for (ka, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(g_on),
                jax.tree_util.tree_leaves_with_path(g_off)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=1e-10, err_msg=str(ka))


def test_generic_decoder_unfolds_seam_features():
    """A decoder variant that rejects the folded path (deep=True) must
    still be correct when fed seam-folded features: the generic path
    unfolds them first."""
    from fusiondepth_tpu.models.depth_decoder import DepthDecoder
    from fusiondepth_tpu.ops.folded import fold

    rng = jax.random.PRNGKey(0)
    feats = [jax.random.uniform(jax.random.PRNGKey(10 + i), s)
             for i, s in enumerate([(2, 32, 32, 64), (2, 16, 16, 64),
                                    (2, 8, 8, 128), (2, 4, 4, 256),
                                    (2, 2, 2, 512)])]
    folded_feats = [fold(f, 2) if i <= 1 else f for i, f in enumerate(feats)]
    dec = DepthDecoder(deep=True, folded=True, skip_fold=2)
    dec_ref = DepthDecoder(deep=True, folded=True, skip_fold=1)
    v = dec.init(rng, folded_feats)
    v_ref = dec_ref.init(rng, feats)
    o = dec.apply(v, folded_feats)
    o_ref = dec_ref.apply(v_ref, feats)
    for s in range(4):
        np.testing.assert_array_equal(np.asarray(o[("disp", s)]),
                                      np.asarray(o_ref[("disp", s)]))
