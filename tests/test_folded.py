"""Folded-layout decoder equivalence: ops/folded.py + DepthDecoder(folded=True)
must match the generic path bit-for-tolerance on identical params.

The folded layout views (B, H, W, C) as (B, H, W/F, F*C) so small-channel
decoder stages fill all 128 TPU lanes; the math is the same multiply-add
set reassociated (see ops/folded.py docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusiondepth_tpu.models.depth_decoder import DepthDecoder
from fusiondepth_tpu.ops.folded import (
    conv3x3_folded,
    fold,
    fold_factor,
    unfold,
    upsample2x_folded,
)
from fusiondepth_tpu.ops.padding import reflect_pad_hw
from fusiondepth_tpu.ops.resize import upsample2x_nearest


def _conv_ref(x, w, b):
    """Plain reflect-pad 3x3 conv (the generic path's formulation)."""
    xp = reflect_pad_hw(x, 1)
    y = jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y + b


def test_fold_unfold_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 6, 16, 16)).astype(np.float32))
    for F in (1, 2, 4, 8):
        xf = fold(x, F)
        assert xf.shape == (2, 6, 16 // F, F * 16)
        np.testing.assert_array_equal(np.asarray(unfold(xf, 16)), np.asarray(x))


def test_fold_factor():
    assert fold_factor(16, 640) == 8
    assert fold_factor(32, 640) == 4
    assert fold_factor(64, 640) == 2
    assert fold_factor(128, 640) == 1
    assert fold_factor(256, 20) == 1
    # capped by W divisibility
    assert fold_factor(16, 20) == 4
    assert fold_factor(16, 6) == 2


@pytest.mark.parametrize("halo", [False, True])
@pytest.mark.parametrize("C,F,W", [(16, 8, 32), (32, 4, 16), (64, 2, 16)])
def test_conv3x3_folded_matches_plain(C, F, W, halo):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, W, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    ref = _conv_ref(x, w, b)
    got = unfold(conv3x3_folded([fold(x, F)], [w], bias=b, F=F, halo=halo),
                 C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("C,F,W", [(16, 8, 32), (64, 2, 16)])
def test_conv3x3_halo_grads_match_band(C, F, W):
    """The halo and band formulations are the same multiply-add set:
    gradients wrt input and kernel agree to reassociation tolerance."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 8, W, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.1)

    def loss(x_, w_, halo):
        y = conv3x3_folded([fold(x_, F)], [w_], F=F, halo=halo)
        return jnp.sum(y * y)

    gx_b, gw_b = jax.grad(loss, argnums=(0, 1))(x, w, False)
    gx_h, gw_h = jax.grad(loss, argnums=(0, 1))(x, w, True)
    np.testing.assert_allclose(np.asarray(gx_h), np.asarray(gx_b),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_h), np.asarray(gw_b),
                               rtol=1e-4, atol=1e-4)


def test_conv3x3_folded_multi_input_matches_concat():
    """conv(concat(a, b)) == conv_a(a) + conv_b(b) in the folded layout."""
    rng = np.random.default_rng(2)
    F, W = 2, 16
    a = jnp.asarray(rng.normal(size=(2, 8, W, 64)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2, 8, W, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 128, 32)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
    ref = _conv_ref(jnp.concatenate([a, b], axis=-1), w, bias)
    got = unfold(conv3x3_folded([fold(a, F), fold(b, F)],
                                [w[:, :, :64], w[:, :, 64:]],
                                bias=bias, F=F), 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("C,F", [(16, 8), (64, 2), (128, 1)])
def test_upsample2x_folded(C, F):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 4, 16, C)).astype(np.float32))
    ref = upsample2x_nearest(x)
    got = unfold(upsample2x_folded(fold(x, F), F, C), C)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def _pyramid(rng, B=2, H=64, W=64, chans=(64, 64, 128, 256, 512)):
    return [
        jnp.asarray(rng.normal(
            size=(B, H // 2 ** (i + 1), W // 2 ** (i + 1), c)
        ).astype(np.float32))
        for i, c in enumerate(chans)
    ]


def test_decoder_folded_matches_generic():
    rng = np.random.default_rng(4)
    feats = _pyramid(rng)
    dec_g = DepthDecoder(folded=False)
    dec_f = DepthDecoder(folded=True)
    params = dec_g.init(jax.random.PRNGKey(0), feats)
    # identical param trees (same names, same shapes)
    params_f = dec_f.init(jax.random.PRNGKey(0), feats)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, params_f)

    out_g = dec_g.apply(params, feats)
    out_f = dec_f.apply(params, feats)
    assert set(out_g) == set(out_f)
    for k in out_g:
        np.testing.assert_allclose(np.asarray(out_f[k]), np.asarray(out_g[k]),
                                   rtol=2e-5, atol=2e-5, err_msg=str(k))


def test_decoder_folded_matches_generic_with_beam():
    rng = np.random.default_rng(5)
    feats = _pyramid(rng)
    beam = _pyramid(rng)
    dec_g = DepthDecoder(folded=False)
    dec_f = DepthDecoder(folded=True)
    params = dec_g.init(jax.random.PRNGKey(0), feats, beam_features=beam)
    out_g = dec_g.apply(params, feats, beam_features=beam)
    out_f = dec_f.apply(params, feats, beam_features=beam)
    for k in out_g:
        np.testing.assert_allclose(np.asarray(out_f[k]), np.asarray(out_g[k]),
                                   rtol=2e-5, atol=2e-5, err_msg=str(k))


def test_decoder_folded_grads_match():
    rng = np.random.default_rng(6)
    feats = _pyramid(rng, B=1, H=64, W=64)
    dec_g = DepthDecoder(folded=False)
    dec_f = DepthDecoder(folded=True)
    params = dec_g.init(jax.random.PRNGKey(0), feats)

    def loss(dec):
        def f(p):
            out = dec.apply(p, feats)
            return sum(jnp.sum(v) for v in out.values())
        return f

    g_g = jax.grad(loss(dec_g))(params)
    g_f = jax.grad(loss(dec_f))(params)

    def close(a, b):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)

    jax.tree.map(close, g_g, g_f)


def test_decoder_folded_bf16_close():
    """bf16 folded vs bf16 generic: same quantization class, loose tol."""
    rng = np.random.default_rng(7)
    feats = _pyramid(rng)
    dec_g = DepthDecoder(folded=False, dtype=jnp.bfloat16)
    dec_f = DepthDecoder(folded=True, dtype=jnp.bfloat16)
    params = dec_g.init(jax.random.PRNGKey(0), feats)
    out_g = dec_g.apply(params, feats)
    out_f = dec_f.apply(params, feats)
    for k in out_g:
        a = np.asarray(out_f[k], np.float32)
        b = np.asarray(out_g[k], np.float32)
        # sigmoid outputs in (0,1): absolute tolerance is the right frame
        np.testing.assert_allclose(a, b, atol=0.03, err_msg=str(k))


def test_decoder_folded_fallback_configs():
    """Configurations outside the folded fast path fall through to the
    generic implementation (cat2end needs the 2-channel concat)."""
    rng = np.random.default_rng(8)
    feats = _pyramid(rng)
    two_ch = jnp.asarray(rng.normal(size=(2, 64, 64, 2)).astype(np.float32))
    dec = DepthDecoder(folded=True, cat2end=True)
    params = dec.init(jax.random.PRNGKey(0), feats, two_channel=two_ch)
    out = dec.apply(params, feats, two_channel=two_ch)
    assert ("disp", 0) in out


def test_decoder_folded_road_deep_matches_generic():
    """Round 5: the folded path covers the refine2d configuration —
    road(+catxy) pseudo-3D injections and deep doubled ConvBlocks — with
    the SAME parameter tree; outputs and parameter grads match the
    generic path."""
    rng = np.random.default_rng(9)
    B, H, W = 1, 64, 64
    feats = _pyramid(rng, B=B, H=H, W=W)
    beam = _pyramid(rng, B=B, H=H, W=W)
    ch = 1 + 3 + 2  # scaled_disp + xyz (catxy) + 2channel
    dmaps = {
        ("disp", i): jnp.asarray(rng.normal(
            size=(B, H // 2 ** i, W // 2 ** i, ch)).astype(np.float32))
        for i in range(4)
    }
    dec_g = DepthDecoder(folded=False, road=True, catxy=True, deep=True)
    dec_f = DepthDecoder(folded=True, road=True, catxy=True, deep=True)
    params = dec_g.init(jax.random.PRNGKey(0), feats, beam_features=beam,
                        depth_maps=dmaps)
    params_f = dec_f.init(jax.random.PRNGKey(0), feats, beam_features=beam,
                          depth_maps=dmaps)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, params_f)

    out_g = dec_g.apply(params, feats, beam_features=beam, depth_maps=dmaps)
    out_f = dec_f.apply(params, feats, beam_features=beam, depth_maps=dmaps)
    assert set(out_g) == set(out_f)
    for k in out_g:
        np.testing.assert_allclose(np.asarray(out_f[k]), np.asarray(out_g[k]),
                                   rtol=2e-5, atol=2e-5, err_msg=str(k))

    def loss(dec):
        def f(p):
            out = dec.apply(p, feats, beam_features=beam, depth_maps=dmaps)
            return sum(jnp.sum(v) for v in out.values())
        return f

    g_g = jax.grad(loss(dec_g))(params)
    g_f = jax.grad(loss(dec_f))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4),
        g_g, g_f)
