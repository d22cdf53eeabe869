"""Exactness of the fused Pallas folded conv (ops/pallas_fold_conv.py)
against the XLA folded formulation (ops/folded.py), fwd + all grads, in
interpret mode on CPU. The halo formulation itself is pinned exact vs the
band formulation by tests/test_folded.py; here we pin the kernelized
version (including its hand-written VJP: input-grad via the flipped
kernel + reflect-transpose corrections, weight-grad via the accumulating
kernel + halo->base projection)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusiondepth_tpu.ops.folded import conv3x3_folded, fold, unfold
from fusiondepth_tpu.ops.pallas_fold_conv import (
    _tile,
    eligible,
    fold_conv3x3_pallas,
)


def _mk(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def _oracle(inputs, kernels, bias, F, elu):
    y = conv3x3_folded(list(inputs), list(kernels), bias=bias, F=F)
    if elu:
        y = jax.nn.elu(y)
    return y.astype(jnp.float32)


@pytest.mark.parametrize("C,F,W,H", [(16, 8, 128, 8), (32, 4, 64, 12),
                                     (64, 2, 32, 8), (128, 1, 16, 8)])
@pytest.mark.parametrize("elu", [True, False])
def test_fwd_matches_folded(C, F, W, H, elu):
    rng = np.random.RandomState(0)
    B = 2
    x = _mk(rng, B, H, W, C)
    w = _mk(rng, 3, 3, C, C // 2) * 0.2
    b = _mk(rng, C // 2) * 0.1
    xf = fold(x, F)
    assert eligible(xf.shape, F)
    got = fold_conv3x3_pallas((xf,), (w,), b, F, (C,), elu, True)
    want = _oracle((xf,), (w,), b, F, elu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("C,F,W,H", [(16, 8, 128, 8), (64, 2, 32, 8),
                                     (128, 1, 16, 12),
                                     # H=104 -> TH=26, nT=4: cross-tile
                                     # wgrad accumulation + window halos
                                     # (the production H=48..96 regime)
                                     (64, 2, 32, 104)])
def test_grads_match_folded(C, F, W, H):
    rng = np.random.RandomState(1)
    B = 2
    Co = max(C // 2, 8)
    x = _mk(rng, B, H, W, C)
    w = _mk(rng, 3, 3, C, Co) * 0.2
    b = _mk(rng, Co) * 0.1
    xf = fold(x, F)
    g = _mk(rng, B, H, W // F, F * Co)

    def f_pallas(xf_, w_, b_):
        return fold_conv3x3_pallas((xf_,), (w_,), b_, F, (C,), True, True)

    def f_ref(xf_, w_, b_):
        return _oracle((xf_,), (w_,), b_, F, True)

    yp, vjp_p = jax.vjp(f_pallas, xf, w, b)
    yr, vjp_r = jax.vjp(f_ref, xf, w, b)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yr),
                               rtol=2e-5, atol=2e-5)
    for got, want, name in zip(vjp_p(g), vjp_r(g.astype(jnp.float32)),
                               ("dx", "dw", "db")):
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=1e-4, atol=1e-4, err_msg=name)


def test_multi_input_skip_concat():
    """upconv_i_1 shape: conv over the virtual concat of two inputs."""
    rng = np.random.RandomState(2)
    B, H, W, F = 2, 8, 64, 4
    C1, C2, Co = 32, 16, 32
    x1 = _mk(rng, B, H, W, C1)
    x2 = _mk(rng, B, H, W, C2)
    w = _mk(rng, 3, 3, C1 + C2, Co) * 0.2
    b = _mk(rng, Co) * 0.1
    xf1, xf2 = fold(x1, F), fold(x2, F)
    ks = (w[:, :, :C1], w[:, :, C1:])

    def f_pallas(a, b_, w_, bias):
        return fold_conv3x3_pallas(
            (a, b_), (w_[:, :, :C1], w_[:, :, C1:]), bias, F, (C1, C2),
            True, True)

    def f_ref(a, b_, w_, bias):
        return _oracle((a, b_), (w_[:, :, :C1], w_[:, :, C1:]), bias, F,
                       True)

    g = _mk(rng, B, H, W // F, F * Co)
    yp, vjp_p = jax.vjp(f_pallas, xf1, xf2, w, b)
    yr, vjp_r = jax.vjp(f_ref, xf1, xf2, w, b)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yr),
                               rtol=2e-5, atol=2e-5)
    for got, want, name in zip(vjp_p(g), vjp_r(g.astype(jnp.float32)),
                               ("dx1", "dx2", "dw", "db")):
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=1e-4, atol=1e-4, err_msg=name)
    del ks


def test_head_single_channel():
    """dispconv: Co=1, no ELU, odd FCo lanes."""
    rng = np.random.RandomState(3)
    B, H, W, F, C = 2, 8, 64, 8, 16
    x = _mk(rng, B, H, W, C)
    w = _mk(rng, 3, 3, C, 1) * 0.2
    b = _mk(rng, 1)
    xf = fold(x, F)
    got = fold_conv3x3_pallas((xf,), (w,), b, F, (C,), False, True)
    want = _oracle((xf,), (w,), b, F, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_tile_chooser():
    assert _tile(48) == (48, 1, 0)
    assert _tile(50) == (50, 1, 0)
    for H in (98, 194, 96, 192, 26):
        TH, nT, pad = _tile(H)
        assert TH <= 50 and nT * TH == H + pad and pad < TH


def test_decoder_parity_env_gate(monkeypatch):
    """Folded decoder output with FUSIONDEPTH_PALLAS_FOLDCONV=interpret
    matches the XLA folded path (same params)."""
    from fusiondepth_tpu.models.depth_decoder import DepthDecoder

    rng = np.random.RandomState(4)
    B = 1
    # standard pyramid shape ratios; H=64 keeps the deepest level at H=2
    # (the XLA fastpad path needs H >= 2 everywhere)
    H, W = 64, 128
    feats = [
        _mk(rng, B, H // 2, W // 2, 64), _mk(rng, B, H // 4, W // 4, 64),
        _mk(rng, B, H // 8, W // 8, 128),
        _mk(rng, B, H // 16, W // 16, 256),
        _mk(rng, B, H // 32, W // 32, 512),
    ]
    dec = DepthDecoder(folded=True)
    v = dec.init(jax.random.PRNGKey(0), feats)
    base = dec.apply(v, feats)
    monkeypatch.setenv("FUSIONDEPTH_PALLAS_FOLDCONV", "interpret")
    got = dec.apply(v, feats)
    for k in base:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(base[k]),
                                   rtol=3e-5, atol=3e-5, err_msg=str(k))


# ------------------------- encoder variant (zero pad, fused BN+ReLU in)

def _zero_oracle(x, w, s, b, F, Ci, act):
    """conv3x3 SAME zero-pad (bias-free) of relu(x*s+b), via the folded
    band formulation (models/resnet._FoldConv3x3 uses the same math)."""
    from fusiondepth_tpu.ops.folded import fold_kernel3x3

    a = jnp.maximum(x * s + b, 0.0) if act else x
    kf = fold_kernel3x3(w, F).astype(a.dtype)
    return jax.lax.conv_general_dilated(
        a, kf, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("act", [False, True])
@pytest.mark.parametrize("C,F,W,H", [(64, 2, 32, 8), (64, 2, 64, 12),
                                     # multi-tile: first/last-tile act
                                     # masks + cross-tile accumulation
                                     (64, 2, 32, 104)])
def test_zero_pad_encoder_conv(C, F, W, H, act):
    from fusiondepth_tpu.ops.pallas_fold_conv import fold_conv3x3_zero_pallas

    rng = np.random.RandomState(7)
    B = 2
    x = _mk(rng, B, H, W, C)
    w = _mk(rng, 3, 3, C, C) * 0.2
    s = jnp.abs(_mk(rng, F * C)) * 0.5 + 0.5
    bb = _mk(rng, F * C) * 0.3
    xf = fold(x, F)
    g = _mk(rng, B, H, W // F, F * C)

    def f_pallas(xf_, w_, s_, b_):
        return fold_conv3x3_zero_pallas(xf_, w_, s_, b_, F, C, act, True)

    def f_ref(xf_, w_, s_, b_):
        return _zero_oracle(xf_, w_, s_, b_, F, C, act)

    yp, vjp_p = jax.vjp(f_pallas, xf, w, s, bb)
    yr, vjp_r = jax.vjp(f_ref, xf, w, s, bb)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yr),
                               rtol=2e-5, atol=2e-5)
    names = ("dx", "dw", "ds", "db")
    # dw sums B*H*W f32 terms in tile order vs the oracle's conv order:
    # at H=104 (4 tiles) the reassociation spreads to ~1e-3 relative on
    # O(100)-magnitude entries — accumulation noise, not a formulation
    # difference (the single-tile cases pin 1e-4)
    dw_rtol = 1e-3 if H > 50 else 1e-4
    for got, want, name in zip(vjp_p(g), vjp_r(g), names):
        if not act and name in ("ds", "db"):
            continue  # oracle differentiates the unused affine; ours is 0
        tol = dw_rtol if name == "dw" else 1e-4
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=tol, atol=tol, err_msg=name)


def test_encoder_block_parity_env_gate(monkeypatch):
    """Folded ResNet-18 encoder forward + grads with
    FUSIONDEPTH_PALLAS_ENCCONV=interpret match the XLA folded path (same
    params, same batch_stats updates)."""
    from fusiondepth_tpu.models.resnet import ResnetEncoder

    rng = np.random.RandomState(8)
    x = _mk(rng, 2, 32, 64, 3)
    enc = ResnetEncoder(depth=18, in_channels=3, fold64=True)
    v = enc.init(jax.random.PRNGKey(0), x, train=False)

    def loss(v_, x_):
        feats, upd = enc.apply(v_, x_, train=True, mutable=["batch_stats"])
        return sum(f.astype(jnp.float32).mean() for f in feats), upd

    (l0, u0), g0 = jax.value_and_grad(loss, has_aux=True)(v, x)
    monkeypatch.setenv("FUSIONDEPTH_PALLAS_ENCCONV", "interpret")
    (l1, u1), g1 = jax.value_and_grad(loss, has_aux=True)(v, x)
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-5)
    flat0 = jax.tree.leaves(g0)
    flat1 = jax.tree.leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree.leaves(u0), jax.tree.leaves(u1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)
