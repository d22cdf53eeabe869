"""Shape / semantics tests for the Flax model zoo."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fusiondepth_tpu.models import (
    ResnetEncoder,
    RESNET_FEATURE_CHANNELS,
    DepthDecoder,
    PoseDecoder,
    PoseCNN,
)

H, W = 64, 96  # small but stride-32 divisible


def _init(model, *args, **kwargs):
    vs = model.init(jax.random.PRNGKey(0), *args, **kwargs)
    return vs


@pytest.mark.parametrize("depth", [18, 50])
def test_resnet_encoder_pyramid_shapes(depth):
    x = jnp.zeros((2, H, W, 3))
    enc = ResnetEncoder(depth=depth)
    vs = _init(enc, x)
    feats = enc.apply(vs, x)
    chans = RESNET_FEATURE_CHANNELS[depth]
    assert len(feats) == 5
    for lvl, (f, c) in enumerate(zip(feats, chans)):
        s = 2 ** (lvl + 1)
        assert f.shape == (2, H // s, W // s, c), (lvl, f.shape)


def test_resnet_s2d_stem_exact():
    """The space-to-depth stem rewrite (models/resnet._S2DStemConv) must be
    numerically equivalent to the strided 7x7 conv1 — same params (the
    param layout is shared), same features, both even and odd sizes."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, H, W, 3)), jnp.float32)
    base = ResnetEncoder(depth=18)
    s2d = ResnetEncoder(depth=18, s2d_stem=True)
    vs = _init(base, x)
    f0 = base.apply(vs, x)
    f1 = s2d.apply(vs, x)  # same variables: param trees are identical
    for a, b in zip(f0, f1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5)
    # odd width falls back to the strided conv (still exact by identity)
    xo = x[:, :, :-1]
    np.testing.assert_allclose(np.asarray(base.apply(vs, xo)[0]),
                               np.asarray(s2d.apply(vs, xo)[0]),
                               atol=2e-5, rtol=1e-5)


def test_resnet_encoder_beam_2ch():
    x = jnp.zeros((1, H, W, 2))
    enc = ResnetEncoder(depth=18, in_channels=2)
    vs = _init(enc, x)
    feats = enc.apply(vs, x)
    assert feats[0].shape == (1, H // 2, W // 2, 64)


def test_resnet_batchnorm_stats_update():
    x = jnp.array(np.random.default_rng(0).normal(size=(2, H, W, 3)),
                  jnp.float32)
    enc = ResnetEncoder(depth=18)
    vs = _init(enc, x, train=True)
    _, updates = enc.apply(vs, x, train=True, mutable=["batch_stats"])
    before = vs["batch_stats"]["bn1"]["mean"]
    after = updates["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def _pyramid(batch, chans):
    return [
        jnp.zeros((batch, H // 2 ** (i + 1), W // 2 ** (i + 1), c))
        for i, c in enumerate(chans)
    ]


def test_depth_decoder_multiscale_outputs():
    feats = _pyramid(2, RESNET_FEATURE_CHANNELS[18])
    dec = DepthDecoder()
    vs = _init(dec, feats)
    out = dec.apply(vs, feats)
    for s in range(4):
        assert out[("disp", s)].shape == (2, H // 2**s, W // 2**s, 1)
        v = np.asarray(out[("disp", s)])
        assert (v >= 0).all() and (v <= 1).all()


def test_depth_decoder_beam_fusion_changes_output():
    feats = _pyramid(1, RESNET_FEATURE_CHANNELS[18])
    beam = [f + 1.0 for f in feats]
    dec = DepthDecoder()
    vs = _init(dec, feats)
    out0 = dec.apply(vs, feats)
    out1 = dec.apply(vs, feats, beam_features=beam)
    assert not np.allclose(np.asarray(out0[("disp", 0)]),
                           np.asarray(out1[("disp", 0)]))


def test_depth_decoder_road_catxy_deep():
    feats = _pyramid(1, RESNET_FEATURE_CHANNELS[18])
    depth_maps = {
        ("disp", i): jnp.zeros((1, H // 2**i, W // 2**i, 6)) for i in range(4)
    }
    dec = DepthDecoder(road=True, catxy=True, deep=True, tanh_head=True)
    vs = _init(dec, feats, depth_maps=depth_maps)
    out = dec.apply(vs, feats, depth_maps=depth_maps)
    v = np.asarray(out[("disp", 0)])
    assert v.shape == (1, H, W, 1)
    assert (v >= -1).all() and (v <= 1).all()


def test_depth_decoder_cat2end():
    feats = _pyramid(1, RESNET_FEATURE_CHANNELS[18])
    two_ch = jnp.zeros((1, H, W, 2))
    dec = DepthDecoder(cat2end=True)
    vs = _init(dec, feats, two_channel=two_ch)
    out = dec.apply(vs, feats, two_channel=two_ch)
    assert out[("disp", 0)].shape == (1, H, W, 1)


def test_pose_decoder():
    last = [jnp.zeros((2, H // 32, W // 32, 512))]
    pd = PoseDecoder(num_input_features=1, num_frames_to_predict_for=2)
    vs = _init(pd, last)
    aa, t = pd.apply(vs, last)
    assert aa.shape == (2, 2, 1, 3)
    assert t.shape == (2, 2, 1, 3)


def test_pose_decoder_beam_fusion():
    last = [jnp.ones((1, 2, 3, 512))]
    beam = jnp.ones((1, 2, 3, 512))
    pd = PoseDecoder(num_input_features=1, num_frames_to_predict_for=2)
    vs = _init(pd, last)
    aa0, _ = pd.apply(vs, last)
    aa1, _ = pd.apply(vs, last, beam_last_feature=beam)
    assert not np.allclose(np.asarray(aa0), np.asarray(aa1))


def test_pose_cnn():
    x = jnp.zeros((2, H, W, 6))
    pc = PoseCNN(num_input_frames=2)
    vs = _init(pc, x)
    aa, t = pc.apply(vs, x)
    assert aa.shape == (2, 1, 1, 3)
    assert t.shape == (2, 1, 1, 3)


def test_resnet18_param_count_matches_torch_resnet():
    """ResNet-18 backbone ~11.69M params (sanity vs torchvision)."""
    x = jnp.zeros((1, H, W, 3))
    enc = ResnetEncoder(depth=18)
    vs = _init(enc, x)
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(vs["params"]))
    # torchvision resnet18 conv+bn params (no fc): 11,176,512
    assert abs(n - 11_176_512) < 1000, n
