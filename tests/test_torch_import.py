"""Weight-converter tests: synthetic torchvision-style state dicts convert
into Flax ResnetEncoder variables that load and run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fusiondepth_tpu.models.resnet import RESNET_STAGES, ResnetEncoder
from fusiondepth_tpu.models.torch_import import convert_resnet


def _fake_torch_resnet_sd(depth: int, rng) -> dict:
    """Random tensors with exact torchvision resnet naming/shapes.

    Conv weights are scaled ~He-style so a 50-layer stack of random weights
    doesn't overflow to inf in the forward sanity check.
    """
    sd = {}
    bottleneck = depth > 34
    sd["conv1.weight"] = (rng.normal(size=(64, 3, 7, 7)) * 0.05).astype(
        np.float32)
    for bn in ("bn1",):
        sd[f"{bn}.weight"] = np.ones(64, np.float32)
        sd[f"{bn}.bias"] = np.zeros(64, np.float32)
        sd[f"{bn}.running_mean"] = np.zeros(64, np.float32)
        sd[f"{bn}.running_var"] = np.ones(64, np.float32)

    widths = (64, 128, 256, 512)
    in_ch = 64
    for si, (w, n_blocks) in enumerate(zip(widths, RESNET_STAGES[depth])):
        out_ch = w * (4 if bottleneck else 1)
        for bi in range(n_blocks):
            p = f"layer{si + 1}.{bi}"
            stride_block = si > 0 and bi == 0
            if bottleneck:
                shapes = [(w, in_ch, 1, 1), (w, w, 3, 3), (out_ch, w, 1, 1)]
            else:
                shapes = [(w, in_ch, 3, 3), (w, w, 3, 3)]
            for ci, shp in enumerate(shapes, start=1):
                fan_in = shp[1] * shp[2] * shp[3]
                sd[f"{p}.conv{ci}.weight"] = (
                    rng.normal(size=shp) * np.sqrt(2.0 / fan_in)
                ).astype(np.float32)
                c = shp[0]
                sd[f"{p}.bn{ci}.weight"] = np.ones(c, np.float32)
                sd[f"{p}.bn{ci}.bias"] = np.zeros(c, np.float32)
                sd[f"{p}.bn{ci}.running_mean"] = np.zeros(c, np.float32)
                sd[f"{p}.bn{ci}.running_var"] = np.ones(c, np.float32)
            if in_ch != out_ch or stride_block:
                sd[f"{p}.downsample.0.weight"] = (
                    rng.normal(size=(out_ch, in_ch, 1, 1))
                    * np.sqrt(2.0 / in_ch)).astype(np.float32)
                sd[f"{p}.downsample.1.weight"] = np.ones(out_ch, np.float32)
                sd[f"{p}.downsample.1.bias"] = np.zeros(out_ch, np.float32)
                sd[f"{p}.downsample.1.running_mean"] = np.zeros(
                    out_ch, np.float32)
                sd[f"{p}.downsample.1.running_var"] = np.ones(
                    out_ch, np.float32)
            in_ch = out_ch
    return sd


@pytest.mark.parametrize("depth", [18, 50])
def test_convert_and_forward(depth):
    rng = np.random.default_rng(0)
    sd = _fake_torch_resnet_sd(depth, rng)
    variables = convert_resnet(sd, depth)

    enc = ResnetEncoder(depth=depth)
    x = jnp.array(rng.uniform(size=(1, 64, 96, 3)).astype(np.float32))
    ref_vs = enc.init(jax.random.PRNGKey(0), x)

    # converted tree must match the flax structure exactly
    ref_shapes = jax.tree.map(lambda a: a.shape, ref_vs["params"])
    conv_shapes = jax.tree.map(lambda a: np.asarray(a).shape,
                               variables["params"])
    assert ref_shapes == conv_shapes

    feats = enc.apply({"params": variables["params"],
                       "batch_stats": variables["batch_stats"]}, x)
    assert len(feats) == 5
    assert np.isfinite(np.asarray(feats[-1])).all()


def test_multi_image_conv1_tiling():
    rng = np.random.default_rng(1)
    sd = _fake_torch_resnet_sd(18, rng)
    variables = convert_resnet(sd, 18, in_channels=6, num_input_images=2)
    k = np.asarray(variables["params"]["conv1"]["kernel"])  # HWIO
    assert k.shape == (7, 7, 6, 64)
    # tiled halves are identical and scaled by 1/2
    np.testing.assert_allclose(k[:, :, :3], k[:, :, 3:])
    orig = np.transpose(sd["conv1.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(k[:, :, :3], orig / 2.0)


def test_fusion_conv1_fallback():
    rng = np.random.default_rng(2)
    sd = _fake_torch_resnet_sd(18, rng)
    enc = ResnetEncoder(depth=18, in_channels=2)
    existing = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 2)))
    variables = convert_resnet(sd, 18, in_channels=2,
                               existing_variables=existing)
    k = np.asarray(variables["params"]["conv1"]["kernel"])
    np.testing.assert_allclose(
        k, np.asarray(existing["params"]["conv1"]["kernel"]))
