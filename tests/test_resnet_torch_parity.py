"""Numerical forward parity: the Flax ResNet encoder vs a torch twin built
with the exact torchvision ResNet-18 topology, sharing weights through the
converter. Catches conv padding/stride/BN semantics drift that shape tests
can't.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from fusiondepth_tpu.models.resnet import ResnetEncoder
from fusiondepth_tpu.models.torch_import import convert_resnet

from test_torch_import import _fake_torch_resnet_sd


class _BasicBlockT(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if cin != cout or stride != 1:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idn)


class _ResNet18T(tnn.Module):
    """Feature-pyramid ResNet-18 with torchvision naming; `in_ch` covers
    the fusion first-conv variants (2/3/4/6 channels)."""

    def __init__(self, in_ch: int = 3):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        widths = (64, 128, 256, 512)
        cin = 64
        for si, w in enumerate(widths):
            blocks = []
            for bi in range(2):
                stride = 2 if (si > 0 and bi == 0) else 1
                blocks.append(_BasicBlockT(cin, w, stride))
                cin = w
            setattr(self, f"layer{si + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        feats = []
        x = torch.relu(self.bn1(self.conv1(x)))
        feats.append(x)
        x = self.layer1(self.maxpool(x))
        feats.append(x)
        for layer in (self.layer2, self.layer3, self.layer4):
            x = layer(x)
            feats.append(x)
        return feats


def test_resnet18_forward_parity():
    rng = np.random.default_rng(0)
    sd_np = _fake_torch_resnet_sd(18, rng)

    # torch twin
    model = _ResNet18T().eval()
    torch_sd = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd_np.items()}
    missing, unexpected = model.load_state_dict(torch_sd, strict=False)
    # only num_batches_tracked buffers may be missing
    assert all("num_batches_tracked" in k for k in missing), missing
    assert not unexpected, unexpected

    # flax side via the converter
    variables = convert_resnet(sd_np, 18)
    enc = ResnetEncoder(depth=18)

    x = rng.uniform(0, 1, size=(1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        t_in = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
        t_in = (t_in - 0.45) / 0.225  # encoder's built-in normalization
        t_feats = model(t_in)

    f_feats = enc.apply({"params": variables["params"],
                         "batch_stats": variables["batch_stats"]},
                        jnp.array(x), train=False)

    assert len(t_feats) == len(f_feats) == 5
    for lvl, (tf, ff) in enumerate(zip(t_feats, f_feats)):
        t_np = np.moveaxis(tf.numpy(), 1, -1)
        f_np = np.asarray(ff)
        assert t_np.shape == f_np.shape, lvl
        np.testing.assert_allclose(
            f_np, t_np, atol=5e-4, rtol=1e-3,
            err_msg=f"feature level {lvl} diverged")
