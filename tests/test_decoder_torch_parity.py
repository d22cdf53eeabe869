"""Numerical forward parity: the Flax DepthDecoder vs a torch twin with
the reference topology (reflect-pad 3x3 + ELU ConvBlocks, nearest 2x
upsample, skip concat order, sigmoid disp heads). Weights are copied
flax -> torch, so any padding/activation/ordering drift shows up as a
numeric mismatch."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from fusiondepth_tpu.models.depth_decoder import NUM_CH_DEC, DepthDecoder

ENC_CH = (64, 64, 128, 256, 512)
H, W = 64, 96


class _TorchDecoder(tnn.Module):
    """Reference DepthDecoder topology (networks/depth_decoder.py:6-96),
    default config (skips on, no fusion hooks)."""

    def __init__(self):
        super().__init__()
        self.convs = tnn.ModuleDict()
        for i in range(4, -1, -1):
            cin = ENC_CH[-1] if i == 4 else NUM_CH_DEC[i + 1]
            self.convs[f"upconv_{i}_0"] = tnn.Conv2d(cin, NUM_CH_DEC[i], 3)
            cin = NUM_CH_DEC[i] + (ENC_CH[i - 1] if i > 0 else 0)
            self.convs[f"upconv_{i}_1"] = tnn.Conv2d(cin, NUM_CH_DEC[i], 3)
        for s in range(4):
            self.convs[f"dispconv_{s}"] = tnn.Conv2d(NUM_CH_DEC[s], 1, 3)

    @staticmethod
    def _block(conv, x):
        return F.elu(conv(F.pad(x, (1, 1, 1, 1), mode="reflect")))

    def forward(self, feats):
        out = {}
        x = feats[-1]
        for i in range(4, -1, -1):
            x = self._block(self.convs[f"upconv_{i}_0"], x)
            xs = [F.interpolate(x, scale_factor=2, mode="nearest")]
            if i > 0:
                xs.append(feats[i - 1])
            x = torch.cat(xs, 1)
            x = self._block(self.convs[f"upconv_{i}_1"], x)
            if i < 4:
                pass
            if i in (0, 1, 2, 3):
                d = self.convs[f"dispconv_{i}"](
                    F.pad(x, (1, 1, 1, 1), mode="reflect"))
                out[("disp", i)] = torch.sigmoid(d)
        return out


def _copy_flax_to_torch(params, tmodel):
    """Flax HWIO kernels/bias -> torch OIHW."""
    sd = {}
    for i in range(5):
        for j in range(2):
            p = params[f"upconv_{i}_{j}"]["conv"]
            sd[f"convs.upconv_{i}_{j}.weight"] = torch.from_numpy(
                np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1)).copy())
            sd[f"convs.upconv_{i}_{j}.bias"] = torch.from_numpy(
                np.asarray(p["bias"]).copy())
    for s in range(4):
        p = params[f"dispconv_{s}"]["conv"]
        sd[f"convs.dispconv_{s}.weight"] = torch.from_numpy(
            np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1)).copy())
        sd[f"convs.dispconv_{s}.bias"] = torch.from_numpy(
            np.asarray(p["bias"]).copy())
    tmodel.load_state_dict(sd)


def test_depth_decoder_forward_parity():
    rng = np.random.default_rng(0)
    feats = [rng.normal(size=(1, H // 2 ** (i + 1), W // 2 ** (i + 1), c)
                        ).astype(np.float32) * 0.5
             for i, c in enumerate(ENC_CH)]

    dec = DepthDecoder()
    vs = dec.init(jax.random.PRNGKey(0), [jnp.array(f) for f in feats])
    out_f = dec.apply(vs, [jnp.array(f) for f in feats])

    tm = _TorchDecoder().eval()
    _copy_flax_to_torch(vs["params"], tm)
    t_feats = [torch.from_numpy(np.moveaxis(f, -1, 1).copy())
               for f in feats]
    with torch.no_grad():
        out_t = tm(t_feats)

    for s in range(4):
        a = np.asarray(out_f[("disp", s)])
        b = np.moveaxis(out_t[("disp", s)].numpy(), 1, -1)
        assert a.shape == b.shape, s
        np.testing.assert_allclose(a, b, atol=2e-5,
                                   err_msg=f"scale {s} diverged")
