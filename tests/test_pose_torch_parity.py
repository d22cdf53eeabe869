"""Numerical forward parity: PoseDecoder / PoseCNN vs torch twins."""

import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from fusiondepth_tpu.models.pose import PoseCNN, PoseDecoder


def _t(a):  # flax HWIO -> torch OIHW tensor
    return torch.from_numpy(
        np.transpose(np.asarray(a), (3, 2, 0, 1)).copy())


def _b(a):
    return torch.from_numpy(np.asarray(a).copy())


def test_pose_decoder_parity():
    C = 512
    pd = PoseDecoder(num_input_features=1, num_frames_to_predict_for=2)
    feat = np.random.default_rng(0).normal(
        size=(2, 6, 10, C)).astype(np.float32) * 0.1
    vs = pd.init(jax.random.PRNGKey(0), [jnp.array(feat)])
    aa_f, t_f = pd.apply(vs, [jnp.array(feat)])

    p = vs["params"]
    squeeze = tnn.Conv2d(C, 256, 1)
    c0 = tnn.Conv2d(256, 256, 3, 1, 1)
    c1 = tnn.Conv2d(256, 256, 3, 1, 1)
    c2 = tnn.Conv2d(256, 12, 1)
    for m, name in ((squeeze, "squeeze"), (c0, "pose_0"), (c1, "pose_1"),
                    (c2, "pose_2")):
        m.weight.data = _t(p[name]["kernel"])
        m.bias.data = _b(p[name]["bias"])

    x = torch.from_numpy(np.moveaxis(feat, -1, 1).copy())
    with torch.no_grad():
        y = torch.relu(squeeze(x))
        y = torch.relu(c0(y))
        y = torch.relu(c1(y))
        y = c2(y).mean(3).mean(2)
        out = 0.01 * y.view(-1, 2, 1, 6)
        aa_t, t_t = out[..., :3].numpy(), out[..., 3:].numpy()

    np.testing.assert_allclose(np.asarray(aa_f), aa_t, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t_f), t_t, atol=1e-6)


def test_posecnn_parity():
    pc = PoseCNN(num_input_frames=2)
    x = np.random.default_rng(1).normal(
        size=(1, 64, 96, 6)).astype(np.float32) * 0.1
    vs = pc.init(jax.random.PRNGKey(0), jnp.array(x))
    aa_f, t_f = pc.apply(vs, jnp.array(x))

    specs = [(6, 16, 7, 2, 3), (16, 32, 5, 2, 2), (32, 64, 3, 2, 1),
             (64, 128, 3, 2, 1), (128, 256, 3, 2, 1), (256, 256, 3, 2, 1),
             (256, 256, 3, 2, 1)]
    convs = []
    p = vs["params"]
    for i, (ci, co, k, s, pad) in enumerate(specs):
        m = tnn.Conv2d(ci, co, k, s, pad)
        m.weight.data = _t(p[f"conv_{i}"]["kernel"])
        m.bias.data = _b(p[f"conv_{i}"]["bias"])
        convs.append(m)
    head = tnn.Conv2d(256, 6, 1)
    head.weight.data = _t(p["pose_conv"]["kernel"])
    head.bias.data = _b(p["pose_conv"]["bias"])

    y = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    with torch.no_grad():
        for m in convs:
            y = torch.relu(m(y))
        y = head(y).mean(3).mean(2)
        out = 0.01 * y.view(-1, 1, 1, 6)
    np.testing.assert_allclose(np.asarray(aa_f),
                               out[..., :3].numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t_f),
                               out[..., 3:].numpy(), atol=1e-6)
