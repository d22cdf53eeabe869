"""Pretrained ImageNet init is actually wired into the trainers.

The reference defaults weights_init="pretrained" and builds every ResNet
encoder from torchvision ImageNet weights, including the multi-image conv1
tiling for the pose encoder (reference networks/resnet_encoder.py:33-50,
trainer.py:65-96). Here a fake torchvision-format .pth stands in for the
model-zoo download and we assert Trainer/Completor state starts from the
converted weights."""

import numpy as np
import pytest
import torch

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.models.torch_import import _conv
from tests.test_torch_import import _fake_torch_resnet_sd


@pytest.fixture(scope="module")
def weights_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tv_ckpts")
    for depth in (18,):
        sd = _fake_torch_resnet_sd(depth, np.random.default_rng(depth))
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
                   d / f"resnet{depth}.pth")
    return d


def _cfg(weights_dir, tmp_path, **kw):
    return Config(num_layers=18, height=64, width=64, batch_size=2,
                  dataset="synthetic", log_dir=str(tmp_path),
                  pretrained_weights_path=str(weights_dir), **kw)


def test_trainer_pretrained_init(weights_dir, tmp_path):
    from fusiondepth_tpu.training.trainer import Trainer

    tr = Trainer(_cfg(weights_dir, tmp_path, weights_init="pretrained"))
    sd = _fake_torch_resnet_sd(18, np.random.default_rng(18))

    # depth encoder: full ImageNet init incl. the 3-channel conv1
    enc = tr.state.params["encoder"]
    np.testing.assert_allclose(
        np.asarray(enc["conv1"]["kernel"]), _conv(sd["conv1.weight"]))
    np.testing.assert_allclose(
        np.asarray(enc["layer4_1"]["conv2"]["kernel"]),
        _conv(sd["layer4.1.conv2.weight"]))
    # batch_stats restored from running stats
    np.testing.assert_allclose(
        np.asarray(tr.state.batch_stats["encoder"]["bn1"]["mean"]),
        sd["bn1.running_mean"])

    # pose encoder: conv1 tiled across the 2 pose frames and halved
    # (reference resnet_encoder.py:46-49)
    pk = np.asarray(tr.state.params["pose_encoder"]["conv1"]["kernel"])
    assert pk.shape == (7, 7, 6, 64)
    np.testing.assert_allclose(pk[:, :, :3], _conv(sd["conv1.weight"]) / 2.0)
    np.testing.assert_allclose(pk[:, :, 3:], pk[:, :, :3])
    np.testing.assert_allclose(
        np.asarray(tr.state.params["pose_encoder"]["layer1_0"]["conv1"]
                   ["kernel"]),
        _conv(sd["layer1.0.conv1.weight"]))

    # beam encoders: fresh (random) 2-/4-channel conv1, pretrained trunk
    # (reference resnet_encoder.py:80-84)
    bk = np.asarray(tr.state.params["beam_encoder"]["conv1"]["kernel"])
    assert bk.shape == (7, 7, 2, 64)
    np.testing.assert_allclose(
        np.asarray(tr.state.params["beam_encoder"]["layer2_0"]["conv1"]
                   ["kernel"]),
        _conv(sd["layer2.0.conv1.weight"]))
    bpk = np.asarray(
        tr.state.params["beam_encoder_pose"]["conv1"]["kernel"])
    assert bpk.shape == (7, 7, 4, 64)


def test_trainer_scratch_init_stays_random(weights_dir, tmp_path):
    from fusiondepth_tpu.training.trainer import Trainer

    tr = Trainer(_cfg(weights_dir, tmp_path, weights_init="scratch"))
    sd = _fake_torch_resnet_sd(18, np.random.default_rng(18))
    enc = tr.state.params["encoder"]
    assert not np.allclose(
        np.asarray(enc["conv1"]["kernel"]), _conv(sd["conv1.weight"]))


def test_missing_checkpoint_warns_and_random_inits(tmp_path, capsys):
    from fusiondepth_tpu.models import pretrained
    from fusiondepth_tpu.training.trainer import Trainer

    pretrained._warned.clear()
    cfg = Config(num_layers=18, height=64, width=64, batch_size=2,
                 dataset="synthetic", log_dir=str(tmp_path),
                 weights_init="pretrained",
                 pretrained_weights_path=str(tmp_path / "nope"))
    tr = Trainer(cfg)
    assert "no resnet18 checkpoint" in capsys.readouterr().err
    assert np.isfinite(
        np.asarray(tr.state.params["encoder"]["conv1"]["kernel"])).all()
