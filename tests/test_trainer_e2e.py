"""End-to-end trainer smoke test over the fake in-memory KITTI dataset:
dataset contract -> loader -> jitted step -> val protocol -> checkpoint."""

import numpy as np
import pytest

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.data.fake import FakeKITTIDataset
from fusiondepth_tpu.data.loader import DataLoader, collate


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    return Config(height=64, width=96, num_layers=18, batch_size=2,
                  log_frequency=1, num_workers=1,
                  log_dir=str(tmp_path_factory.mktemp("log")))


@pytest.fixture(scope="module")
def fake_ds(cfg):
    return FakeKITTIDataset(
        n_frames=4, height=cfg.height, width=cfg.width,
        frame_ids=cfg.frame_ids, is_train=True, cfg=cfg)


def test_fake_dataset_contract(fake_ds, cfg):
    s = fake_ds[0]
    F = len(cfg.frame_ids)
    assert s["color"].shape == (F, 64, 96, 3)
    assert s["color_aug"].shape == (F, 64, 96, 3)
    assert s["two_channel"].shape == (F, 64, 96, 2)
    assert s["four_beam"].shape == (64, 96, 1)
    assert s["K"].shape == (4, 4)
    assert s["depth_gt"].shape == (48, 128)
    assert 0 <= s["color"].min() and s["color"].max() <= 1


def test_loader_batching(fake_ds):
    loader = DataLoader(fake_ds, 2, shuffle=True, drop_last=True,
                        num_workers=1)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["color"].shape[0] == 2
    assert isinstance(b["depth_gt"], list) and len(b["depth_gt"]) == 2


def test_trainer_end_to_end(cfg, fake_ds):
    from fusiondepth_tpu.training.trainer import Trainer

    val_ds = FakeKITTIDataset(n_frames=2, height=cfg.height,
                              width=cfg.width, frame_ids=[0],
                              is_train=False, cfg=cfg)
    tr = Trainer(cfg, train_dataset=fake_ds, val_dataset=val_ds)
    tr.run_epoch()
    assert tr.step == 2  # 4 frames / batch 2
    metrics = tr.validate()
    assert metrics is not None
    for k in ("abs_rel", "rmse", "a1"):
        assert np.isfinite(metrics[k])
    # best checkpoint was written
    import os

    best = os.path.join(cfg.log_dir, cfg.model_name, "models",
                        "weights_best")
    assert os.path.isdir(best)

    # checkpoint roundtrip restores parameters
    from fusiondepth_tpu.training import checkpoint as ckpt

    state2, meta = ckpt.load_checkpoint(best, tr.state)
    import jax

    p_orig = jax.tree.leaves(tr.state.params)[0]
    p_load = jax.tree.leaves(state2.params)[0]
    np.testing.assert_allclose(np.asarray(p_orig), np.asarray(p_load))
