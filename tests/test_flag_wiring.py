"""Round-2 flag wiring: models_to_load selective restore, need_path,
completion_need2channel, need_full_res_4beam, dead-reference-flag warning."""

import os

import numpy as np
import pytest

from fusiondepth_tpu.config import Config, warn_dead_flags

TINY = dict(height=64, width=96, num_layers=18, batch_size=2,
            weights_init="scratch", dataset="synthetic")


def test_models_to_load_selective_restore(tmp_path):
    import jax

    from fusiondepth_tpu.training import checkpoint as ckpt
    from fusiondepth_tpu.training.trainer import Trainer

    cfg = Config(**TINY, log_dir=str(tmp_path), seed=1)
    tr = Trainer(cfg)
    path = ckpt.save_checkpoint(cfg, tr.state, "sel")

    # a differently-seeded state: load only the encoder back
    tr2 = Trainer(cfg.replace(seed=99), use_mesh=False)
    state3, _ = ckpt.load_checkpoint(path, tr2.state,
                                     models_to_load=["encoder"])

    def kernel_leaf(tree):
        # first >1-element leaf (kernels differ across seeds; biases are 0)
        return np.asarray(next(x for x in jax.tree.leaves(tree)
                               if np.asarray(x).size > 1))

    np.testing.assert_array_equal(kernel_leaf(state3.params["encoder"]),
                                  kernel_leaf(tr.state.params["encoder"]))
    assert not np.allclose(kernel_leaf(state3.params["depth"]),
                           kernel_leaf(tr.state.params["depth"]))
    np.testing.assert_array_equal(kernel_leaf(state3.params["depth"]),
                                  kernel_leaf(tr2.state.params["depth"]))


def test_need_path_in_samples(tmp_path):
    from fusiondepth_tpu.data.fixtures import DRIVE, build_synthetic_kitti_tree
    from fusiondepth_tpu.data.kitti_dataset import KITTIRAWDataset
    from fusiondepth_tpu.data.loader import DataLoader

    root = build_synthetic_kitti_tree(str(tmp_path), n_frames=3,
                                      height=64, width=96)
    cfg = Config(height=64, width=96, need_path=True)
    line = f"{DRIVE} 1 l"
    ds = KITTIRAWDataset(root, [line], 64, 96, [0], is_train=False, cfg=cfg)
    s = ds[0]
    assert s["path"] == line
    batch = next(iter(DataLoader(ds, 1, num_workers=1)))
    assert batch["path"] == [line]  # collated unstacked


def test_need_full_res_4beam_keys(tmp_path):
    from fusiondepth_tpu.data.fixtures import DRIVE, build_synthetic_kitti_tree
    from fusiondepth_tpu.data.kitti_dataset import KITTIRAWDataset

    root = build_synthetic_kitti_tree(str(tmp_path), n_frames=3,
                                      height=64, width=96)
    cfg = Config(height=64, width=96, need_full_res_4beam=True)
    ds = KITTIRAWDataset(root, [f"{DRIVE} 1 l"], 64, 96, [0],
                         is_train=False, cfg=cfg)
    s = ds[0]
    assert s["four_beam_full"].shape == (375, 1242, 1)
    assert s["two_channel_full"].shape == (375, 1242, 2)
    assert (s["four_beam_full"] > 0).sum() > 0


def test_completion_need2channel_loads_cache(tmp_path):
    from PIL import Image

    from fusiondepth_tpu.data.completion_dataset import KITTICompletion

    # minimal single-frame layout with a 2cha sibling cache
    d_dir = tmp_path / "proj" / "velodyne_raw"
    rgb_dir = tmp_path / "rgb"
    cha_dir = tmp_path / "proj" / "2cha"
    for d in (d_dir, rgb_dir, cha_dir):
        d.mkdir(parents=True)
    H, W = 352, 1216
    Image.fromarray(np.zeros((H, W, 3), np.uint8)).save(
        rgb_dir / "0000000000.png")
    sparse = np.zeros((H, W), np.uint16)
    sparse[200, 600] = 10 * 256
    Image.fromarray(sparse).save(d_dir / "0000000000.png")
    two = np.zeros((H, W, 2), np.float32)
    two[200, 600] = (0.1, 0.9)
    np.save(cha_dir / "0000000000.npy", two)

    paths = {"rgb": [str(rgb_dir / "0000000000.png")],
             "d": [str(d_dir / "0000000000.png")],
             "gt": [None]}
    cfg = Config(completion_need2channel=True, completion_test=True)
    ds = KITTICompletion(str(tmp_path), is_train=False, cfg=cfg, paths=paths)
    s = ds[0]
    np.testing.assert_allclose(s["two_channel"][0], two)

    # default (off): stacked raw sparse depth / 100
    cfg2 = Config(completion_test=True)
    s2 = KITTICompletion(str(tmp_path), is_train=False, cfg=cfg2,
                         paths=paths)[0]
    assert s2["two_channel"][0, 200, 600, 0] == pytest.approx(0.1)
    assert s2["two_channel"][0, 200, 600, 1] == pytest.approx(0.1)


def test_dead_reference_flags_warn(capsys):
    warn_dead_flags(Config(gdc_abs_loss=1.0, debug=True))
    out = capsys.readouterr().out
    assert "--gdc_abs_loss has no effect" in out
    assert "--debug has no effect" in out
    warn_dead_flags(Config())
    assert capsys.readouterr().out == ""
