"""Training dynamics: the objective + optimizer jointly reduce the loss and
improve AbsRel when overfitting a single synthetic KITTI frame — the
cheapest signal that the loss wiring is correct end-to-end (SURVEY §4's
metric-driven quality bar)."""

import numpy as np
import pytest

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.data.fixtures import DRIVE, build_synthetic_kitti_tree

H, W = 64, 96
N_STEPS = 40


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from fusiondepth_tpu.data.kitti_dataset import KITTIRAWDataset
    from fusiondepth_tpu.data.loader import DataLoader
    from fusiondepth_tpu.training.trainer import Trainer

    root = build_synthetic_kitti_tree(
        str(tmp_path_factory.mktemp("kitti")), n_frames=3, height=H, width=W)
    # learning_rate is rescaled by batch/8 (reference trainer.py:39); at
    # batch 1 the default 1e-4 becomes 1.25e-5 — too slow to overfit in 40
    # steps, so raise it to an effective 1e-4. The SI validity window
    # |depth*26 - beam| < gdc_loss_threshold (default 2 m) is EMPTY at
    # random init (the reference opens it via pretrained ImageNet init);
    # widen it so the beams supervise from step 0.
    cfg = Config(data_path=root, height=H, width=W, num_layers=18,
                 batch_size=1, num_workers=1, weights_init="scratch",
                 learning_rate=8e-4, gdc_loss_threshold=100.0,
                 log_dir=str(tmp_path_factory.mktemp("log")))
    ds = KITTIRAWDataset(root, [f"{DRIVE} 1 l"], H, W, cfg.frame_ids,
                         is_train=True, cfg=cfg)
    # one fixed batch, repeated: pure overfitting
    batch = next(iter(DataLoader(ds, 1, num_workers=1)))
    return cfg, Trainer(cfg, train_dataset=ds, val_dataset=None), batch


def _absrel(tr, batch):
    from fusiondepth_tpu.training.evaluation import evaluate_disparities
    from fusiondepth_tpu.training.trainer import device_batch

    disp = np.asarray(tr._infer(tr.variables(), device_batch(batch)))
    # GT = the beam projection: pixel-aligned with the prediction at the
    # fixture scale (the velodyne depth_gt is padded into the reference's
    # fixed (375,1242) frame, kitti_utils.py:92-101, which misaligns with
    # a stretched prediction at synthetic-calib resolutions)
    gt = [np.asarray(batch["four_beam"])[0, ..., 0] * 100.0]
    return evaluate_disparities(disp[..., 0], gt,
                                eval_split="fixture")["abs_rel"]


def test_loss_and_absrel_improve_when_overfitting(setup):
    cfg, tr, batch = setup
    absrel0 = _absrel(tr, batch)

    losses, si = [], []
    for _ in range(N_STEPS):
        out = tr.run_step(batch)
        losses.append(float(out["loss"]))
        si.append(float(out["loss/si_loss0"]))
    assert np.isfinite(losses).all()

    # the photometric term on random-noise images has an irreducible floor,
    # so the total only drifts down; the SI term against the LiDAR beams is
    # the trainable signal and must drop hard
    first, last = float(np.mean(losses[:5])), float(np.mean(losses[-5:]))
    assert last < first, (first, last)
    si_first, si_last = float(np.mean(si[:5])), float(np.mean(si[-5:]))
    assert si_last < 0.6 * si_first, (si_first, si_last)

    absrel1 = _absrel(tr, batch)
    assert absrel1 < absrel0, (absrel0, absrel1)


def test_absrel_keeps_improving_over_longer_train(setup):
    """Longer mini-train (VERDICT r2 #6): over 3 x 60 further steps the
    eval-protocol AbsRel must keep trending down — the closest proxy this
    box can run for the reference's 0.070 eigen target (README.md:97-99),
    which needs the full KITTI split + ImageNet init
    (scripts/fetch_pretrained.py provisions the weights on real hosts)."""
    cfg, tr, batch = setup
    segs = [_absrel(tr, batch)]
    for _ in range(3):
        for _ in range(60):
            tr.run_step(batch)
        segs.append(_absrel(tr, batch))
    # monotone trend with 5% noise headroom per segment, and a hard overall
    # improvement bound
    for a, b in zip(segs, segs[1:]):
        assert b < a * 1.05, segs
    assert segs[-1] < segs[0] * 0.75, segs
