"""Completion knobs wired in round 2: completion_scheduler_step_size drives
the completor's own StepLR at the RAW lr (reference completor.py:121-123),
completion_siloss_weight scales the SI term (the reference's live factor,
completor.py:711), completion_eigen_crop restricts the val window
(completor.py:744-747)."""

import numpy as np
import pytest

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.training.completor import (
    completion_metrics,
    make_completion_optimizer,
)


def test_completion_scheduler_uses_raw_lr_and_completion_step_size():
    import optax

    cfg = Config(learning_rate=1e-4, batch_size=2,
                 completion_scheduler_step_size=2)
    # steps_per_epoch=10 -> decay boundary at step 20 (2 epochs), NOT the
    # stage-1 trainer's scheduler_step_size * 8/batch rescale
    tx = make_completion_optimizer(cfg, steps_per_epoch=10)
    sched = optax.piecewise_constant_schedule(
        cfg.learning_rate, {20 * (i + 1): 0.1 for i in range(3)})
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(20)) == pytest.approx(1e-5)
    # the optimizer was built from exactly that schedule: probe via a step
    import jax.numpy as jnp

    params = {"w": jnp.zeros(())}
    state = tx.init(params)
    upd0, state = tx.update({"w": jnp.ones(())}, state, params)
    assert float(upd0["w"]) == pytest.approx(-1e-4, rel=1e-3)
    for _ in range(20):
        upd, state = tx.update({"w": jnp.ones(())}, state, params)
    assert abs(float(upd["w"])) < 2e-5  # decayed past the boundary


def test_completion_siloss_weight_scales_term():
    import jax.numpy as jnp

    from fusiondepth_tpu.ops.losses import si_loss

    depth = jnp.full((1, 8, 8, 1), 10.0)
    ref = jnp.full((1, 8, 8, 1), 9.5)
    a = float(si_loss(depth, ref, scale=0.1))
    b = float(si_loss(depth, ref, scale=0.2))
    assert b == pytest.approx(2 * a, rel=1e-6)
    assert a > 0


def test_completion_eigen_crop_masks_metrics():
    gt = np.zeros((352, 1216), np.float32)
    pred = np.full((352, 1216), 10.0, np.float32)
    # one perfect pixel inside the crop, one terrible pixel outside it
    gt[200, 600] = 10.0
    gt[10, 10] = 50.0
    m_all = completion_metrics(gt, pred)
    m_crop = completion_metrics(gt, pred, eigen_crop=True)
    assert m_all["rmse"] > 1000  # the bad pixel dominates
    assert m_crop["rmse"] == pytest.approx(0.0, abs=1e-3)
