"""--train_entire_net: the stage-1 nets' parameters join the refine
optimizer while BatchNorm stays frozen in eval mode (reference
refiner.py:89-143)."""

import numpy as np
import jax

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.data.synthetic import make_batch
from fusiondepth_tpu.training.refiner_driver import Refiner

TINY = dict(height=64, width=96, num_layers=18, batch_size=2,
            weights_init="scratch")


def _batch(cfg):
    batch = make_batch(cfg, batch_size=2)
    batch["inf_gdc"] = np.full((2, cfg.height, cfg.width, 1), 12.0,
                               np.float32)
    return batch


def _leaf(tree):
    # first multi-element leaf: zero-init biases are equal across any two
    # inits and may receive ~0 gradients; kernels are the real signal
    return np.asarray(next(x for x in jax.tree.leaves(tree)
                           if np.asarray(x).size > 1)).copy()


def test_entire_net_updates_stage1_params(tmp_path):
    cfg = Config(**TINY, train_entire_net=True, log_dir=str(tmp_path))
    r = Refiner(cfg)
    enc_before = _leaf(r.frozen_variables["encoder"]["params"])
    stats_before = _leaf(r.frozen_variables["encoder"]["batch_stats"])
    ref_before = _leaf(r.refine_params)

    losses = r.run_step(_batch(cfg))
    assert np.isfinite(float(losses["loss"]))

    assert not np.allclose(
        enc_before, _leaf(r.frozen_variables["encoder"]["params"]))
    assert not np.allclose(ref_before, _leaf(r.refine_params))
    # running stats stay frozen (reference keeps stage-1 .eval())
    np.testing.assert_array_equal(
        stats_before, _leaf(r.frozen_variables["encoder"]["batch_stats"]))


def test_default_keeps_stage1_frozen(tmp_path):
    cfg = Config(**TINY, log_dir=str(tmp_path))
    r = Refiner(cfg)
    enc_before = _leaf(r.frozen_variables["encoder"]["params"])
    r.run_step(_batch(cfg))
    np.testing.assert_array_equal(
        enc_before, _leaf(r.frozen_variables["encoder"]["params"]))
