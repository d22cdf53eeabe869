"""Sparse-3D refinement path (--refine_shallow/--refineUnet/--refine_deep):
selector mapping + one real train step distilling a GDC target."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.data.synthetic import make_batch
from fusiondepth_tpu.models.refine_net3d import (
    RefineNet3DDeep,
    RefineNet3DShallow,
    RefineNet3DUNet,
)
from fusiondepth_tpu.training.refiner3d import Refiner3D, select_refine_net3d

TINY = dict(height=64, width=96, num_layers=18, batch_size=2,
            weights_init="scratch")


def test_selector_mapping():
    assert select_refine_net3d(Config(**TINY)) is None
    assert isinstance(
        select_refine_net3d(Config(**TINY, refine_shallow=True)),
        RefineNet3DShallow)
    assert isinstance(
        select_refine_net3d(Config(**TINY, refine_deep=True)),
        RefineNet3DDeep)
    assert isinstance(
        select_refine_net3d(Config(**TINY, refineUnet=True)),
        RefineNet3DUNet)
    with pytest.raises(AssertionError):
        select_refine_net3d(Config(**TINY, refine_shallow=True,
                                   refine_deep=True))


def test_refiner3d_step_trains_the_voxel_net(tmp_path):
    cfg = Config(**TINY, refine_shallow=True, log_dir=str(tmp_path))
    r = Refiner3D(cfg, capacity=2048)
    batch = make_batch(cfg, batch_size=2)
    batch["inf_gdc"] = np.full((2, cfg.height, cfg.width, 1), 12.0,
                               np.float32)

    def kernel_leaf(tree):
        return np.asarray(next(x for x in jax.tree.leaves(tree)
                               if np.asarray(x).size > 1))

    before = kernel_leaf(r.net_variables).copy()
    loss = r.run_step(batch)
    assert np.isfinite(loss) and loss > 0
    assert not np.allclose(before, kernel_leaf(r.net_variables))

    disp = r.infer(r.net_variables, r.frozen_variables,
                   jax.tree.map(jnp.asarray, batch))
    d = np.asarray(disp)
    assert d.shape == (2, cfg.height, cfg.width)
    assert np.isfinite(d).all()
    assert (d > 0).all() and (d <= 1).all()
