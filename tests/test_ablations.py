"""Ablation-path tests: v1_multiscale, predictive_mask, shared pose,
posecnn, avg_reprojection, no_ssim, stereo."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.data.synthetic import make_batch
from fusiondepth_tpu.models.fusion import FusionNets
from fusiondepth_tpu.training.train_state import make_loss_fn

TINY = dict(height=64, width=96, num_layers=18)


def _loss_and_grads(cfg, batch_size=2):
    nets = FusionNets(cfg)
    variables = nets.init(jax.random.PRNGKey(0), batch_size=1)
    from fusiondepth_tpu.training.train_state import split_variables

    params, stats = split_variables(variables)
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=batch_size))
    loss_fn = make_loss_fn(cfg, nets)
    (loss, (losses, _)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params, stats, batch, jax.random.PRNGKey(1))
    return float(loss), losses, grads


@pytest.mark.parametrize("variant", [
    dict(v1_multiscale=True),
    dict(disable_automasking=True, predictive_mask=True),
    dict(pose_model_type="shared"),
    dict(pose_model_type="posecnn"),
    dict(avg_reprojection=True),
    dict(no_ssim=True),
])
def test_ablation_variants_train(variant):
    cfg = Config(**TINY, **variant)
    loss, losses, grads = _loss_and_grads(cfg)
    assert np.isfinite(loss), variant
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert gnorm > 0, variant


def test_predictive_mask_has_gradient():
    cfg = Config(**TINY, disable_automasking=True, predictive_mask=True)
    loss, losses, grads = _loss_and_grads(cfg)
    g = sum(float(jnp.abs(x).sum())
            for x in jax.tree.leaves(grads["predictive_mask"]))
    assert g > 0


def test_stereo_frame_trains():
    cfg = Config(**TINY, use_stereo=True,
                 frame_ids=(0, -1, 1, "s"))
    loss, losses, grads = _loss_and_grads(cfg)
    assert np.isfinite(loss)
