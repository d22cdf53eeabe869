"""The planes-layout photometric loss (the formulation the benchmark
measures AND the one meshes run) must match the reference per-scale NHWC
transcription — VERDICT r2 "test what you bench".

Covers: full-loss equivalence (with/without automask noise, ablations),
ssim_planes vs ops.ssim, the Pallas warp in planes layout (interpret mode),
its shard_map wrapper on the 8-device CPU mesh, and loss-value equality
between sharded and unsharded execution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.data.synthetic import make_batch
from fusiondepth_tpu.models.fusion import FusionNets
from fusiondepth_tpu.ops.planes import ssim_planes, to_planes
from fusiondepth_tpu.ops.ssim import ssim
from fusiondepth_tpu.ops.warp import warp_planes, warp_planes_xla
from fusiondepth_tpu.parallel import make_mesh, replicated_sharding, shard_batch
from fusiondepth_tpu.training import photometric as ph
from fusiondepth_tpu.training.train_state import (
    combine_variables,
    create_train_state,
    make_loss_fn,
    make_optimizer,
)

TINY = dict(height=64, width=96, num_layers=18)


@pytest.fixture(scope="module")
def setup():
    cfg = Config(**TINY)
    nets = FusionNets(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(cfg, nets, jax.random.PRNGKey(0), tx)
    return nets, state


def _losses(cfg, nets, state, batch, rng, reference: bool):
    variables = combine_variables(state.params, state.batch_stats)
    b = dict(batch)
    b["color_pyramid"] = ph.build_color_pyramid(cfg, b["color"][:, 0])
    outputs, _ = nets.forward(variables, b, train=True)
    if reference:
        outputs = ph.generate_images_pred_reference(
            cfg, b, outputs, list(cfg.frame_ids))
        return ph.compute_losses_reference(cfg, b, outputs, rng)
    outputs = ph.generate_images_pred(cfg, b, outputs, list(cfg.frame_ids))
    return ph.compute_losses(cfg, b, outputs, rng)


@pytest.mark.parametrize("overrides,tol", [
    ({}, 1e-4),                       # automask noise reorders ties only
    ({"disable_automasking": True}, 2e-5),   # fully deterministic
    ({"avg_reprojection": True}, 1e-4),
    ({"no_ssim": True}, 1e-4),
    ({"trainer_siloss_all_scale": False}, 1e-4),
])
def test_planes_matches_reference(setup, overrides, tol):
    nets, state = setup
    cfg = Config(**TINY, **overrides)
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=2))
    rng = jax.random.PRNGKey(7)
    lp = _losses(cfg, nets, state, batch, rng, reference=False)
    lr = _losses(cfg, nets, state, batch, rng, reference=True)
    assert abs(float(lp["loss"]) - float(lr["loss"])) < tol
    for s in cfg.scales:
        assert abs(float(lp[f"loss/{s}"]) - float(lr[f"loss/{s}"])) < tol
        if cfg.trainer_siloss and (cfg.trainer_siloss_all_scale or s == 0):
            assert abs(float(lp[f"loss/si_loss{s}"])
                       - float(lr[f"loss/si_loss{s}"])) < tol


def test_bf16_loss_close_to_f32(setup):
    """compute_dtype=bfloat16 runs the loss image-path in bf16 (the TPU
    training mode); the value must stay close to the f32 formulation."""
    nets, state = setup
    cfg32 = Config(**TINY)
    cfg16 = cfg32.replace(compute_dtype="bfloat16")
    batch = jax.tree.map(jnp.asarray, make_batch(cfg32, batch_size=2))
    rng = jax.random.PRNGKey(11)
    l32 = float(_losses(cfg32, nets, state, batch, rng, False)["loss"])
    l16 = float(_losses(cfg16, nets, state, batch, rng, False)["loss"])
    assert np.isfinite(l16)
    assert abs(l16 - l32) / abs(l32) < 0.05, (l16, l32)


def test_pallas_warp_planes_bf16_sources():
    """bf16 sources ride the kernel's bf16 window path; output matches the
    f32 XLA gather to bf16 tolerance."""
    rng = np.random.default_rng(5)
    n, k, B, C, H, W = 1, 2, 1, 3, 64, 96
    srcs = jnp.asarray(rng.random((n, B, C, H, W), np.float32))
    base = np.stack(np.meshgrid(
        np.linspace(-1, 1, W), np.linspace(-1, 1, H), indexing="xy"), -1)
    grids = jnp.asarray(
        base[None, None, None] + rng.uniform(-0.02, 0.02, (n, k, B, H, W, 2))
    ).astype(jnp.float32)
    want = np.asarray(warp_planes_xla(srcs, grids))
    got = np.asarray(warp_planes(srcs.astype(jnp.bfloat16), grids,
                                 use_pallas=True, interpret=True)
                     ).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_ssim_planes_matches_nhwc():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 24, 40, 3), np.float32))
    y = jnp.asarray(rng.random((2, 24, 40, 3), np.float32))
    want = np.asarray(ssim(x, y))  # (B, H, W, C)
    got = np.asarray(ssim_planes(to_planes(x), to_planes(y)))  # (B, C, H, W)
    np.testing.assert_allclose(np.moveaxis(got, 1, -1), want, atol=1e-5)


def test_pallas_warp_planes_interpret_matches_xla():
    rng = np.random.default_rng(1)
    n, k, B, C, H, W = 2, 2, 2, 3, 64, 96
    srcs = jnp.asarray(rng.random((n, B, C, H, W), np.float32))
    # smooth small warps (the banded kernel's exactness domain)
    base = np.stack(np.meshgrid(
        np.linspace(-1, 1, W), np.linspace(-1, 1, H), indexing="xy"), -1)
    grids = jnp.asarray(
        base[None, None, None] + rng.uniform(-0.02, 0.02, (n, k, B, H, W, 2))
    ).astype(jnp.float32)
    want = np.asarray(warp_planes_xla(srcs, grids))
    got = np.asarray(warp_planes(srcs, grids, use_pallas=True,
                                 interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_warp_planes_shard_map_on_mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = make_mesh()
    rng = np.random.default_rng(2)
    n, k, B, C, H, W = 2, 1, 8, 3, 64, 96
    srcs = jnp.asarray(rng.random((n, B, C, H, W), np.float32))
    base = np.stack(np.meshgrid(
        np.linspace(-1, 1, W), np.linspace(-1, 1, H), indexing="xy"), -1)
    grids = jnp.asarray(
        base[None, None, None] + rng.uniform(-0.02, 0.02, (n, k, B, H, W, 2))
    ).astype(jnp.float32)
    want = np.asarray(warp_planes_xla(srcs, grids))
    f = jax.jit(lambda s, g: warp_planes(
        s, g, use_pallas=True, interpret=True, mesh=mesh))
    got = np.asarray(f(srcs, grids))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # gradients flow through the shard_mapped custom VJP
    gfn = jax.jit(jax.grad(lambda g: warp_planes(
        srcs, g, use_pallas=True, interpret=True, mesh=mesh).sum()))
    gr = np.asarray(gfn(grids))
    assert np.isfinite(gr).all() and np.abs(gr).sum() > 0


def test_loss_value_equal_sharded_vs_unsharded(setup):
    """The SAME planes formulation runs on 1-device and the 8-device mesh
    and produces the same loss — no slow mesh fallback anymore."""
    nets, state = setup
    cfg = Config(**TINY)
    loss_fn = make_loss_fn(cfg, nets)
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=8))
    rng = jax.random.PRNGKey(3)
    l_single = float(loss_fn(state.params, state.batch_stats, batch, rng)[0])

    mesh = make_mesh()
    sharded = shard_batch(batch, mesh)
    rep_state = jax.device_put(state, replicated_sharding(mesh))
    jl = jax.jit(lambda p, s, b, r: loss_fn(p, s, b, r)[0])
    l_mesh = float(jl(rep_state.params, rep_state.batch_stats, sharded, rng))
    assert abs(l_single - l_mesh) < 2e-4, (l_single, l_mesh)
