"""Benchmark: self-supervised train-step throughput on the flagship config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config mirrors BASELINE.json config 3: ResNet-18, 640x192, batch 12,
full photometric + SI loss train step (depth + beam + pose nets).
vs_baseline compares against the A100 PyTorch reference throughput estimate
(~9 samples/s for monodepth2-class models at batch 12; the reference never
published a number — trainer.py:632-642 prints it live — so this constant is
the driver's stand-in until a measured A100 figure lands in BASELINE.json).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# The reference never published throughput (trainer.py:632-642 prints it
# live). Conservative A100 stand-in for monodepth2-class R18 640x192
# training at batch 12 in PyTorch (fwd+bwd over 4 ResNet encoders + warps):
# ~350 samples/s — deliberately generous to the baseline.
A100_BASELINE_SAMPLES_PER_SEC = 350.0

BATCH = 12
WARMUP = 3
ITERS = 10


if __name__ == "__main__":
    from fusiondepth_tpu.config import Config
    from fusiondepth_tpu.models.fusion import FusionNets
    from fusiondepth_tpu.data.synthetic import make_batch
    from fusiondepth_tpu.training.train_state import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    on_tpu = jax.devices()[0].platform != "cpu"
    cfg = Config(
        num_layers=18,
        height=192,
        width=640,
        batch_size=BATCH,
        compute_dtype="bfloat16" if on_tpu else "float32",
    )
    nets = FusionNets(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=1000)
    state = create_train_state(cfg, nets, jax.random.PRNGKey(0), tx)
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=BATCH))
    step = jax.jit(make_train_step(cfg, nets, tx), donate_argnums=0)

    rng = jax.random.PRNGKey(1)
    for i in range(WARMUP):
        rng, k = jax.random.split(rng)
        state, losses = step(state, batch, k)
    jax.block_until_ready(losses["loss"])

    t0 = time.perf_counter()
    for i in range(ITERS):
        rng, k = jax.random.split(rng)
        state, losses = step(state, batch, k)
    jax.block_until_ready(losses["loss"])
    dt = time.perf_counter() - t0

    samples_per_sec = BATCH * ITERS / dt

    # secondary metric (stderr; the driver reads the single stdout line):
    # single-image inference FPS at 640x192
    import sys

    from fusiondepth_tpu.training.train_state import combine_variables

    variables = combine_variables(state.params, state.batch_stats)
    b1 = jax.tree.map(lambda x: x[:1], batch)
    infer = jax.jit(lambda v, b: nets.forward_depth(
        v, b, train=False)[0][("disp", 0)])
    out = infer(variables, b1)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(50):
        out = infer(variables, b1)
    jax.block_until_ready(out)
    fps = 50 / (time.perf_counter() - t0)
    print(f"inference_fps_640x192_b1: {fps:.1f}", file=sys.stderr)

    print(json.dumps({
        "metric": "train_samples_per_sec_r18_640x192_b12",
        "value": round(samples_per_sec, 2),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / A100_BASELINE_SAMPLES_PER_SEC, 3),
    }))
