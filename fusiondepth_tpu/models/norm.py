"""BatchNorm with low-precision-friendly normalization.

flax's nn.BatchNorm force-upcasts the NORMALIZATION math to float32 when
the compute dtype is bf16: every BN layer materializes several full-size
f32 intermediates (sub/mul chains over (B, H, W, C) activations — measured
188 MB each at b24 96x320x64 on v5e, the single largest source of HBM
traffic in the whole train step; see scripts/inspect_hlo.py).

This drop-in keeps what needs precision in f32 — the per-channel
statistics (reductions ACCUMULATE in f32 via jnp.mean(dtype=...), without
materializing an f32 copy of x) and the running stats — but folds the
normalization into per-channel affine coefficients

    A = scale / sqrt(var + eps),  Bc = bias - mean * A

cast to the compute dtype, so the full-size math is a single fused
`x * A + Bc` in bf16 that XLA merges with the surrounding conv/relu.

Parameter/collection layout matches nn.BatchNorm exactly (params:
scale/bias; batch_stats: mean/var; same momentum semantics), so torch
weight import and orbax checkpoints are unchanged.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchNorm(nn.Module):
    """`pack`: the input carries `pack` batch samples side by side in the
    channel dim (lane index j*C + c for pack slot j — the encoder's
    batch-pair packing, models/resnet.py). Parameters and running stats
    keep the per-channel shape (C,); batch statistics are computed over
    the packed lanes and TIED across slots, which equals the unpacked
    global-batch statistics exactly (equal counts per slot)."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    pack: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_affine: bool = False):
        """return_affine=True: compute the statistics from x (and update
        running stats) but return the per-lane affine pair (A, Bc) instead
        of normalizing — the caller fuses `x*A+Bc` into an adjacent kernel
        (ops/pallas_fold_conv.py encoder path). Identical parameters,
        collections and statistics either way."""
        feat = x.shape[-1] // self.pack
        scale = self.param("scale", nn.initializers.ones, (feat,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (feat,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (feat,))

        if self.use_running_average:
            mean = ra_mean.value
            var = ra_var.value
        else:
            red = tuple(range(x.ndim - 1))
            # f32 ACCUMULATION without an f32 materialization of x
            # (promote keeps f64 debug runs in f64 instead of downcasting)
            acc = jnp.promote_types(jnp.float32, x.dtype)
            mean = jnp.mean(x, axis=red, dtype=acc)
            mean2 = jnp.mean(x * x, axis=red, dtype=acc)
            if self.pack > 1:
                # tie slots: slot-j lanes hold distinct batch samples of
                # the SAME channel; averaging the slot means reproduces
                # the unpacked batch mean exactly
                mean = mean.reshape(self.pack, feat).mean(axis=0)
                mean2 = mean2.reshape(self.pack, feat).mean(axis=0)
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        A = inv.astype(self.dtype)
        Bc = (bias - mean * inv).astype(self.dtype)
        if self.pack > 1:
            A = jnp.tile(A, self.pack)
            Bc = jnp.tile(Bc, self.pack)
        if return_affine:
            return A, Bc
        return x.astype(self.dtype) * A + Bc
