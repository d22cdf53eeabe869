"""Reflection padding for NHWC tensors.

`jnp.pad(mode='reflect')` lowers to a primitive without a linearization rule
in this JAX version (grad-under-jit fails with "Linearization failed...");
explicit slice-and-concatenate is equivalent and fully differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp


def reflect_pad_hw(x, pad: int = 1):
    """Reflection-pad (torch ReflectionPad2d semantics: mirror excluding the
    edge pixel) the H and W axes of an NHWC tensor by `pad`."""
    if pad == 0:
        return x
    top = x[:, pad:0:-1, :, :]
    bot = x[:, -2:-(pad + 2):-1, :, :]
    x = jnp.concatenate([top, x, bot], axis=1)
    left = x[:, :, pad:0:-1, :]
    right = x[:, :, -2:-(pad + 2):-1, :]
    return jnp.concatenate([left, x, right], axis=2)
