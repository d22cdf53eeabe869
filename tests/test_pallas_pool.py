"""Pallas stem-maxpool kernel (ops/pallas_pool.py) vs torch MaxPool2d and
the never-stride-W XLA formulation — forward and backward, interpret mode.

The backward's tie policy (gradient split g/count among every window
position achieving the max — per-window mass conserved) must match
ops/pooling._pool_even exactly, including on inputs with many ties (bf16
ReLU plateaus make ties common in production; here float32 values from a
small integer grid force them deterministically).
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from fusiondepth_tpu.ops.pallas_pool import (
    max_pool_3x3s2_pallas,
    pallas_pool_ok,
)
from fusiondepth_tpu.ops.pooling import _pool_even


def _cases():
    rng = np.random.RandomState(0)
    smooth = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
    # integer-valued grid: dense ties inside 3x3 windows
    tied = rng.randint(0, 3, (2, 24, 32, 6)).astype(np.float32)
    return {"smooth": smooth, "tied": tied}


def test_pallas_pool_forward_matches_torch():
    for name, x in _cases().items():
        assert pallas_pool_ok(x.shape, x.dtype), name
        out = max_pool_3x3s2_pallas(jnp.asarray(x), True)
        ref = torch.nn.functional.max_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), 3, 2, 1)
        np.testing.assert_array_equal(
            np.asarray(out), ref.permute(0, 2, 3, 1).numpy(),
            err_msg=name)


def test_pallas_pool_backward_matches_xla_vjp():
    for name, x in _cases().items():
        xj = jnp.asarray(x)
        out_p, vjp_p = jax.vjp(lambda v: max_pool_3x3s2_pallas(v, True), xj)
        out_x, vjp_x = jax.vjp(_pool_even, xj)
        np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_x),
                                      err_msg=name)
        g = jnp.asarray(np.random.RandomState(1).standard_normal(
            out_p.shape).astype(np.float32))
        gp, gx = vjp_p(g)[0], vjp_x(g)[0]
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   atol=1e-6, err_msg=name)
        # per-window gradient mass conserved: total grad-in == total g
        np.testing.assert_allclose(float(jnp.sum(gp)), float(jnp.sum(g)),
                                   rtol=1e-5, err_msg=name)
