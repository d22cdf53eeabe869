"""One-off: which primitives can the pool kernel build on?

a) Mosaic lane slice [..., :C] / [..., C:] of a 128-lane dim
b) Mosaic leading-dim reshape + slice (H-parity)
c) XLA-side cost of the (B,H,W,C)->(B,H,W/2,2C) lane regroup, fwd+grad
d) XLA-side cost of one parity extraction x[:, :, ::2, :], fwd+grad
e) in-kernel dot_general W-selection + minor transpose

Usage: python scripts/exp_pool_prims.py [--pieces a,b,c,d,e]
"""

from __future__ import annotations

import argparse
import sys
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import _timeit_stats  # noqa: E402
from scripts.bench_anatomy import scan_fold  # noqa: E402

B, H, W, C = 12, 96, 320, 64
dt = jnp.bfloat16


def timed(name, fn_c, *fargs):
    jfn, n = scan_fold(fn_c)
    st = _timeit_stats(lambda: jfn(*fargs), iters=1, warmup=2, trials=3)
    print(f"{name:14s} {st['median']/n*1e3:8.3f} ms", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pieces", default="a,b,c,d,e")
    args = p.parse_args()
    pieces = args.pieces.split(",")

    x = jnp.zeros((B, H, W, C), dt)
    x2 = jnp.zeros((B, H, W // 2, 2 * C), dt)

    if "a" in pieces:
        def k_a(x_ref, o_ref):
            r = x_ref[0]  # (H, Wo, 2C)
            f0 = r[..., :C]
            f1 = r[..., C:]
            o_ref[0] = jnp.maximum(f0, f1)

        def f_a(c, t):
            return pl.pallas_call(
                k_a,
                grid=(B,),
                in_specs=[pl.BlockSpec((1, H, W // 2, 2 * C),
                                       lambda b: (b, 0, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, H, W // 2, C),
                                       lambda b: (b, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, H, W // 2, C), dt),
            )(t + c.astype(dt) * 1e-30).astype(jnp.float32).mean()

        timed("a_lane_slice", f_a, x2)

    if "b" in pieces:
        def k_b(x_ref, o_ref):
            r = x_ref[0]  # (H, W, C)
            e = r.reshape(H // 2, 2, W, C)[:, 0]
            o_ref[0] = e

        def f_b(c, t):
            return pl.pallas_call(
                k_b,
                grid=(B,),
                in_specs=[pl.BlockSpec((1, H, W, C),
                                       lambda b: (b, 0, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, H // 2, W, C),
                                       lambda b: (b, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, H // 2, W, C), dt),
            )(t + c.astype(dt) * 1e-30).astype(jnp.float32).mean()

        timed("b_hparity", f_b, x)

    if "c" in pieces:
        def f_c(c, t):
            r = (t + c.astype(dt) * 1e-30).reshape(B, H, W // 2, 2 * C)
            return r.astype(jnp.float32).mean()

        def g_c(c, t):
            g = jax.grad(lambda u: f_c(c, u))(t)
            return jnp.sum(g.astype(jnp.float32)) * 1e-20

        timed("c_regroup", f_c, x)
        timed("c_regroup_g", g_c, x)

    if "d" in pieces:
        def f_d(c, t):
            return (t + c.astype(dt) * 1e-30)[:, :, ::2, :].astype(
                jnp.float32).mean()

        def g_d(c, t):
            g = jax.grad(lambda u: f_d(c, u))(t)
            return jnp.sum(g.astype(jnp.float32)) * 1e-20

        timed("d_wparity", f_d, x)
        timed("d_wparity_g", g_d, x)

    if "e" in pieces:
        def k_e(x_ref, o_ref):
            r = x_ref[0]  # (H, W, C)
            ids = jax.lax.broadcasted_iota(jnp.int32, (W, W // 2), 0)
            tgt = jax.lax.broadcasted_iota(jnp.int32, (W, W // 2), 1) * 2
            S = jnp.where(ids == tgt, 1.0, 0.0).astype(r.dtype)
            sel = jax.lax.dot_general(
                r.astype(r.dtype), S, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (H, C, Wo)
            o_ref[0] = jnp.swapaxes(sel, -1, -2).astype(o_ref.dtype)

        def f_e(c, t):
            return pl.pallas_call(
                k_e,
                grid=(B,),
                in_specs=[pl.BlockSpec((1, H, W, C),
                                       lambda b: (b, 0, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, H, W // 2, C),
                                       lambda b: (b, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, H, W // 2, C), dt),
            )(t + c.astype(dt) * 1e-30).astype(jnp.float32).mean()

        timed("e_sel_mm_T", f_e, x)


if __name__ == "__main__":
    main()
