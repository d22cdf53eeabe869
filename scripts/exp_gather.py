"""One-off: probe tpu.dynamic_gather (2D take_along_axis in Pallas) for
support + throughput — the candidate primitive to replace the warp
kernel's one-hot MXU matmuls.

Pieces:
  g0   axis-0 gather (sublane crossbar): (32, 640) win, idx rows
  g1   axis-1 gather (lane crossbar): (32, 640) win, idx cols < 640
  g1w  axis-1 gather with WIDE lane extent (2, 20480) — combined index
  warp_row  the full per-row bilinear: 2 axis-1 + 2 axis-0 gathers + blend,
            RT=16 rows per program over a (C=3, H=192, W=640) plane, b12
            equivalent count (n*k*B = 96 planes) -> directly comparable
            to the production warp kernel's per-pass time.

Usage: python scripts/exp_gather.py [--pieces g0,g1,g1w,warp_row]
"""

from __future__ import annotations

import argparse
import sys
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import _timeit_stats  # noqa: E402
from scripts.bench_anatomy import scan_fold  # noqa: E402

WH, RT = 32, 16
C, H, W = 3, 192, 640
NKB = 96  # n_src * n_scales * B at b12


def timed(name, fn_c, *fargs):
    jfn, n = scan_fold(fn_c)
    st = _timeit_stats(lambda: jfn(*fargs), iters=1, warmup=2, trials=3)
    print(f"{name:10s} {st['median']/n*1e3:8.3f} ms", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pieces", default="g0,g1,g1w,warp_row")
    p.add_argument("--reps", type=int, default=512,
                   help="gather reps per program for g0/g1 micro pieces")
    args = p.parse_args()
    pieces = args.pieces.split(",")
    R = args.reps

    if "g0" in pieces or "g1" in pieces:
        def make(axis):
            def kern(x_ref, i_ref, o_ref):
                x = x_ref[...]
                idx = i_ref[...]
                acc = jnp.zeros_like(x)
                for _ in range(R):
                    # dependency chain defeats CSE so all R gathers run
                    acc = acc + jnp.take_along_axis(
                        x + acc * 1e-30, idx, axis=axis)
                o_ref[...] = acc

            def f(c, x, idx):
                return pl.pallas_call(
                    kern,
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((WH, W), jnp.float32),
                )(x + c * 1e-30, idx).mean()

            return f

        x = jnp.zeros((WH, W), jnp.float32)
        rng = np.random.RandomState(0)
        if "g0" in pieces:
            idx0 = jnp.asarray(rng.randint(0, WH, (WH, W)), jnp.int32)
            timed(f"g0 x{R}", make(0), x, idx0)
        if "g1" in pieces:
            idx1 = jnp.asarray(rng.randint(0, W, (WH, W)), jnp.int32)
            timed(f"g1 x{R}", make(1), x, idx1)

    if "g1w" in pieces:
        WL = WH * W  # 20480 lanes

        def kern_w(x_ref, i_ref, o_ref):
            x = x_ref[...]
            idx = i_ref[...]
            o_ref[...] = jnp.take_along_axis(x, idx, axis=1)

        def f_w(c, x, idx):
            return pl.pallas_call(
                kern_w,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((2, WL), jnp.float32),
            )(x + c * 1e-30, idx).mean()

        rng = np.random.RandomState(1)
        xw = jnp.zeros((2, WL), jnp.float32)
        idxw = jnp.asarray(rng.randint(0, WL, (2, WL)), jnp.int32)
        timed("g1w", f_w, xw, idxw)

    if "roll" in pieces:
        # dynamic (traced-shift) lane rotate — the banded-x fallback's
        # window-extraction primitive if dynamic_gather is slow
        def kern_r(x_ref, s_ref, o_ref):
            x = x_ref[...]
            sh = s_ref[0]
            acc = x
            for _ in range(32):
                acc = pltpu.roll(acc, sh, 1) + acc * 1e-30
            o_ref[...] = acc

        def f_r(c, x, sh):
            return pl.pallas_call(
                kern_r,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((WH, W), jnp.float32),
            )(x + c * 1e-30, sh).mean()

        timed("roll x32", f_r, jnp.zeros((WH, W), jnp.float32),
              jnp.array([128], jnp.int32))

    if "warp_row" in pieces:
        # full bilinear warp of NKB planes via gathers, grid like the
        # production kernel: (NKB, H // RT)
        def wkern(ix_ref, iy_ref, s_ref, o_ref):
            ix = ix_ref[0, 0]          # (RT, W)
            iy = iy_ref[0, 0]
            yb = jnp.clip(jnp.floor(jnp.min(iy)).astype(jnp.int32),
                          0, H - WH)
            yb = pl.multiple_of((yb // 8) * 8, 8)
            win = s_ref[0, :, pl.ds(yb, WH), :]   # (C, WH, W)
            x0 = jnp.clip(jnp.floor(ix), 0, W - 2).astype(jnp.int32)
            wx = jnp.clip(ix - x0.astype(jnp.float32), 0., 1.)
            ly = jnp.clip(jnp.floor(iy).astype(jnp.int32) - yb, 0, WH - 2)
            wy = jnp.clip(iy - (yb + ly).astype(jnp.float32), 0., 1.)
            for i in range(RT):
                ix_r = jnp.broadcast_to(x0[i][None], (WH, W))
                ly_r = jnp.broadcast_to(ly[i][None], (WH, W))
                for c in range(C):
                    wc = win[c]
                    h0 = jnp.take_along_axis(wc, ix_r, axis=1)
                    h1 = jnp.take_along_axis(wc, ix_r + 1, axis=1)
                    hb = h0 + wx[i][None] * (h1 - h0)
                    v0 = jnp.take_along_axis(hb, ly_r, axis=0)[:1]
                    v1 = jnp.take_along_axis(hb, ly_r + 1, axis=0)[:1]
                    o_ref[0, 0, c, i, :] = (
                        v0[0] + wy[i] * (v1[0] - v0[0])).astype(o_ref.dtype)

        def f(c, coords, src):
            ix = coords[..., 0] + c * 1e-30
            iy = coords[..., 1]
            out = pl.pallas_call(
                wkern,
                grid=(NKB, H // RT),
                in_specs=[
                    pl.BlockSpec((1, 1, RT, W), lambda s, r: (s, 0, r, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, RT, W), lambda s, r: (s, 0, r, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, C, H, W), lambda s, r: (s, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 1, C, RT, W),
                                       lambda s, r: (s, 0, 0, r, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((NKB, 1, C, H, W),
                                               jnp.float32),
            )(ix, iy, src)
            return out.mean()

        rng = np.random.RandomState(2)
        ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        ix = (jj[None, None] + rng.uniform(-30, 30, (NKB, 1, H, W))
              ).clip(0, W - 1).astype(np.float32)
        iy = (ii[None, None] + rng.uniform(-5, 5, (NKB, 1, H, W))
              ).clip(0, H - 1).astype(np.float32)
        coords = jnp.asarray(np.stack([ix, iy], -1))
        src = jnp.asarray(
            rng.standard_normal((NKB, C, H, W)).astype(np.float32))
        timed("warp_row", f, coords, src)


if __name__ == "__main__":
    main()
