"""Probe: can the banded warp kernel's 384-column static band shrink to a
DYNAMICALLY POSITIONED 256-column band (128-aligned lane start)?

The fwd kernel's dominant cost is tent construction — ~5 VPU passes over a
(384, 128) tile per (row, strip) (PERF.md warp section). A 256-band cuts
that 33% and the MXU MACs with it, but needs win[:, pl.ds(rb, 256)] with
rb a traced 128-multiple — this probes whether Mosaic accepts dynamic
lane-start slices (and at what cost), plus the pltpu.roll fallback.

Run on the v5e; each case prints ok/err + true-sync ms.
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CW, W, BW, SW, RT = 48, 640, 256, 128, 16
N_IT = 50  # kernel-internal repeat to swamp dispatch


def timed(name, fn, *args):
    try:
        out = fn(*args)
        v = float(jnp.sum(out))  # true sync
        t0 = time.perf_counter()
        v = float(jnp.sum(fn(*args)))
        dt = (time.perf_counter() - t0) * 1e3
        print(f"{name}: ok sum={v:.3e}  {dt:.2f} ms (incl ~30ms tunnel)")
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:300]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")


def _mk_inputs():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    win = jax.random.normal(k1, (CW, W), jnp.bfloat16)
    # per-"row" displacement field: ix near identity +- 40 px
    ix = (jnp.arange(SW * 5, dtype=jnp.float32)[None, :]
          + 40.0 * jax.random.normal(k2, (RT, W))).clip(0, W - 1)
    return win, ix


# ---- case 1: dynamic 128-aligned lane-start slice --------------------
def _k_dyn(ix_ref, src_ref, o_ref):
    acc = jnp.zeros((CW, SW), jnp.float32)
    ids = jax.lax.broadcasted_iota(jnp.int32, (BW, SW), 0).astype(
        jnp.float32)
    for it in range(N_IT):
        i = it % RT
        for s in range(5):
            ixs = ix_ref[i, s * SW:(s + 1) * SW]
            mn = jnp.min(ixs)
            rb = jnp.clip((mn.astype(jnp.int32) // 128) * 128, 0, W - BW)
            rb = pl.multiple_of(rb, 128)
            band = src_ref[:, pl.ds(rb, BW)]
            ixloc = jnp.clip(ixs, 0.0, W - 1.0) - rb.astype(jnp.float32)
            t = jnp.maximum(0.0, 1.0 - jnp.abs(ids - ixloc[None, :]))
            acc += jax.lax.dot_general(
                band, t.astype(band.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[...] = acc


def case_dyn(win, ix):
    return pl.pallas_call(
        _k_dyn,
        out_shape=jax.ShapeDtypeStruct((CW, SW), jnp.float32),
    )(ix, win)


# ---- case 2: static 384 band (current form, for reference) -----------
def _k_static(ix_ref, src_ref, o_ref, *, bw):
    acc = jnp.zeros((CW, SW), jnp.float32)
    ids = jax.lax.broadcasted_iota(jnp.int32, (bw, SW), 0).astype(
        jnp.float32)
    for it in range(N_IT):
        i = it % RT
        for s in range(5):
            bs = min(max((s - 1) * SW, 0), W - bw)
            ixs = ix_ref[i, s * SW:(s + 1) * SW]
            band = src_ref[:, bs:bs + bw]
            ixloc = jnp.clip(ixs, bs, bs + bw - 1) - bs
            t = jnp.maximum(0.0, 1.0 - jnp.abs(ids - ixloc[None, :]))
            acc += jax.lax.dot_general(
                band, t.astype(band.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[...] = acc


def case_static(win, ix, bw):
    return pl.pallas_call(
        partial(_k_static, bw=bw),
        out_shape=jax.ShapeDtypeStruct((CW, SW), jnp.float32),
    )(ix, win)


# ---- case 3: one-hot + sublane roll (O1 = roll(O0)) ------------------
def _k_roll(ix_ref, src_ref, o_ref):
    acc = jnp.zeros((CW, SW), jnp.float32)
    bw = 384
    ids = jax.lax.broadcasted_iota(jnp.int32, (bw, SW), 0)
    for it in range(N_IT):
        i = it % RT
        for s in range(5):
            bs = min(max((s - 1) * SW, 0), W - bw)
            ixs = ix_ref[i, s * SW:(s + 1) * SW]
            band = src_ref[:, bs:bs + bw]
            x0 = jnp.clip(jnp.floor(ixs), bs, bs + bw - 2).astype(jnp.int32)
            wx = jnp.clip(ixs - x0.astype(jnp.float32), 0.0, 1.0)
            O0 = jnp.where(ids == (x0 - bs)[None, :], 1.0, 0.0).astype(
                band.dtype)
            O1 = pltpu.roll(O0, 1, 0)
            A0 = jax.lax.dot_general(
                band, O0, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            A1 = jax.lax.dot_general(
                band, O1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += A0 + wx[None, :] * (A1 - A0)
    o_ref[...] = acc


def case_roll(win, ix):
    return pl.pallas_call(
        _k_roll,
        out_shape=jax.ShapeDtypeStruct((CW, SW), jnp.float32),
    )(ix, win)


if __name__ == "__main__":
    win, ix = _mk_inputs()
    timed("static384 (baseline form)", jax.jit(lambda w, i: case_static(
        w, i, 384)), win, ix)
    timed("static256 (positioning ignored — cost probe only)",
          jax.jit(lambda w, i: case_static(w, i, 256)), win, ix)
    timed("dyn256 (128-aligned dynamic lane start)",
          jax.jit(case_dyn), win, ix)
    timed("roll (O0 + sublane-roll O1, 2 matmuls)",
          jax.jit(case_roll), win, ix)
