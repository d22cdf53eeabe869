"""Streaming k-nearest-neighbors as a Pallas TPU kernel.

The XLA path (gdc.knn_brute) materializes each [block, N] distance tile in
HBM between the matmul and lax.top_k — ~N^2 * 4 bytes of round-trip traffic
per frame (~7 GB at GDC's default capacities). This kernel keeps every
distance tile in VMEM: for each query block it streams column tiles of the
point set, computes the partial distance matrix on the MXU, and folds it
into a running top-k carried through the loop — HBM traffic drops to the
points themselves.

Exact (not approximate) k-selection: per tile, k rounds of min+mask over
the [BLOCK_Q, TILE_C + k] candidate matrix on the VPU.

Measured on v5e at GDC scale (N=40960, k=10): 106 ms vs 93 ms for the XLA
matmul+top_k path — the VPU k-pass selection costs more than the HBM
traffic it saves on this chip, so gdc_correct keeps the XLA path by
default; this kernel is the building block for fusing KNN into a larger
pipeline where the distance tiles must stay in VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 256  # query rows per grid step
TILE_C = 1024  # point columns per streamed tile


def _knn_kernel(q_ref, pts_ref, out_ref, *, k: int, n_points: int):
    bq = q_ref.shape[0]
    qi = pl.program_id(0)

    q = q_ref[:]  # (BQ, 3)
    row_ids = qi * bq + jax.lax.broadcasted_iota(
        jnp.int32, (bq, TILE_C), 0)

    n_tiles = n_points // TILE_C

    def tile_body(t, carry):
        best_v, best_i = carry  # (BQ, k) each
        c = pts_ref[pl.ds(t * TILE_C, TILE_C), :]  # (TC, 3)
        csq = (c * c).sum(axis=1)  # (TC,)
        qsq = (q * q).sum(axis=1, keepdims=True)  # (BQ, 1)
        # HIGHEST precision: default MXU f32 rounds inputs to bf16, which
        # corrupts near-tie neighbor distances
        qc = jax.lax.dot_general(
            q, c, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        d2 = qsq - 2.0 * qc + csq[None, :]
        col_ids = t * TILE_C + jax.lax.broadcasted_iota(
            jnp.int32, (bq, TILE_C), 1)
        d2 = jnp.where(row_ids == col_ids, jnp.inf, d2)  # exclude self

        comb_v = jnp.concatenate([best_v, d2], axis=1)  # (BQ, k+TC)
        comb_i = jnp.concatenate([best_i, col_ids], axis=1)
        pos = jax.lax.broadcasted_iota(
            jnp.int32, comb_v.shape, 1)

        new_v = []
        new_i = []
        for _ in range(k):
            a = jnp.argmin(comb_v, axis=1)  # (BQ,)
            m = jnp.min(comb_v, axis=1)
            sel = pos == a[:, None]
            new_v.append(m)
            new_i.append(jnp.sum(jnp.where(sel, comb_i, 0), axis=1))
            comb_v = jnp.where(sel, jnp.inf, comb_v)
        return (jnp.stack(new_v, axis=1),
                jnp.stack(new_i, axis=1).astype(jnp.int32))

    init = (jnp.full((bq, k), jnp.inf, jnp.float32),
            jnp.zeros((bq, k), jnp.int32))
    _, best_i = jax.lax.fori_loop(0, n_tiles, tile_body, init)
    out_ref[:] = best_i


@partial(jax.jit, static_argnames=("k",))
def knn_pallas(points, k: int = 10):
    """Exact KNN indices (N, k), excluding self. N must be a multiple of
    TILE_C (GDC's fixed capacities are); invalid points must already sit at
    far sentinel coordinates (same contract as gdc.knn_brute)."""
    N = points.shape[0]
    assert N % TILE_C == 0 and N % BLOCK_Q == 0, (
        f"N={N} must be a multiple of {TILE_C}")
    pts = points.astype(jnp.float32)

    grid = (N // BLOCK_Q,)
    return pl.pallas_call(
        partial(_knn_kernel, k=k, n_points=N),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_Q, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_Q, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, k), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * N * 3,
            bytes_accessed=N * 3 * 4 * (N // BLOCK_Q) + N * k * 4,
            transcendentals=0,
        ),
    )(pts, pts)
