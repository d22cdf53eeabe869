"""Streaming k-nearest-neighbors as a Pallas TPU kernel.

The XLA path (gdc.knn_brute) materializes each [block, N] distance tile in
HBM between the matmul and lax.top_k — ~N^2 * 4 bytes of round-trip traffic
per frame (~7 GB at GDC's default capacities). This kernel keeps every
distance tile in VMEM: for each query block it streams column tiles of the
point set, computes the partial distance matrix on the MXU, and folds it
into a running top-k carried through the loop — HBM traffic drops to the
points themselves.

Exact (not approximate) k-selection: per tile, k rounds of paired
(min value, min id) extraction on the VPU — two reductions per round,
exact under ties because (value, id) pairs are unique — then a narrow
(BLOCK_Q, 2k) merge against the carried top-k.

Measured on v5e at GDC scale (N=40960, k=10) with true-sync timing:
36.8 ms vs 77.7 ms for the XLA matmul+top_k path (2.1x) — gdc_correct
dispatches to this kernel on TPU (gdc._knn_dispatch).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 256  # query rows per grid step
TILE_C = 2048  # point columns per streamed tile

_BIG_I = 2**30  # plain int: a jnp scalar would be captured as a constant
# by pallas_call, which Mosaic rejects


def _extract_k(vals, ids, k: int):
    """k rounds of (min, matching id) extraction over (BQ, C) candidates.

    Exact under ties: (value, id) pairs are unique by construction, and the
    mask removes exactly the (min value, min id of the tied set) entry.
    Two reductions per round (f32 min + int min) — cheaper than the
    argmin + one-hot + sum formulation (3 reductions + wider selects).
    """
    out_v, out_i = [], []
    for _ in range(k):
        m = jnp.min(vals, axis=1)  # (BQ,)
        is_m = vals == m[:, None]
        idx = jnp.min(jnp.where(is_m, ids, _BIG_I), axis=1)
        out_v.append(m)
        out_i.append(idx)
        vals = jnp.where(is_m & (ids == idx[:, None]), jnp.inf, vals)
    return (jnp.stack(out_v, axis=1),
            jnp.stack(out_i, axis=1).astype(jnp.int32))


def _knn_kernel(q_ref, pts_ref, out_ref, *, k: int, n_points: int):
    bq = q_ref.shape[0]
    qi = pl.program_id(0)

    q = q_ref[:]  # (BQ, 3)
    qsq = (q * q).sum(axis=1, keepdims=True)  # (BQ, 1)
    row_ids = qi * bq + jax.lax.broadcasted_iota(
        jnp.int32, (bq, TILE_C), 0)

    n_tiles = n_points // TILE_C

    def tile_body(t, carry):
        best_v, best_i = carry  # (BQ, k) each
        c = pts_ref[pl.ds(t * TILE_C, TILE_C), :]  # (TC, 3)
        csq = (c * c).sum(axis=1)  # (TC,)
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

        # top-k inside the tile, then merge with the carried top-k on a
        # narrow (BQ, 2k) matrix — avoids rebuilding (BQ, TC + k) buffers
        tile_v, tile_i = _extract_k(d2, col_ids, k)
        return _extract_k(jnp.concatenate([best_v, tile_v], axis=1),
                          jnp.concatenate([best_i, tile_i], axis=1), k)

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
