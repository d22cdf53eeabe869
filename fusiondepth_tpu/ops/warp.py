"""Multi-warp bilinear sampling in planes layout, with one entry point for
single-chip AND meshed execution.

`warp_planes(sources, grids)` warps every source frame by every scale's
reprojection grid in one call:
  sources: (n_src, B, C, H, W)
  grids:   (n_src, n_scales, B, H, W, 2) normalized grid_sample coords
  returns: (n_src, n_scales, B, C, H, W)

Two backends, same numerics (border padding, align_corners=False, matching
torch F.grid_sample — reference trainer.py:467-470):
  - Pallas banded-window kernel (ops/pallas_warp.py): horizontal bilinear as
    a one-hot-pair MXU matmul, vertical as a masked VPU reduction. Under a
    data-parallel mesh the kernel runs per-shard via `shard_map` on the
    batch axis — the fast path is no longer single-device-only.
  - XLA gather fallback: 4 corner `take_along_axis` gathers per scale with
    the batch axis intact (shards cleanly under GSPMD), used on CPU, for
    heights the banded kernel can't window, and on spatially-sharded meshes.

Gradients flow to `grids` only (the sources are input data in the
photometric loss); the XLA path also differentiates w.r.t. sources if asked.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _data_only_mesh(mesh: Mesh | None, axis: str = "data") -> bool:
    """True if `mesh` shards over a single nontrivial axis named `axis`
    (batch-only data parallelism — what the banded kernel supports)."""
    if mesh is None:
        return False
    if axis not in mesh.axis_names:
        return False
    return all(mesh.shape[a] == 1 for a in mesh.axis_names if a != axis)


def pallas_ok(height: int, width: int) -> bool:
    from fusiondepth_tpu.ops.pallas_warp import RT, WH

    return height % RT == 0 and height >= WH


def warp_planes(sources, grids, *, use_pallas: bool = False,
                precision=jax.lax.Precision.HIGHEST,
                mesh: Mesh | None = None, interpret: bool = False,
                backend: str = "banded"):
    """Warp each source by each grid; see module docstring for shapes.

    use_pallas selects the Pallas kernel (TPU); `backend` picks "banded"
    (one-hot MXU matmuls) or "gather" (tpu.dynamic_gather crossbars) —
    same windowing contract and numerics. `mesh` (a 1-D data mesh) wraps
    the kernel in shard_map over the batch axis. Falls back to the XLA
    gather path when the kernel's windowing preconditions don't hold.
    """
    from fusiondepth_tpu.utils import selection

    n, B, C, H, W = sources.shape
    assert grids.shape[0] == n and grids.shape[2] == B, (sources.shape,
                                                         grids.shape)
    if use_pallas and pallas_ok(H, W) and (mesh is None
                                           or _data_only_mesh(mesh)):
        selection.record(warp=f"pallas_{backend}", warp_meshed=mesh is not None)
        if backend == "gather":
            from fusiondepth_tpu.ops.pallas_warp_gather import (
                _warp_gather as _warp,
            )
        else:
            from fusiondepth_tpu.ops.pallas_warp import _warp

        gx = grids[..., 0].astype(jnp.float32)
        gy = grids[..., 1].astype(jnp.float32)
        ix = jnp.clip(((gx + 1.0) * W - 1.0) * 0.5, 0.0, W - 1)
        iy = jnp.clip(((gy + 1.0) * H - 1.0) * 0.5, 0.0, H - 1)
        coords = jnp.stack([ix, iy], axis=-1)

        if mesh is None:
            out = _warp(coords, sources, interpret, precision)
        else:
            warped_fn = jax.shard_map(
                lambda c, s: _warp(c, s, interpret, precision),
                mesh=mesh,
                in_specs=(P(None, None, "data"), P(None, "data")),
                out_specs=P(None, None, "data"),
                check_vma=False,
            )
            out = warped_fn(coords, sources)
        return out.astype(sources.dtype)

    selection.record(warp="xla_gather_planes", warp_meshed=mesh is not None)
    return warp_planes_xla(sources, grids)


def warp_planes_xla(sources, grids):
    """XLA gather backend: 4 corner gathers per scale over the flattened
    (H*W) axis, batch axis intact so the batch sharding propagates."""
    n, B, C, H, W = sources.shape
    k = grids.shape[1]
    dtype = sources.dtype
    # accumulate in f32, or f64 when the inputs are f64 (torch-oracle parity)
    acc = jnp.promote_types(jnp.result_type(sources, grids), jnp.float32)

    gx = grids[..., 0].astype(acc)
    gy = grids[..., 1].astype(acc)
    ix = jnp.clip(((gx + 1.0) * W - 1.0) * 0.5, 0.0, W - 1)
    iy = jnp.clip(((gy + 1.0) * H - 1.0) * 0.5, 0.0, H - 1)
    x0f = jnp.floor(ix)
    y0f = jnp.floor(iy)
    wx = (ix - x0f)[:, :, :, None]  # (n, k, B, 1, H, W)
    wy = (iy - y0f)[:, :, :, None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)

    flat = sources.reshape(n, B, C, H * W)

    def gather(yi, xi):
        idx = (yi * W + xi).reshape(n, k, B, 1, H * W)
        g = jax.vmap(
            lambda i: jnp.take_along_axis(flat, i, axis=-1),
            in_axes=1, out_axes=1,
        )(idx)
        return g.reshape(n, k, B, C, H, W).astype(acc)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)

    out = (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
           + v10 * (1 - wx) * wy + v11 * wx * wy)
    return out.astype(dtype)
