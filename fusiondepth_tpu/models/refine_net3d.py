"""Sparse voxel 3D refinement nets — the TPU-native equivalent of the
reference's MinkowskiEngine RefineNet family (networks/refine_net.py:13-270;
dead in the shipped config, which uses the dense road=True DepthDecoder
instead — see SURVEY C17 — but part of the model zoo the flags
--refine_shallow/--refineUnet/--refine_deep select).

Design (no sparse-tensor engine needed):
- Voxelize the pseudo-3D point cloud of a depth map into a FIXED-CAPACITY
  unique-voxel list (sort + segment ops; everything static-shaped).
- Sparse 3x3x3 convolution = per-voxel gather of the 27 neighbors (binary
  search over the sorted voxel-key table) followed by one einsum
  (V, 27*C_in) x (27*C_in, C_out) — a single MXU matmul per layer.
- BatchNorm over valid voxels, ReLU, tanh head; the result scatters back to
  the image grid through the per-pixel voxel index.

Implemented variants: RefineNet3DShallow (3 sparse convs, mirrors
RefineNet_shallow, refine_net.py:115-173), RefineNet3DDeep (6 convs,
mirrors RefineNet_deep, :176-270), and RefineNet3DUNet (the 5-down/5-up
sparse U-Net of refine_net.py:13-112): each down level pools children into
parent voxels (coords // 2, fixed-capacity unique list) and convolves at
the coarser scale; each up level gathers the parent features back to the
children, concatenates the skip, and convolves.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# voxel coords are offset into [0, 2R) per axis; R=512 keeps the packed key
# within int32 (jax x64 is disabled by default, so int64 would silently
# truncate): (2R)^3 = 2^30 < 2^31.
_COORD_RANGE = 512
_KEY_INVALID = jnp.iinfo(jnp.int32).max


def _encode(coords):
    """(N, 3) int32 voxel coords -> sortable int32 keys."""
    c = coords.astype(jnp.int32) + _COORD_RANGE
    R = 2 * _COORD_RANGE
    return (c[:, 0] * R + c[:, 1]) * R + c[:, 2]


def voxelize(points, values, voxel_size: float, capacity: int):
    """Quantize a point cloud into a fixed-capacity unique voxel list.

    points: (N, 3) float; values: (N, C) per-point features.
    Returns (voxel_coords (V,3) int32, voxel_feats (V,C) mean-pooled,
    valid (V,), point_to_voxel (N,) index into the voxel list).
    """
    N = points.shape[0]
    coords = jnp.floor(points / voxel_size).astype(jnp.int32)
    coords = jnp.clip(coords, -_COORD_RANGE + 1, _COORD_RANGE - 1)
    keys = _encode(coords)

    order = jnp.argsort(keys)
    sk = keys[order]
    is_first = jnp.concatenate([jnp.array([True]), sk[1:] != sk[:-1]])
    first_pos = jnp.nonzero(is_first, size=capacity, fill_value=N - 1)[0]
    n_vox = is_first.sum()
    valid = jnp.arange(capacity) < n_vox

    vox_keys = jnp.where(valid, sk[first_pos], _KEY_INVALID)
    vox_coords = coords[order][first_pos]

    # segment id per sorted point = rank of its voxel
    seg = jnp.cumsum(is_first) - 1  # (N,)
    seg = jnp.minimum(seg, capacity - 1)
    sorted_vals = values[order]
    sums = jax.ops.segment_sum(sorted_vals, seg, num_segments=capacity)
    cnts = jax.ops.segment_sum(jnp.ones((N, 1)), seg, num_segments=capacity)
    vox_feats = sums / jnp.maximum(cnts, 1.0)

    # map each original point to its voxel slot
    point_seg = jnp.zeros(N, jnp.int32).at[order].set(seg.astype(jnp.int32))
    return vox_coords, vox_feats, valid, point_seg, vox_keys


def neighbor_table(vox_coords, vox_keys, valid,
                   offsets) -> jnp.ndarray:
    """(V, K) neighbor indices into the voxel list (-1 = missing).

    vox_keys must be the sorted unique keys produced by `voxelize`.
    """
    V = vox_coords.shape[0]
    nb = []
    for off in offsets:
        q = _encode(vox_coords + jnp.array(off, jnp.int32)[None])
        q = jnp.where(valid, q, _KEY_INVALID - 1)
        pos = jnp.searchsorted(vox_keys, q)
        pos = jnp.clip(pos, 0, V - 1)
        hit = vox_keys[pos] == q
        nb.append(jnp.where(hit, pos, -1))
    return jnp.stack(nb, axis=1).astype(jnp.int32)


def _kernel_offsets(k: int = 3):
    r = range(-(k // 2), k // 2 + 1)
    return [(a, b, c) for a in r for b in r for c in r]


class SparseConv3D(nn.Module):
    """3x3x3 sparse voxel convolution as gather + one MXU matmul."""

    features: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, neighbors, valid):
        V, C = feats.shape
        K = neighbors.shape[1]
        w = self.param(
            "kernel", nn.initializers.he_normal(),
            (K * C, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        nb = jnp.clip(neighbors, 0, V - 1)
        gathered = feats[nb]  # (V, K, C)
        gathered = jnp.where((neighbors >= 0)[..., None], gathered, 0.0)
        out = jnp.matmul(
            gathered.reshape(V, K * C).astype(self.dtype),
            w.astype(self.dtype),
            precision=jax.lax.Precision.DEFAULT) + b.astype(self.dtype)
        return jnp.where(valid[:, None], out, 0.0)


class VoxelBatchNorm(nn.Module):
    """BatchNorm over valid voxels only."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, valid, train: bool):
        C = feats.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(C))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(C))
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        if train:
            w = valid.astype(jnp.float32)[:, None]
            n = jnp.maximum(w.sum(), 1.0)
            mean = (feats * w).sum(0) / n
            var = (((feats - mean) ** 2) * w).sum(0) / n
            if not self.is_initializing():
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
                ra_var.value = 0.9 * ra_var.value + 0.1 * var
        else:
            mean, var = ra_mean.value, ra_var.value
        out = (feats - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return jnp.where(valid[:, None], out, 0.0)


class _SparseRefineStack(nn.Module):
    """Shared body: N (conv, BN, ReLU) blocks + tanh offset head."""

    widths: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, neighbors, valid, train: bool = False):
        h = feats
        for i, wdt in enumerate(self.widths):
            h = SparseConv3D(wdt, dtype=self.dtype, name=f"conv{i}")(
                h, neighbors, valid)
            h = VoxelBatchNorm(dtype=self.dtype, name=f"bn{i}")(
                h, valid, train)
            h = nn.relu(h)
        off = SparseConv3D(1, dtype=self.dtype, name="head")(
            h, neighbors, valid)
        return jnp.tanh(off)


class RefineNet3DShallow(_SparseRefineStack):
    """3 sparse convs (reference RefineNet_shallow, refine_net.py:115-173)."""

    widths: Sequence[int] = (16, 32, 16)


class RefineNet3DDeep(_SparseRefineStack):
    """6 sparse convs (reference RefineNet_deep, refine_net.py:176-270)."""

    widths: Sequence[int] = (16, 32, 64, 64, 32, 16)


# ---------------------------------------------------------------------------
# Sparse voxel U-Net (the reference's primary RefineNet, refine_net.py:13-112)
# ---------------------------------------------------------------------------


def voxel_downsample(coords, keys, valid, feats, capacity: int):
    """Pool child voxels into parents at coords // 2 (mean features).

    The reference uses strided MinkowskiConvolutions; pool-then-convolve at
    the coarser level is the standard dense-equivalent decomposition and
    keeps every op a fixed-capacity gather/segment op.

    Returns (pcoords, pkeys, pvalid, pfeats, child_to_parent).
    """
    N = coords.shape[0]
    pc = jnp.floor_divide(coords, 2)
    pk = jnp.where(valid, _encode(pc), _KEY_INVALID)

    order = jnp.argsort(pk)
    sk = pk[order]
    is_first = jnp.concatenate([jnp.array([True]), sk[1:] != sk[:-1]])
    # padded children all share _KEY_INVALID -> they collapse into one
    # parent slot that we mark invalid below
    first_pos = jnp.nonzero(is_first, size=capacity, fill_value=N - 1)[0]
    pvalid = (jnp.arange(capacity) < is_first.sum()) & (
        sk[first_pos] != _KEY_INVALID)
    pkeys = jnp.where(pvalid, sk[first_pos], _KEY_INVALID)
    pcoords = pc[order][first_pos]

    seg = jnp.minimum(jnp.cumsum(is_first) - 1, capacity - 1)
    sums = jax.ops.segment_sum(feats[order], seg, num_segments=capacity)
    w = valid[order].astype(jnp.float32)[:, None]
    cnts = jax.ops.segment_sum(w, seg, num_segments=capacity)
    pfeats = jnp.where(pvalid[:, None], sums / jnp.maximum(cnts, 1.0), 0.0)

    child_to_parent = jnp.zeros(N, jnp.int32).at[order].set(
        seg.astype(jnp.int32))
    return pcoords, pkeys, pvalid, pfeats, child_to_parent


def build_voxel_pyramid(coords, keys, valid, levels: int,
                        capacity: int):
    """Per-level tables for the U-Net: (coords, keys, valid, neighbors)
    plus child->parent maps. Level capacities halve per level."""
    offsets = _kernel_offsets(3)
    tables = [{
        "coords": coords, "keys": keys, "valid": valid,
        "nb": neighbor_table(coords, keys, valid, offsets),
    }]
    c2p = []
    feats_placeholder = jnp.zeros((coords.shape[0], 1))
    cur = (coords, keys, valid, feats_placeholder)
    cap = capacity
    for _ in range(levels):
        cap = max(cap // 2, 256)
        pcoords, pkeys, pvalid, _, map_ = voxel_downsample(
            cur[0], cur[1], cur[2], cur[3], cap)
        c2p.append(map_)
        tables.append({
            "coords": pcoords, "keys": pkeys, "valid": pvalid,
            "nb": neighbor_table(pcoords, pkeys, pvalid, offsets),
        })
        cur = (pcoords, pkeys, pvalid,
               jnp.zeros((pcoords.shape[0], 1)))
    return tables, c2p


def _pool_feats(feats, valid, c2p, capacity: int):
    """Mean-pool child features into parent slots via a child->parent map."""
    w = valid.astype(jnp.float32)[:, None]
    sums = jax.ops.segment_sum(feats * w, c2p, num_segments=capacity)
    cnts = jax.ops.segment_sum(w, c2p, num_segments=capacity)
    return sums / jnp.maximum(cnts, 1.0)


class RefineNet3DUNet(nn.Module):
    """Sparse voxel U-Net: `levels` down stages (pool + conv) and mirrored
    up stages (parent gather + skip concat + conv), tanh offset head —
    the TPU-native equivalent of reference RefineNet (refine_net.py:13-112,
    5-down/5-up with MinkowskiConvolution[Transpose]).
    """

    widths: Sequence[int] = (16, 32, 64, 128, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, tables, c2p, train: bool = False):
        L = len(self.widths) - 1
        assert len(tables) >= L + 1 and len(c2p) >= L

        def block(x, nb, valid, width, name):
            x = SparseConv3D(width, dtype=self.dtype,
                             name=f"{name}_conv")(x, nb, valid)
            x = VoxelBatchNorm(dtype=self.dtype, name=f"{name}_bn")(
                x, valid, train)
            return nn.relu(x)

        # encoder
        h = block(feats, tables[0]["nb"], tables[0]["valid"],
                  self.widths[0], "enc0")
        skips = [h]
        for lvl in range(1, L + 1):
            cap = tables[lvl]["coords"].shape[0]
            h = _pool_feats(h, tables[lvl - 1]["valid"], c2p[lvl - 1], cap)
            h = block(h, tables[lvl]["nb"], tables[lvl]["valid"],
                      self.widths[lvl], f"enc{lvl}")
            if lvl < L:
                skips.append(h)

        # decoder
        for lvl in range(L - 1, -1, -1):
            h_child = h[jnp.clip(c2p[lvl], 0, h.shape[0] - 1)]
            h_child = jnp.where(tables[lvl]["valid"][:, None], h_child, 0.0)
            h = jnp.concatenate([h_child, skips[lvl]], axis=-1)
            h = block(h, tables[lvl]["nb"], tables[lvl]["valid"],
                      self.widths[lvl], f"dec{lvl}")

        off = SparseConv3D(1, dtype=self.dtype, name="head")(
            h, tables[0]["nb"], tables[0]["valid"])
        return jnp.tanh(off)


@partial(jax.jit, static_argnames=("voxel_size", "capacity"))
def depth_to_voxels(depth, inv_K, voxel_size: float = 0.5,
                    capacity: int = 16384):
    """(H, W) depth + (4, 4) inv_K -> voxel list + per-pixel voxel index.

    Features per voxel: (mean depth, occupancy=1).
    """
    from fusiondepth_tpu.ops.geometry import backproject_depth

    H, W = depth.shape
    pts = backproject_depth(depth[None], inv_K[None])[0].reshape(-1, 3)
    vals = jnp.stack(
        [depth.reshape(-1), jnp.ones(H * W, depth.dtype)], axis=1)
    return voxelize(pts, vals, voxel_size, capacity)


def refine_depth_with_net(net, variables, depth, inv_K,
                          voxel_size: float = 0.5, capacity: int = 16384,
                          offset_scale: float = 1.0):
    """End-to-end: voxelize -> sparse refine -> per-pixel disparity offset
    image, the dense gather of reference refine_net.py:96-111."""
    H, W = depth.shape
    coords, feats, valid, p2v, keys = depth_to_voxels(
        depth, inv_K, voxel_size, capacity)
    nb = neighbor_table(coords, keys, valid, _kernel_offsets(3))
    off = net.apply(variables, feats, nb, valid)  # (V, 1)
    return (off[:, 0][p2v] * offset_scale).reshape(H, W)
