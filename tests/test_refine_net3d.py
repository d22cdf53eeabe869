"""Sparse voxel RefineNet tests: voxelization invariants, neighbor lookup,
and the end-to-end depth -> offset image path."""

import numpy as np
import jax
import jax.numpy as jnp

from fusiondepth_tpu.models.refine_net3d import (
    RefineNet3DShallow,
    _kernel_offsets,
    depth_to_voxels,
    neighbor_table,
    refine_depth_with_net,
    voxelize,
)


def test_voxelize_unique_and_mean():
    pts = jnp.array([
        [0.1, 0.1, 0.1],
        [0.2, 0.2, 0.2],   # same voxel as above at size 0.5
        [1.1, 0.0, 0.0],   # different voxel
    ])
    vals = jnp.array([[1.0], [3.0], [5.0]])
    coords, feats, valid, p2v, keys = voxelize(pts, vals, 0.5, capacity=8)
    assert int(valid.sum()) == 2
    # mean-pooled feature for the shared voxel
    v = np.asarray(feats)[np.asarray(valid)]
    assert sorted(v[:, 0].tolist()) == [2.0, 5.0]
    # both first points map to the same voxel slot
    p = np.asarray(p2v)
    assert p[0] == p[1] != p[2]


def test_neighbor_table_finds_adjacent():
    pts = jnp.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0], [5.0, 5.0, 5.0]])
    vals = jnp.ones((3, 1))
    coords, feats, valid, p2v, keys = voxelize(pts, vals, 0.5, capacity=8)
    nb = np.asarray(neighbor_table(coords, keys, valid,
                                   _kernel_offsets(3)))
    center = 13  # offset (0,0,0) in the 27-list
    v = np.asarray(valid)
    # every valid voxel finds itself
    assert (nb[v, center] == np.arange(len(v))[v]).all()
    # voxel 0 and 1 are x-adjacent: each appears in the other's table
    rows = nb[v]
    assert (rows[0] >= 0).sum() >= 2


def test_refine_depth_end_to_end():
    H, W = 16, 24
    depth = jnp.full((H, W), 10.0) + 0.01 * jnp.arange(W)[None, :]
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 20.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    inv_K = jnp.array(np.linalg.inv(K))

    net = RefineNet3DShallow()
    coords, feats, valid, p2v, keys = depth_to_voxels(
        depth, inv_K, 0.5, 1024)
    nb = neighbor_table(coords, keys, valid, _kernel_offsets(3))
    vs = net.init(jax.random.PRNGKey(0), feats, nb, valid)

    out = refine_depth_with_net(net, vs, depth, inv_K, 0.5, 1024)
    assert out.shape == (H, W)
    o = np.asarray(out)
    assert np.isfinite(o).all()
    assert (np.abs(o) <= 1.0).all()  # tanh range


def test_refine_net3d_grads_flow():
    net = RefineNet3DShallow()
    feats = jnp.ones((64, 2))
    valid = jnp.arange(64) < 40
    coords = jnp.stack([jnp.arange(64), jnp.zeros(64), jnp.zeros(64)],
                       axis=1).astype(jnp.int32)
    from fusiondepth_tpu.models.refine_net3d import _KEY_INVALID, _encode
    keys = jnp.sort(jnp.where(valid, _encode(coords), _KEY_INVALID))
    nb = neighbor_table(coords, keys, valid, _kernel_offsets(3))
    vs = net.init(jax.random.PRNGKey(0), feats, nb, valid)

    def loss(params):
        return (net.apply(params, feats, nb, valid) ** 2).sum()

    g = jax.grad(loss)(vs)
    assert sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g)) > 0
