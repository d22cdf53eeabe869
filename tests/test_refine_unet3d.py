"""Sparse voxel U-Net: downsample invariants + full forward."""

import numpy as np
import jax
import jax.numpy as jnp

from fusiondepth_tpu.models.refine_net3d import (
    RefineNet3DUNet,
    build_voxel_pyramid,
    depth_to_voxels,
    voxel_downsample,
)


def _scene(H=16, W=24, cap=1024):
    depth = jnp.full((H, W), 10.0) + 0.05 * jnp.arange(W)[None, :]
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 20.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    inv_K = jnp.array(np.linalg.inv(K))
    return depth_to_voxels(depth, inv_K, 0.5, cap), (H, W)


def test_voxel_downsample_halves_coords():
    (coords, feats, valid, p2v, keys), _ = _scene()
    pcoords, pkeys, pvalid, pfeats, c2p = voxel_downsample(
        coords, keys, valid, feats, 512)
    n_child = int(valid.sum())
    n_parent = int(pvalid.sum())
    assert 0 < n_parent <= n_child
    # every valid child maps to a valid parent at its halved coords
    c = np.asarray(coords)[np.asarray(valid)]
    pc_expect = np.floor_divide(c, 2)
    parents = np.asarray(pcoords)[np.asarray(c2p)[np.asarray(valid)]]
    np.testing.assert_array_equal(parents, pc_expect)


def test_unet_forward_finite_tanh():
    (coords, feats, valid, p2v, keys), (H, W) = _scene()
    tables, c2p = build_voxel_pyramid(coords, keys, valid, levels=4,
                                      capacity=coords.shape[0])
    net = RefineNet3DUNet(widths=(8, 16, 32, 32, 32))
    vs = net.init(jax.random.PRNGKey(0), feats, tables, c2p)
    out = net.apply(vs, feats, tables, c2p)
    o = np.asarray(out)
    assert o.shape == (coords.shape[0], 1)
    assert np.isfinite(o).all()
    assert (np.abs(o) <= 1.0).all()


def test_unet_grads_flow():
    (coords, feats, valid, p2v, keys), _ = _scene(cap=512)
    tables, c2p = build_voxel_pyramid(coords, keys, valid, levels=2,
                                      capacity=coords.shape[0])
    net = RefineNet3DUNet(widths=(8, 16, 16))
    vs = net.init(jax.random.PRNGKey(0), feats, tables, c2p)

    def loss(params):
        return (net.apply(params, feats, tables, c2p) ** 2).sum()

    g = jax.grad(loss)(vs)
    assert sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g)) > 0
