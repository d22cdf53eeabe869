"""Golden-value tests for the core ops against torch CPU references.

torch here is only the oracle for operator semantics (grid_sample, avg_pool,
interpolate) — the framework itself never imports torch on the compute path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from fusiondepth_tpu.ops import (
    disp_to_depth,
    depth_errors,
    rot_from_axisangle,
    transformation_from_parameters,
    backproject_depth,
    project_3d,
    cat_xy,
    grid_sample,
    ssim,
    resize_bilinear,
    upsample2x_nearest,
    reprojection_loss,
    smoothness_loss,
    si_loss,
)

RNG = np.random.default_rng(0)


def nchw(x_nhwc):
    return torch.from_numpy(np.moveaxis(np.asarray(x_nhwc), -1, 1).copy())


def nhwc(x_nchw_t):
    return np.moveaxis(x_nchw_t.numpy(), 1, -1)


def test_disp_to_depth_range():
    disp = jnp.array([0.0, 0.5, 1.0])
    scaled, depth = disp_to_depth(disp, 0.1, 100.0)
    np.testing.assert_allclose(depth[0], 100.0, rtol=1e-6)
    np.testing.assert_allclose(depth[2], 0.1, rtol=1e-6)
    np.testing.assert_allclose(scaled, 1.0 / depth, rtol=1e-6)


def test_rot_from_axisangle_matches_rodrigues():
    vec = RNG.normal(size=(4, 3)).astype(np.float32) * 0.3
    R = np.asarray(rot_from_axisangle(jnp.array(vec)))
    for i in range(4):
        theta = np.linalg.norm(vec[i])
        axis = vec[i] / (theta + 1e-7)
        K = np.array(
            [
                [0, -axis[2], axis[1]],
                [axis[2], 0, -axis[0]],
                [-axis[1], axis[0], 0],
            ]
        )
        R_ref = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K
        np.testing.assert_allclose(R[i, :3, :3], R_ref, atol=1e-5)
        np.testing.assert_allclose(R[i, 3, 3], 1.0)


def test_transformation_invert_is_inverse():
    aa = jnp.array(RNG.normal(size=(3, 3)).astype(np.float32) * 0.2)
    t = jnp.array(RNG.normal(size=(3, 3)).astype(np.float32))
    T = np.asarray(transformation_from_parameters(aa, t, invert=False))
    Ti = np.asarray(transformation_from_parameters(aa, t, invert=True))
    prod = T @ Ti  # compose in numpy: full fp64 precision for the check
    for i in range(3):
        np.testing.assert_allclose(prod[i], np.eye(4), atol=1e-5)


def test_backproject_project_roundtrip():
    """Projecting backprojected points with identity pose returns the pixel grid."""
    B, H, W = 2, 12, 20
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 30.0, 25.0, W / 2, H / 2
    Kb = jnp.array(np.broadcast_to(K, (B, 4, 4)))
    inv_Kb = jnp.array(np.broadcast_to(np.linalg.inv(K), (B, 4, 4)))
    depth = jnp.array(RNG.uniform(1, 50, size=(B, H, W)).astype(np.float32))

    pts = backproject_depth(depth, inv_Kb)
    assert pts.shape == (B, H, W, 3)
    grid = np.asarray(project_3d(pts, Kb, jnp.eye(4)[None].repeat(B, 0)))

    xs = (np.arange(W) / (W - 1) - 0.5) * 2
    ys = (np.arange(H) / (H - 1) - 0.5) * 2
    np.testing.assert_allclose(grid[0, 0, :, 0], xs, atol=1e-4)
    np.testing.assert_allclose(grid[0, :, 0, 1], ys, atol=1e-4)


def test_cat_xy_normalization():
    B, H, W = 1, 8, 8
    inv_K = jnp.eye(4)[None]
    depth = jnp.full((B, H, W), 40.0)
    out = np.asarray(cat_xy(depth, inv_K))
    # z = 40 -> (z - 40)/40 = 0
    np.testing.assert_allclose(out[..., 2], 0.0, atol=1e-5)
    # x = depth * px / 30
    np.testing.assert_allclose(out[0, 0, 3, 0], 40.0 * 3 / 30.0, rtol=1e-5)
    np.testing.assert_allclose(out[0, 5, 0, 1], 40.0 * 5 / 2.0, rtol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_grid_sample_matches_torch(seed):
    rng = np.random.default_rng(seed)
    B, H, W, C = 2, 10, 14, 3
    img = rng.normal(size=(B, H, W, C)).astype(np.float32)
    # include out-of-range coords to exercise border padding
    grid = rng.uniform(-1.4, 1.4, size=(B, 6, 8, 2)).astype(np.float32)

    ours = np.asarray(grid_sample(jnp.array(img), jnp.array(grid)))
    theirs = F.grid_sample(
        nchw(img), torch.from_numpy(grid),
        mode="bilinear", padding_mode="border", align_corners=False,
    )
    np.testing.assert_allclose(ours, nhwc(theirs), atol=1e-5)


def test_grid_sample_exact_corners():
    img = np.arange(12, dtype=np.float32).reshape(1, 3, 4, 1)
    # grid coordinate of pixel (0,0): g = (2*0+1)/size - 1
    gx00 = 2 * 0.5 / 4 - 1
    gy00 = 2 * 0.5 / 3 - 1
    grid = np.array([[[[gx00, gy00]]]], dtype=np.float32)
    out = np.asarray(grid_sample(jnp.array(img), jnp.array(grid)))
    np.testing.assert_allclose(out[0, 0, 0, 0], 0.0, atol=1e-6)


def test_ssim_matches_torch_reference():
    """Oracle: the reference SSIM formula built from torch primitives."""
    rng = np.random.default_rng(2)
    x = rng.uniform(size=(2, 12, 16, 3)).astype(np.float32)
    y = rng.uniform(size=(2, 12, 16, 3)).astype(np.float32)

    ours = np.asarray(ssim(jnp.array(x), jnp.array(y)))

    xt, yt = nchw(x), nchw(y)
    refl = torch.nn.ReflectionPad2d(1)
    pool = torch.nn.AvgPool2d(3, 1)
    xt, yt = refl(xt), refl(yt)
    mu_x, mu_y = pool(xt), pool(yt)
    sigma_x = pool(xt**2) - mu_x**2
    sigma_y = pool(yt**2) - mu_y**2
    sigma_xy = pool(xt * yt) - mu_x * mu_y
    n = (2 * mu_x * mu_y + 0.01**2) * (2 * sigma_xy + 0.03**2)
    d = (mu_x**2 + mu_y**2 + 0.01**2) * (sigma_x + sigma_y + 0.03**2)
    theirs = torch.clamp((1 - n / d) / 2, 0, 1)

    np.testing.assert_allclose(ours, nhwc(theirs), atol=1e-5)


@pytest.mark.parametrize("size", [(24, 32), (5, 7), (19, 29)])
def test_resize_bilinear_matches_torch(size):
    rng = np.random.default_rng(3)
    img = rng.normal(size=(2, 12, 16, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.array(img), *size))
    theirs = F.interpolate(nchw(img), size, mode="bilinear", align_corners=False)
    np.testing.assert_allclose(ours, nhwc(theirs), atol=1e-5)


def test_upsample2x_nearest_matches_torch():
    rng = np.random.default_rng(4)
    img = rng.normal(size=(1, 5, 6, 2)).astype(np.float32)
    ours = np.asarray(upsample2x_nearest(jnp.array(img)))
    theirs = F.interpolate(nchw(img), scale_factor=2, mode="nearest")
    np.testing.assert_allclose(ours, nhwc(theirs), atol=1e-6)


def test_smoothness_loss_matches_torch_formula():
    rng = np.random.default_rng(5)
    disp = rng.uniform(size=(2, 8, 10, 1)).astype(np.float32)
    img = rng.uniform(size=(2, 8, 10, 3)).astype(np.float32)
    ours = float(smoothness_loss(jnp.array(disp), jnp.array(img)))

    d, i = nchw(disp), nchw(img)
    gdx = torch.abs(d[:, :, :, :-1] - d[:, :, :, 1:])
    gdy = torch.abs(d[:, :, :-1, :] - d[:, :, 1:, :])
    gix = torch.mean(torch.abs(i[:, :, :, :-1] - i[:, :, :, 1:]), 1, keepdim=True)
    giy = torch.mean(torch.abs(i[:, :, :-1, :] - i[:, :, 1:, :]), 1, keepdim=True)
    theirs = (gdx * torch.exp(-gix)).mean() + (gdy * torch.exp(-giy)).mean()
    np.testing.assert_allclose(ours, float(theirs), rtol=1e-5)


def test_reprojection_loss_shape_and_zero():
    x = jnp.array(RNG.uniform(size=(1, 8, 8, 3)).astype(np.float32))
    out = reprojection_loss(x, x)
    assert out.shape == (1, 8, 8, 1)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_si_loss_masked():
    depth = jnp.full((1, 4, 4), 10.0)
    ref = jnp.full((1, 4, 4), 10.0)
    assert float(si_loss(depth, ref)) == pytest.approx(0.0, abs=1e-6)
    # no valid pixels -> 0, not nan
    assert float(si_loss(depth, jnp.zeros((1, 4, 4)))) == 0.0
    # known value: d = log(10) - log(8) on all 16 px (|diff|=2 < threshold=5)
    ref2 = jnp.full((1, 4, 4), 8.0)
    d = np.log(10.0) - np.log(8.0)
    expect = np.sqrt(d**2 - 0.3 * d**2) * 0.1
    np.testing.assert_allclose(float(si_loss(depth, ref2)), expect, rtol=1e-5)


def test_depth_errors_perfect():
    gt = jnp.array(RNG.uniform(1, 50, size=(100,)).astype(np.float32))
    m = depth_errors(gt, gt)
    assert m["de/abs_rel"] == 0.0
    assert m["da/a1"] == 1.0


def test_depth_errors_masked_matches_subset():
    gt = np.array([1.0, 2.0, 4.0, 8.0], np.float32)
    pred = np.array([1.1, 1.9, 4.4, 100.0], np.float32)
    mask = np.array([1, 1, 1, 0], np.float32)
    m = depth_errors(jnp.array(gt), jnp.array(pred), jnp.array(mask))
    m_sub = depth_errors(jnp.array(gt[:3]), jnp.array(pred[:3]))
    for k in m:
        np.testing.assert_allclose(float(m[k]), float(m_sub[k]), rtol=1e-5)


def test_grid_sample_grad_flows():
    img = jnp.ones((1, 6, 6, 1))
    grid = jnp.zeros((1, 3, 3, 2))

    def f(g):
        return grid_sample(img * 2.0, g).sum()

    g = jax.grad(f)(grid)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("shape", [(2, 32, 64, 8), (1, 33, 65, 4)])
def test_max_pool_3x3s2_matches_torch(shape):
    """The ResNet stem pool (torch MaxPool2d(3, 2, padding=1)): forward
    bit-exact vs torch, and the custom-VJP backward matches torch's
    gradient wherever the window max is unique."""
    from fusiondepth_tpu.ops.pooling import max_pool_3x3s2

    x = RNG.standard_normal(shape).astype(np.float32)
    xj = jnp.asarray(x)
    out = max_pool_3x3s2(xj)
    xt = nchw(x).requires_grad_(True)
    yt = F.max_pool2d(xt, 3, 2, 1)
    np.testing.assert_array_equal(np.asarray(out), nhwc(yt.detach()))

    g = RNG.standard_normal(out.shape).astype(np.float32)
    _, vjp = jax.vjp(max_pool_3x3s2, xj)
    gin = np.asarray(vjp(jnp.asarray(g))[0])
    yt.backward(nchw(g))
    np.testing.assert_allclose(gin, nhwc(xt.grad.detach()), atol=1e-6)


def test_max_pool_3x3s2_tie_gradient_conserved():
    """On exact ties the custom VJP splits g/count among all argmaxes —
    per-window gradient mass is conserved (sum of grad-in == sum of g)."""
    from fusiondepth_tpu.ops.pooling import max_pool_3x3s2

    x = jnp.ones((1, 8, 8, 4), jnp.float32)
    out = max_pool_3x3s2(x)
    g = jnp.asarray(RNG.standard_normal(out.shape).astype(np.float32))
    _, vjp = jax.vjp(max_pool_3x3s2, x)
    gin = vjp(g)[0]
    np.testing.assert_allclose(float(gin.sum()), float(g.sum()), rtol=1e-5)
