"""GDC cross-check against a faithful numpy/scipy re-implementation of the
reference solver (reference gdc_old.py:74-250): scipy cKDTree KNN, batched
dense (k+2)x(k+2) KKT solves, CSR 4-block W assembly, CG on the normal
equations. The jitted fixed-capacity solver must reproduce the oracle's
masks, weights, and corrected depths on a realistic synthetic frame."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import sparse
from scipy.sparse import csr_matrix
from scipy.sparse import eye as seye
from scipy.sparse.linalg import LinearOperator, cg
from scipy.spatial import cKDTree

from fusiondepth_tpu.gdc.gdc import GDCCalib, gdc_correct

H, W = 48, 160
K_NN = 10
W_TOL = 3e-5
RECON_TOL = 5e-4
RANGE_DEG = (-10.0, 10.0)
DEPTH_AGREE = 2.0


class _Calib:
    c_u, c_v = W / 2.0, H / 2.0
    f_u, f_v = 120.0, 120.0
    b_x, b_y = 0.0, 0.0


def _unproject(depth):
    """Same unprojection as the solver/reference depth2ptc
    (gdc_old.py:66-71 via kitti_util_from_pse.py:204-216)."""
    c, r = np.meshgrid(np.arange(W), np.arange(H))
    z = depth
    x = (c - _Calib.c_u) * z / _Calib.f_u + _Calib.b_x
    y = (r - _Calib.c_v) * z / _Calib.f_v + _Calib.b_y
    return np.stack([x.ravel(), y.ravel(), z.ravel()], 1)


def _filter_mask(ptc):
    return ((ptc[:, 2] < 80) & (ptc[:, 2] > 1)
            & (ptc[:, 0] < 40) & (ptc[:, 0] >= -40)
            & (ptc[:, 1] < 2.5) & (ptc[:, 1] >= -1))


def _theta_mask(ptc, low, high):
    d = np.sqrt((ptc ** 2).sum(1))
    theta = np.arcsin(ptc[:, 1] / np.maximum(d, 1e-9))
    return (theta >= low) & (theta < high)


def gdc_oracle(pred_depth, gt_depth):
    """Line-for-line numpy port of reference GDC (gdc_old.py:108-245)."""
    ptc = _unproject(pred_depth)
    ptc_gt = _unproject(gt_depth)

    consider_PL = (_filter_mask(ptc) & _theta_mask(
        ptc, np.radians(RANGE_DEG[0]), np.radians(RANGE_DEG[1]))
    ).reshape(pred_depth.shape)
    consider_L = _filter_mask(ptc_gt).reshape(gt_depth.shape)
    gt_mask = consider_L & consider_PL
    gt_mask[gt_mask] &= (np.abs(pred_depth[gt_mask] - gt_depth[gt_mask])
                         < DEPTH_AGREE)
    pred_mask = ~gt_mask & consider_PL

    x_info = np.concatenate((pred_depth[pred_mask], pred_depth[gt_mask]))
    gt_info = gt_depth[gt_mask]
    N_PL, N_L = int(pred_mask.sum()), int(gt_mask.sum())
    pts = np.concatenate(
        (ptc[pred_mask.reshape(-1)], ptc[gt_mask.reshape(-1)]))

    tree = cKDTree(pts)
    neighbors = tree.query(pts, k=K_NN + 1)[1][:, 1:]

    As = np.zeros((N_PL + N_L, K_NN + 2, K_NN + 2))
    bs = np.zeros((N_PL + N_L, K_NN + 2))
    As[:, :K_NN, :K_NN] = np.eye(K_NN) * (1 + W_TOL)
    As[:, K_NN + 1, :K_NN] = 1
    As[:, :K_NN, K_NN + 1] = 1
    bs[:, K_NN + 1] = 1
    bs[:, K_NN] = x_info
    As[:, K_NN, :K_NN] = x_info[neighbors]
    As[:, :K_NN, K_NN] = x_info[neighbors]
    # (the reference's np.linalg.solve(As, bs) relied on pre-2.0 numpy
    # vector-broadcast semantics; the explicit trailing axis is identical)
    Wm = np.linalg.solve(As, bs[..., None])[..., 0][:, :K_NN]

    def blk(rows, col_sel, col_off, shape):
        idx = col_sel
        indptr = np.concatenate(([0], np.cumsum(idx.sum(1))))
        return csr_matrix((Wm[rows][idx], neighbors[rows][idx] - col_off,
                           indptr), shape=shape)

    top, bot = slice(0, N_PL), slice(N_PL, N_PL + N_L)
    W_PLPL = blk(top, neighbors[top] < N_PL, 0, (N_PL, N_PL))
    W_LPL = blk(top, neighbors[top] >= N_PL, N_PL, (N_PL, N_L))
    W_PLL = blk(bot, neighbors[bot] < N_PL, 0, (N_L, N_PL))
    W_LL = blk(bot, neighbors[bot] >= N_PL, N_PL, (N_L, N_L))

    A = sparse.vstack((seye(N_PL) - W_PLPL, W_PLL))
    b = np.concatenate((W_LPL.dot(gt_info), gt_info - W_LL.dot(gt_info)))
    ATA = LinearOperator((N_PL, N_PL), matvec=lambda x: A.T.dot(A.dot(x)))
    x_new, _ = cg(ATA, A.T.dot(b), x0=x_info[:N_PL], rtol=RECON_TOL)

    out = pred_depth.copy()
    out[pred_mask] = x_new
    out[gt_depth > 0] = gt_depth[gt_depth > 0]
    return out, pred_mask, gt_mask, Wm, neighbors, x_info


@pytest.fixture(scope="module")
def scene():
    """Smooth wall+slope depth with sparse anchor rows, scaled 5% off."""
    rng = np.random.default_rng(7)
    c, r = np.meshgrid(np.arange(W), np.arange(H))
    true_depth = (8.0 + 10.0 * (r / H) + 2.0 * np.sin(c / 17.0)
                  ).astype(np.float64)
    pred_depth = true_depth * 1.05 + rng.normal(0, 0.01, true_depth.shape)
    gt_depth = np.full_like(true_depth, -1.0)
    for row in (18, 26, 34, 42):
        hit = rng.uniform(size=W) < 0.35
        gt_depth[row, hit] = true_depth[row, hit]
    return pred_depth, gt_depth


def _run_ours(pred_depth, gt_depth, cap_pl=8192, cap_l=512):
    calib = GDCCalib(*[jnp.float32(v) for v in (
        _Calib.c_u, _Calib.c_v, _Calib.f_u, _Calib.f_v,
        _Calib.b_x, _Calib.b_y)])
    out, info = gdc_correct(
        jnp.asarray(pred_depth, jnp.float32),
        jnp.asarray(gt_depth, jnp.float32), calib,
        k=K_NN, W_tol=W_TOL, recon_tol=RECON_TOL,
        consider_range=RANGE_DEG, depth_agree=DEPTH_AGREE,
        cap_pl=cap_pl, cap_l=cap_l, maxiter=400, return_info=True)
    return np.asarray(out), info


def test_matches_reference_oracle(scene):
    pred_depth, gt_depth = scene
    oracle_out, pred_mask, gt_mask, Wm, neighbors, x_info = gdc_oracle(
        pred_depth, gt_depth)
    ours, info = _run_ours(pred_depth, gt_depth)

    # identical masked point counts
    assert int(info["n_pl"]) == int(pred_mask.sum())
    assert int(info["n_l"]) == int(gt_mask.sum())
    assert not bool(info["overflow"])

    # corrected depths match the scipy solution closely; both solvers pull
    # the 5%-inflated prediction back towards the anchors
    changed = pred_mask & np.isfinite(oracle_out)
    diff = np.abs(ours[changed] - oracle_out[changed])
    rel = diff / np.abs(oracle_out[changed])
    assert float(np.median(rel)) < 2e-3, float(np.median(rel))
    assert float(rel.mean()) < 1e-2, float(rel.mean())

    # exact LiDAR pasted verbatim in both
    np.testing.assert_allclose(ours[gt_depth > 0], gt_depth[gt_depth > 0],
                               rtol=1e-6)

    # and both genuinely corrected: error vs truth shrinks
    true_depth = pred_depth / 1.05
    before = np.abs(pred_depth[pred_mask] - true_depth[pred_mask]).mean()
    after = np.abs(ours[pred_mask] - true_depth[pred_mask]).mean()
    assert after < 0.5 * before, (before, after)


def test_overflow_detected(scene):
    pred_depth, gt_depth = scene
    _, info = _run_ours(pred_depth, gt_depth, cap_pl=128, cap_l=8)
    assert bool(info["overflow"])
    assert int(info["n_pl"]) > 128
