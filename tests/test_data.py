"""Tests for host-side data components: KITTI IO, sparsifier, 2-channel
encoding, calibration, synthetic batches."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fusiondepth_tpu.data.kitti_io import (
    project_points_to_depth,
    pad_or_crop,
    read_calib_file,
)
from fusiondepth_tpu.data.calibration import Calibration
from fusiondepth_tpu.data.sparsify import (
    polar_angle_map,
    range_filter,
    sparsify_beams,
)
from fusiondepth_tpu.data.two_channel import (
    expand_two_channel,
    max_pool2,
    ring_offsets,
)


def test_project_points_dedup_min():
    # two points project to the same pixel; the nearer one must win
    P = np.hstack([np.eye(3), np.zeros((3, 1))])  # u = x/z, v = y/z
    H, W = 10, 10
    # pixel (u,v): round(x/z)-1 = 4 -> x/z = 5
    p_far = [5 * 20.0, 5 * 20.0, 20.0, 1.0]
    p_near = [5 * 10.0, 5 * 10.0, 10.0, 1.0]
    velo = np.array([p_far, p_near], np.float64)
    depth = project_points_to_depth(velo, P, (H, W))
    assert depth[4, 4] == 10.0
    assert (depth > 0).sum() == 1


def test_project_points_bounds_and_negative():
    P = np.hstack([np.eye(3), np.zeros((3, 1))])
    velo = np.array([[1000.0, 0, 1.0, 1.0]], np.float64)  # off-image
    depth = project_points_to_depth(velo, P, (8, 8))
    assert (depth == 0).all()


def test_pad_or_crop():
    d = np.ones((375, 1242))
    out = pad_or_crop(d, (384, 1280))
    assert out.shape == (384, 1280)
    # top padded: first 9 rows zero; x centered: 19 both sides
    assert (out[:9] == 0).all()
    assert (out[9:, 19:-19] == 1).all()
    # reference quirk (kitti_utils.py:92-101): the "crop" path pads by the
    # height difference on top then removes exactly 2 rows — it does NOT
    # reach the target height unless the difference is 2
    out2 = pad_or_crop(np.ones((250, 1200)), (248, 1242))
    assert out2.shape == (250, 1242)


def test_calibration_roundtrip():
    calibs = {
        "P_rect_02": np.array(
            [700.0, 0, 600, -300, 0, 700, 180, 1, 0, 0, 1, 0]),
        "R_rect_00": np.eye(3).ravel(),
        "P_rect_03": np.array(
            [700.0, 0, 600, 300, 0, 700, 180, 1, 0, 0, 1, 0]),
    }
    c = Calibration(calibs)
    uvd = np.array([[100.0, 50.0, 20.0], [640.0, 200.0, 5.0]])
    rect = c.project_image_to_rect(uvd)
    uv = c.project_rect_to_image(rect)
    # unprojection ignores the constant P[:,3] offset terms (b_x absorbs
    # P[0,3] but the v row has P[1,3]=1): allow small pixel error
    np.testing.assert_allclose(uv[:, 0], uvd[:, 0], atol=1e-6)
    np.testing.assert_allclose(uv[:, 1], uvd[:, 1], atol=0.5)
    assert c.baseline == pytest.approx(-600.0 / 700.0)


def test_range_filter():
    pts = np.array([
        [10, 0, 0, 1],     # keep
        [130, 0, 0, 1],    # x too far
        [-1, 0, 0, 1],     # behind
        [10, 60, 0, 1],    # y out
        [10, 0, 2.0, 1],   # z out
    ], np.float64)
    assert range_filter(pts).shape[0] == 1


def test_polar_angle_map_bins_points():
    # a point straight ahead at elevation 0: theta = 2deg band
    pts = np.array([[10.0, 0.0, 0.0, 1.0]])
    amap = polar_angle_map(pts, H=64, W=1024)
    filled = amap[..., 0] != -1
    assert filled.sum() == 1
    r, c = np.argwhere(filled)[0]
    # theta = radians(2) - arcsin(0) -> row = 2/0.4 = 5
    assert r == 5
    # phi = radians(45) - 0 -> col = 45/(90/1024) = 512
    assert c == 512


def test_sparsify_beams_selects_rows():
    rng = np.random.default_rng(0)
    n = 5000
    x = rng.uniform(5, 50, n)
    y = rng.uniform(-20, 20, n)
    z = rng.uniform(-2, 1, n)
    pts = np.stack([x, y, z, np.ones(n)], 1)
    out4 = sparsify_beams(pts, nbeams=4)
    out1 = sparsify_beams(pts, nbeams=1)
    assert out4.shape[1] == 4
    assert 0 < len(out1) < len(out4) <= n
    # returned points must be a subset of the input cloud
    assert np.isin(np.round(out4[:, 0], 4),
                   np.round(pts[:, 0].astype(np.float32), 4)).all()


def test_ring_offsets_match_reference_pattern():
    assert set(ring_offsets(1)) == {(1, 0), (-1, 0)}
    assert set(ring_offsets(2)) == {
        (1, 1), (-1, 1), (1, -1), (-1, -1), (2, 0), (-2, 0)}


def _oracle_two_channel(sparse, expand=2, row_range=(76, 190),
                        col_range=(2, 638)):
    """Independent per-target oracle: for each pixel, gather contributions
    from all sources whose ring pattern covers it; max confidence wins,
    ties average."""
    H, W = sparse.shape
    levels = [(1.0, [(0, 0)])] + [
        (1.0 / (d + 1), ring_offsets(d)) for d in range(1, expand + 1)]
    exp = np.zeros((H, W))
    conf = np.zeros((H, W))
    for i in range(H):
        for j in range(W):
            for c, offs in levels:  # highest confidence first
                vals = []
                for dx, dy in offs:
                    si, sj = i - dx, j - dy
                    if (row_range[0] <= si < row_range[1]
                            and col_range[0] <= sj < col_range[1]
                            and sparse[si, sj] != 0):
                        vals.append(sparse[si, sj])
                if vals:
                    exp[i, j] = np.mean(vals)
                    conf[i, j] = c
                    break
    return np.stack([exp, conf], -1)


def test_expand_two_channel_matches_oracle():
    rng = np.random.default_rng(1)
    sparse = np.zeros((192, 64))
    rows = [80, 100, 140, 180]
    for r in rows:
        hits = rng.uniform(size=64) < 0.25
        sparse[r, hits] = rng.uniform(0.05, 0.8, hits.sum())
    out = expand_two_channel(sparse, col_range=(2, 62))
    oracle = _oracle_two_channel(sparse, col_range=(2, 62))
    np.testing.assert_allclose(out, oracle, atol=1e-6)


def test_expand_two_channel_empty():
    out = expand_two_channel(np.zeros((192, 640)))
    assert (out == 0).all()


def test_expand_two_channel_ignores_out_of_window():
    sparse = np.zeros((192, 640))
    sparse[10, 300] = 5.0  # above row window
    out = expand_two_channel(sparse)
    assert (out == 0).all()


def test_max_pool2_matches_torch_ceil():
    rng = np.random.default_rng(2)
    for shape in [(384, 1280), (7, 9)]:
        x = rng.normal(size=shape)
        ours = max_pool2(x)
        theirs = F.max_pool2d(
            torch.tensor(x)[None], 2, ceil_mode=True)[0].numpy()
        np.testing.assert_allclose(ours, theirs)


def test_read_calib_file(tmp_path):
    p = tmp_path / "calib.txt"
    p.write_text("P_rect_02: 1 2 3 4\ncalib_time: 09-Jan\n")
    d = read_calib_file(str(p))
    np.testing.assert_allclose(d["P_rect_02"], [1, 2, 3, 4])
    assert d["calib_time"] == "09-Jan"
