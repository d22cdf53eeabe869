"""Banded-window Pallas warp vs the gather-based grid_sample: forward and
coordinate gradients must match on smooth (reprojection-like) warps.
Runs the kernel in interpret mode so the CPU test platform covers it."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fusiondepth_tpu.ops.pallas_warp import warp_bilinear_banded
from fusiondepth_tpu.ops.sampling import grid_sample

B, H, W, C = 2, 64, 128, 3


def _smooth_warps(seed=0, n_src=2, n_scales=2):
    """Reprojection-like grids: small smooth offsets (vertical spread well
    inside the WH window), non-integer coordinates."""
    rng = np.random.default_rng(seed)
    srcs = [jnp.asarray(rng.uniform(size=(B, H, W, C)).astype(np.float32))
            for _ in range(n_src)]
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    warps = []
    for s in range(n_src):
        for k in range(n_scales):
            dx = 3.0 * np.sin(ys / 9.0 + s) + 8.3 * (k + 1) / n_scales
            dy = 2.0 * np.cos(xs / 13.0 + k) + 0.37
            # strictly interior: at exactly-clamped border coordinates the
            # derivative has a kink where XLA's clip picks the zero
            # subgradient while this kernel (like finite differences and
            # torch) uses the interior slope — both valid, not comparable
            ix = np.clip(xs + dx, 0.3, W - 1.3)
            iy = np.clip(ys + dy, 0.3, H - 1.3)
            gx = (2 * ix + 1) / W - 1
            gy = (2 * iy + 1) / H - 1
            g = np.broadcast_to(
                np.stack([gx, gy], -1)[None], (B, H, W, 2)).astype(
                np.float32)
            warps.append((s, jnp.asarray(g.copy())))
    return srcs, warps


def test_forward_matches_grid_sample():
    srcs, warps = _smooth_warps()
    outs = warp_bilinear_banded(srcs, warps, interpret=True)
    for (si, g), o in zip(warps, outs):
        ref = grid_sample(srcs[si], g)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                                   atol=2e-5)


def test_grid_gradients_match():
    srcs, warps = _smooth_warps(seed=1, n_src=1, n_scales=1)
    (si, g0) = warps[0]
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))

    def loss_pallas(g):
        (o,) = warp_bilinear_banded(srcs, [(0, g)], interpret=True)
        return (o * w).sum()

    def loss_xla(g):
        return (grid_sample(srcs[0], g) * w).sum()

    gp = jax.grad(loss_pallas)(g0)
    gx = jax.grad(loss_xla)(g0)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-3, atol=1e-3)


def test_source_cotangent_is_zero_by_design():
    srcs, warps = _smooth_warps(seed=3, n_src=1, n_scales=1)

    def loss(src):
        (o,) = warp_bilinear_banded([src], warps, interpret=True)
        return o.sum()

    g = jax.grad(loss)(srcs[0])
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_gather_backend_matches_banded_interpret():
    """The dynamic-gather warp backend (ops/pallas_warp_gather.py) matches
    the banded-MXU kernel exactly — same windowing contract, same
    coordinate cotangents — in interpret mode."""
    import numpy as np

    from fusiondepth_tpu.ops.pallas_warp import _warp
    from fusiondepth_tpu.ops.pallas_warp_gather import _warp_gather

    n, k, B, C, H, W = 2, 2, 1, 3, 64, 128
    rng = np.random.RandomState(0)
    ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    ix = (jj[None, None, None]
          + rng.uniform(-12, 12, (n, k, B, H, W))).clip(0, W - 1)
    iy = (ii[None, None, None]
          + rng.uniform(-4, 4, (n, k, B, H, W))).clip(0, H - 1)
    coords = jnp.asarray(np.stack([ix, iy], -1).astype(np.float32))
    src = jnp.asarray(rng.standard_normal((n, B, C, H, W)).astype(np.float32))
    prec = jax.lax.Precision.HIGHEST

    o_band = _warp(coords, src, True, prec)
    o_gath = _warp_gather(coords, src, True, prec)
    np.testing.assert_allclose(np.asarray(o_gath), np.asarray(o_band),
                               atol=2e-6)

    g = jnp.asarray(rng.standard_normal(o_band.shape).astype(np.float32))
    _, vb = jax.vjp(lambda c: _warp(c, src, True, prec), coords)
    _, vg = jax.vjp(lambda c: _warp_gather(c, src, True, prec), coords)
    np.testing.assert_allclose(np.asarray(vg(g)[0]), np.asarray(vb(g)[0]),
                               atol=1e-5)


def test_gather_backend_multi_strip_interpret():
    """The gather backend's 128-lane strip decomposition (Mosaic only
    lane-gathers a single source vreg) must stay exact when horizontal
    displacements cross strip boundaries (|ix - col| up to ~100 px here,
    inside the documented |d| <= 128 band)."""
    import numpy as np

    from fusiondepth_tpu.ops.pallas_warp import _warp
    from fusiondepth_tpu.ops.pallas_warp_gather import _warp_gather

    n, k, B, C, H, W = 1, 1, 1, 3, 32, 256
    rng = np.random.RandomState(1)
    ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    ix = (jj[None, None, None]
          + rng.uniform(-100, 100, (n, k, B, H, W))).clip(0, W - 1)
    iy = (ii[None, None, None]
          + rng.uniform(-4, 4, (n, k, B, H, W))).clip(0, H - 1)
    coords = jnp.asarray(np.stack([ix, iy], -1).astype(np.float32))
    src = jnp.asarray(rng.standard_normal((n, B, C, H, W)).astype(np.float32))
    prec = jax.lax.Precision.HIGHEST

    o_band = _warp(coords, src, True, prec)
    o_gath = _warp_gather(coords, src, True, prec)
    np.testing.assert_allclose(np.asarray(o_gath), np.asarray(o_band),
                               atol=2e-6)

    g = jnp.asarray(rng.standard_normal(o_band.shape).astype(np.float32))
    _, vb = jax.vjp(lambda c: _warp(c, src, True, prec), coords)
    _, vg = jax.vjp(lambda c: _warp_gather(c, src, True, prec), coords)
    np.testing.assert_allclose(np.asarray(vg(g)[0]), np.asarray(vb(g)[0]),
                               atol=1e-5)


def test_narrow_band_matches_grid_sample(monkeypatch):
    """FUSIONDEPTH_WARP_BW=256 shrinks the per-strip source band to 256
    columns (64-px lead on each side of the strip): exact for
    |ix - col| <= 64 px — still ~6x KITTI-scale reprojection motion — and
    it must equal the XLA gather oracle for displacements inside that
    domain, forward and coordinate gradients, across strip boundaries."""
    monkeypatch.setenv("FUSIONDEPTH_WARP_BW", "256")
    rng = np.random.default_rng(21)
    Hh, Ww = 32, 384
    src = jnp.asarray(rng.uniform(size=(1, Hh, Ww, C)).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(Hh), np.arange(Ww), indexing="ij")
    dx = 50.0 * np.sin(ys / 7.0) + 0.41     # inside the +-64 px domain
    dy = 2.0 * np.cos(xs / 13.0) + 0.2
    ix = np.clip(xs + dx, 0.3, Ww - 1.3)
    iy = np.clip(ys + dy, 0.3, Hh - 1.3)
    gx = (2 * ix + 1) / Ww - 1
    gy = (2 * iy + 1) / Hh - 1
    g = jnp.asarray(np.stack([gx, gy], -1)[None].astype(np.float32))

    (o,) = warp_bilinear_banded([src], [(0, g)], interpret=True)
    ref = grid_sample(src, g)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5)

    w = jnp.asarray(rng.normal(size=(1, Hh, Ww, C)).astype(np.float32))

    def lp(gg):
        (oo,) = warp_bilinear_banded([src], [(0, gg)], interpret=True)
        return (oo * w).sum()

    def lx(gg):
        return (grid_sample(src, gg) * w).sum()

    np.testing.assert_allclose(np.asarray(jax.grad(lp)(g)),
                               np.asarray(jax.grad(lx)(g)),
                               rtol=1e-3, atol=1e-3)


def test_dynamic_band_matches_grid_sample(monkeypatch):
    """FUSIONDEPTH_WARP_BW=dyn256: per-(row, strip) band start = the
    128-aligned floor of the strip's min ix. Exact for ANY flow magnitude
    while the in-strip ix spread fits the band — here a +173 px uniform
    shift plus smooth wiggle, which the STATIC 384 band would clamp
    (|ix-col| > 128). Forward and coordinate gradients vs the XLA gather
    oracle, across strip boundaries."""
    monkeypatch.setenv("FUSIONDEPTH_WARP_BW", "dyn256")
    rng = np.random.default_rng(33)
    Hh, Ww = 32, 384
    src = jnp.asarray(rng.uniform(size=(1, Hh, Ww, C)).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(Hh), np.arange(Ww), indexing="ij")
    dx = 173.0 + 19.0 * np.sin(ys / 7.0)    # way past the static domain
    dy = 2.0 * np.cos(xs / 13.0) + 0.2
    ix = np.clip(xs + dx, 0.3, Ww - 1.3)
    iy = np.clip(ys + dy, 0.3, Hh - 1.3)
    gx = (2 * ix + 1) / Ww - 1
    gy = (2 * iy + 1) / Hh - 1
    g = jnp.asarray(np.stack([gx, gy], -1)[None].astype(np.float32))

    (o,) = warp_bilinear_banded([src], [(0, g)], interpret=True)
    ref = grid_sample(src, g)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5)

    w = jnp.asarray(rng.normal(size=(1, Hh, Ww, C)).astype(np.float32))

    def lp(gg):
        (oo,) = warp_bilinear_banded([src], [(0, gg)], interpret=True)
        return (oo * w).sum()

    def lx(gg):
        return (grid_sample(src, gg) * w).sum()

    np.testing.assert_allclose(np.asarray(jax.grad(lp)(g)),
                               np.asarray(jax.grad(lx)(g)),
                               rtol=1e-3, atol=1e-3)

    # negative-direction flow too (band start clips at 0)
    dx2 = -150.0 - 9.0 * np.sin(ys / 5.0)
    ix2 = np.clip(xs + dx2, 0.3, Ww - 1.3)
    g2 = jnp.asarray(np.stack([(2 * ix2 + 1) / Ww - 1, gy],
                              -1)[None].astype(np.float32))
    (o2,) = warp_bilinear_banded([src], [(0, g2)], interpret=True)
    np.testing.assert_allclose(np.asarray(o2),
                               np.asarray(grid_sample(src, g2)), atol=2e-5)


def test_bf16_source_tent_forward():
    """bf16 sources take the bf16 tent-construction path (_cx_tent builds
    the relu(1-|t|) chain in bf16 after an exact f32 subtract); the result
    must match the f32 gather oracle to bf16 resolution."""
    srcs, warps = _smooth_warps(seed=7, n_src=1, n_scales=2)
    srcs16 = [s.astype(jnp.bfloat16) for s in srcs]
    outs = warp_bilinear_banded(srcs16, warps,
                                interpret=True,
                                precision=jax.lax.Precision.DEFAULT)
    for (si, g), o in zip(warps, outs):
        ref = grid_sample(srcs[si], g)
        np.testing.assert_allclose(np.asarray(o, dtype=np.float32),
                                   np.asarray(ref), atol=2e-2)


def test_subband_skipping_matches_grid_sample_wide():
    """The banded kernel skips LS-wide sub-bands of the 384-column band
    via @pl.when range proofs; at W=384 (3 strips x 3 sub-bands) with
    horizontal displacements up to ~120 px (inside the documented
    |d| <= 128 band) the result must still equal the XLA gather oracle,
    including tents straddling sub-band boundaries."""
    rng = np.random.default_rng(11)
    Hh, Ww = 32, 384
    src = jnp.asarray(rng.uniform(size=(1, Hh, Ww, C)).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(Hh), np.arange(Ww), indexing="ij")
    dx = 120.0 * np.sin(ys / 7.0) + 0.41
    dy = 2.0 * np.cos(xs / 13.0) + 0.2
    ix = np.clip(xs + dx, 0.3, Ww - 1.3)
    iy = np.clip(ys + dy, 0.3, Hh - 1.3)
    gx = (2 * ix + 1) / Ww - 1
    gy = (2 * iy + 1) / Hh - 1
    g = jnp.asarray(np.stack([gx, gy], -1)[None].astype(np.float32))

    (o,) = warp_bilinear_banded([src], [(0, g)], interpret=True)
    ref = grid_sample(src, g)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5)

    w = jnp.asarray(rng.normal(size=(1, Hh, Ww, C)).astype(np.float32))

    def lp(gg):
        (oo,) = warp_bilinear_banded([src], [(0, gg)], interpret=True)
        return (oo * w).sum()

    def lx(gg):
        return (grid_sample(src, gg) * w).sum()

    np.testing.assert_allclose(np.asarray(jax.grad(lp)(g)),
                               np.asarray(jax.grad(lx)(g)),
                               rtol=1e-3, atol=1e-3)


def test_stereo_discontinuity_clamp_and_auto_band(monkeypatch):
    """Out-of-domain telemetry + the stereo auto-widening (VERDICT r4
    weak #5): a stereo-scale disparity field with a depth discontinuity
    (near-field foreground ~185 px disparity over a ~6 px background —
    fx*baseline/z at early-training depths) exceeds dyn256's in-strip
    spread domain. band_clamp_fraction must DETECT it, dyn384 must be
    exact on it (vs the XLA grid_sample oracle), and Config(use_stereo)
    must auto-select dyn384 (training/photometric.warp_band_for)."""
    from fusiondepth_tpu.config import Config
    from fusiondepth_tpu.ops.pallas_warp import (
        _band_bw,
        band_clamp_fraction,
        band_override,
    )
    from fusiondepth_tpu.training.photometric import warp_band_for

    rng = np.random.default_rng(5)
    Hh, Ww = 32, 640
    src = jnp.asarray(rng.uniform(size=(1, Hh, Ww, C)).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(Hh), np.arange(Ww), indexing="ij")
    # stereo warp: ix = x - disparity; foreground box at 185 px, smooth
    # background at ~6 px -> in-strip spread ~179 px at the box edges
    disp = np.full((Hh, Ww), 6.0) + 1.5 * np.sin(ys / 7.0)
    box = (slice(8, 24), slice(260, 420))
    disp[box] = 185.0
    ix = np.clip(xs - disp, 0.3, Ww - 1.3)
    iy = np.clip(ys + 0.4 * np.cos(xs / 11.0), 0.3, Hh - 1.3)
    g = jnp.asarray(np.stack([(2 * ix + 1) / Ww - 1,
                              (2 * iy + 1) / Hh - 1],
                             -1)[None].astype(np.float32))
    coords = jnp.asarray(np.stack([ix, iy], -1)[None].astype(np.float32))

    # 1) telemetry: dyn256 clamps a nontrivial fraction on this field
    monkeypatch.setenv("FUSIONDEPTH_WARP_BW", "dyn256")
    frac256 = band_clamp_fraction(coords, Hh, Ww)
    assert frac256["h_frac"] > 0.005, frac256
    # ... and the kernel really is wrong exactly there (not exact)
    (o256,) = warp_bilinear_banded([src], [(0, g)], interpret=True)
    ref = grid_sample(src, g)
    assert float(jnp.abs(o256 - ref).max()) > 1e-3

    # 2) dyn384 covers it: telemetry zero AND kernel exact
    with band_override("dyn384"):
        assert _band_bw() == (384, True)
        frac384 = band_clamp_fraction(coords, Hh, Ww)
        assert frac384["frac"] == 0.0, frac384
        (o384,) = warp_bilinear_banded([src], [(0, g)], interpret=True)
    np.testing.assert_allclose(np.asarray(o384), np.asarray(ref), atol=2e-5)
    assert _band_bw() == (256, True)  # override restored

    # 3) config wiring: stereo auto-widens, explicit warp_band wins
    assert warp_band_for(Config(use_stereo=True, frame_ids=(0, -1, 1))) \
        == "dyn384"
    assert warp_band_for(Config()) is None
    assert warp_band_for(Config(use_stereo=True, warp_band="512",
                                frame_ids=(0, -1, 1))) == "512"
