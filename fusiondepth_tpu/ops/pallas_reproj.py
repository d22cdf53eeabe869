"""Fused SSIM + L1 reprojection loss as a Pallas TPU kernel (fwd + VJP).

This is the BASELINE.json north-star fusion: the per-pixel photometric
error 0.85 * clip((1-SSIM)/2) + 0.15 * L1, channel-meaned, computed
straight from the warped planes without materializing the five box-
filtered SSIM moment fields in HBM. The XLA path (ops/planes.py) runs
box3 as banded MXU matmuls over a stacked field tensor — ~6 full-size
intermediates per candidate image in each direction of autodiff; here
the 3x3 box means live in VMEM registers (vertical: halo rows + unit
row shifts; horizontal: lane rolls with reflect-edge fixups), so HBM
traffic drops to read-warped + read-target + write-loss-map.

Backward: a custom VJP whose kernel applies `jax.vjp` to the SAME
block-local math (traced inside the kernel body — correctness by
construction), emitting the warped-rows cotangent. A block's loss rows
read one halo row above and below, so the bwd kernel outputs the halo
rows' gradients into separate arrays which the XLA wrapper adds back to
the neighbor blocks (outer-dim row shifts, cheap).

Boundary semantics match ops/planes._box3_matrix exactly: reflect
(torch ReflectionPad2d) in both H (via reflected halo rows at the image
edges, prepared by the wrapper) and W (in-kernel edge fixups).

Gradients flow to `warped` only — target (and its prebox'd stats) are
input data in the photometric loss.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RT = 16  # loss rows per program

_C1 = 0.01**2
_C2 = 0.03**2


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _lane_roll(v, shift):
    """pltpu.roll along the last axis with a VJP (roll is linear; its
    adjoint is the inverse rotation — pltpu.roll itself has no
    differentiation rule, which the bwd kernel's in-kernel jax.vjp
    needs)."""
    return pltpu.roll(v, shift, v.ndim - 1)


def _lane_roll_fwd(v, shift):
    return pltpu.roll(v, shift, v.ndim - 1), None


def _lane_roll_bwd(shift, _, g):
    W = g.shape[-1]
    return (pltpu.roll(g, (W - shift) % W, g.ndim - 1),)


_lane_roll.defvjp(_lane_roll_fwd, _lane_roll_bwd)


def _box3_rows(f):
    """(C, RT+2, W) field -> (C, RT, W) 3x3 reflect-boundary box mean.

    Vertical: the caller supplies halo rows, so three unit row slices.
    Horizontal: lane rolls; reflect edges (col -1 -> col 1, col W -> col
    W-2) fixed with iota masks.
    """
    v = (f[:, :-2] + f[:, 1:-1] + f[:, 2:]) * (1.0 / 3.0)
    W = v.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    l_raw = _lane_roll(v, 1)      # v[w-1] (wraps at col 0)
    r_raw = _lane_roll(v, W - 1)  # v[w+1] (wraps at col W-1)
    # reflect: v[-1] = v[1] (= r_raw at col 0); v[W] = v[W-2] (= l_raw
    # at col W-1)
    left = jnp.where(col == 0, r_raw, l_raw)
    right = jnp.where(col == W - 1, l_raw, r_raw)
    return (left + v + right) * (1.0 / 3.0)


def _block_loss(p3, t3, muy, ey2):
    """Block-local reproj loss. p3/t3: (C, RT+2, W) warped/target rows
    incl. halos; muy/ey2: (C, RT, W) prebox'd target stats. Returns
    (RT, W) f32."""
    p = p3.astype(jnp.float32)
    t = t3.astype(jnp.float32)
    mu_x = _box3_rows(p)
    ex2 = _box3_rows(p * p)
    exy = _box3_rows(p * t)
    mu_y = muy.astype(jnp.float32)
    ey2f = ey2.astype(jnp.float32)

    sigma_x = ex2 - mu_x * mu_x
    sigma_y = ey2f - mu_y * mu_y
    sigma_xy = exy - mu_x * mu_y
    n = (2 * mu_x * mu_y + _C1) * (2 * sigma_xy + _C2)
    d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
    ssim_err = jnp.clip((1 - n / d) / 2, 0.0, 1.0)

    l1 = jnp.abs(t[:, 1:-1] - p[:, 1:-1])
    C = p3.shape[0]
    return (0.85 * ssim_err + 0.15 * l1).sum(axis=0) * (1.0 / C)


def _fwd_kernel(w_ref, wt_ref, wb_ref, t_ref, tt_ref, tb_ref, muy_ref,
                ey2_ref, out_ref):
    p3 = jnp.concatenate([wt_ref[0, 0, 0, :, 0], w_ref[0, 0, 0, :, 0],
                          wb_ref[0, 0, 0, :, 0]], axis=1)
    t3 = jnp.concatenate([tt_ref[0, :, 0], t_ref[0, :, 0],
                          tb_ref[0, :, 0]], axis=1)
    out_ref[0, 0, 0, 0] = _block_loss(
        p3, t3, muy_ref[0, :, 0], ey2_ref[0, :, 0]).astype(out_ref.dtype)


def _bwd_kernel(w_ref, wt_ref, wb_ref, t_ref, tt_ref, tb_ref, muy_ref,
                ey2_ref, g_ref, dmain_ref, dtop_ref, dbot_ref):
    p3 = jnp.concatenate([wt_ref[0, 0, 0, :, 0], w_ref[0, 0, 0, :, 0],
                          wb_ref[0, 0, 0, :, 0]], axis=1)
    t3 = jnp.concatenate([tt_ref[0, :, 0], t_ref[0, :, 0],
                          tb_ref[0, :, 0]], axis=1)
    muy = muy_ref[0, :, 0]
    ey2 = ey2_ref[0, :, 0]
    g = g_ref[0, 0, 0, 0].astype(jnp.float32)
    _, vjp = jax.vjp(lambda q: _block_loss(q, t3, muy, ey2), p3)
    dp3 = vjp(g)[0]
    dmain_ref[0, 0, 0, :, 0] = dp3[:, 1:-1].astype(dmain_ref.dtype)
    dtop_ref[0, 0, 0, :, 0] = dp3[:, :1].astype(dtop_ref.dtype)
    dbot_ref[0, 0, 0, :, 0] = dp3[:, -1:].astype(dbot_ref.dtype)


def _halo_rows(x, T):
    """x: (..., T, RT, W) blocked rows -> (top, bot) halo arrays of shape
    (..., T, 1, W): row (t*RT - 1) with image-edge REFLECT (row 1), and
    row ((t+1)*RT) with reflect (row H-2)."""
    top = jnp.concatenate(
        [x[..., 0:1, 1:2, :], x[..., :-1, -1:, :]], axis=-3)
    bot = jnp.concatenate(
        [x[..., 1:, 0:1, :], x[..., -1:, -2:-1, :]], axis=-3)
    return top, bot


def _common(warped, target, muy, ey2):
    n, k, B, C, H, W = warped.shape
    assert H % RT == 0, (H, RT)
    T = H // RT
    wr = warped.reshape(n, k, B, C, T, RT, W)
    wt, wb = _halo_rows(wr, T)
    tr = target.reshape(B, C, T, RT, W)
    tt, tb = _halo_rows(tr, T)
    muyr = muy.reshape(B, C, T, RT, W)
    ey2r = ey2.reshape(B, C, T, RT, W)
    return (n, k, B, C, T, W), wr, wt, wb, tr, tt, tb, muyr, ey2r


def _w_spec(rows, C, W):
    return pl.BlockSpec((1, 1, 1, C, 1, rows, W),
                        lambda s, kk, b, t: (s, kk, b, 0, t, 0, 0),
                        memory_space=pltpu.VMEM)


def _t_spec(rows, C, W):
    return pl.BlockSpec((1, C, 1, rows, W),
                        lambda s, kk, b, t: (b, 0, t, 0, 0),
                        memory_space=pltpu.VMEM)


def _o_spec(rows, W):
    return pl.BlockSpec((1, 1, 1, 1, rows, W),
                        lambda s, kk, b, t: (s, kk, b, t, 0, 0),
                        memory_space=pltpu.VMEM)


def pallas_reproj_ok(H: int) -> bool:
    return H % RT == 0 and H >= 2 * RT


def reproj_maps_pallas(warped, target, mesh=None, interpret: bool = False):
    """Dispatch wrapper: computes the prebox'd target stats (two banded
    MXU matmuls, cheap) and runs the fused kernel — per-shard via
    shard_map on the batch axis under a 1-D data mesh (same contract as
    ops/warp.warp_planes)."""
    from jax.sharding import PartitionSpec as P

    from fusiondepth_tpu.ops.planes import box3

    muy = box3(target)
    ey2 = box3(target * target)
    if mesh is None:
        return reproj_loss_pallas(warped, target, muy, ey2, interpret)
    f = jax.shard_map(
        lambda w, t, m, e: reproj_loss_pallas(w, t, m, e, interpret),
        mesh=mesh,
        in_specs=(P(None, None, "data"), P("data"), P("data"), P("data")),
        out_specs=P(None, None, "data"),
        check_vma=False,
    )
    return f(warped, target, muy, ey2)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def reproj_loss_pallas(warped, target, muy, ey2, interpret: bool = False):
    """Fused reprojection loss map.

    warped: (n, k, B, C, H, W); target/muy/ey2: (B, C, H, W) where
    muy/ey2 are box3(target) and box3(target^2) (compute once with
    ops.planes.box3). Returns (n, k, B, H, W) in warped.dtype.
    Gradients flow to warped only.
    """
    out, _ = _fwd(warped, target, muy, ey2, interpret)
    return out


def _fwd(warped, target, muy, ey2, interpret):
    dims, wr, wt, wb, tr, tt, tb, muyr, ey2r = _common(
        warped, target, muy, ey2)
    n, k, B, C, T, W = dims
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(n, k, B, T),
        in_specs=[_w_spec(RT, C, W), _w_spec(1, C, W), _w_spec(1, C, W),
                  _t_spec(RT, C, W), _t_spec(1, C, W), _t_spec(1, C, W),
                  _t_spec(RT, C, W), _t_spec(RT, C, W)],
        out_specs=_o_spec(RT, W),
        out_shape=jax.ShapeDtypeStruct((n, k, B, T, RT, W), warped.dtype),
        interpret=interpret,
    )(wr, wt, wb, tr, tt, tb, muyr, ey2r)
    H = T * RT
    return out.reshape(n, k, B, H, W), (warped, target, muy, ey2)


def _bwd(interpret, res, g):
    warped, target, muy, ey2 = res
    dims, wr, wt, wb, tr, tt, tb, muyr, ey2r = _common(
        warped, target, muy, ey2)
    n, k, B, C, T, W = dims
    H = T * RT
    gr = g.reshape(n, k, B, T, RT, W)
    dmain, dtop, dbot = pl.pallas_call(
        _bwd_kernel,
        grid=(n, k, B, T),
        in_specs=[_w_spec(RT, C, W), _w_spec(1, C, W), _w_spec(1, C, W),
                  _t_spec(RT, C, W), _t_spec(1, C, W), _t_spec(1, C, W),
                  _t_spec(RT, C, W), _t_spec(RT, C, W), _o_spec(RT, W)],
        out_specs=[_w_spec(RT, C, W), _w_spec(1, C, W), _w_spec(1, C, W)],
        out_shape=[
            jax.ShapeDtypeStruct((n, k, B, C, T, RT, W), jnp.float32),
            jax.ShapeDtypeStruct((n, k, B, C, T, 1, W), jnp.float32),
            jax.ShapeDtypeStruct((n, k, B, C, T, 1, W), jnp.float32),
        ],
        interpret=interpret,
    )(wr, wt, wb, tr, tt, tb, muyr, ey2r, gr)
    # fold halo-row gradients back to their owning rows: block t's top
    # halo is row t*RT - 1 (last row of block t-1, with t=0 reflecting to
    # row 1); bottom halo is row (t+1)*RT (first row of block t+1, last
    # block reflecting to row H-2)
    dw = dmain
    # top halos: blocks 1..T-1 -> previous block's last row
    dw = dw.at[..., :-1, -1:, :].add(dtop[..., 1:, :, :])
    # t=0 top halo reflected to row 1 (block 0, row 1)
    dw = dw.at[..., 0:1, 1:2, :].add(dtop[..., 0:1, :, :])
    # bottom halos: blocks 0..T-2 -> next block's first row
    dw = dw.at[..., 1:, 0:1, :].add(dbot[..., :-1, :, :])
    # last block's bottom halo reflected to row H-2
    dw = dw.at[..., -1:, -2:-1, :].add(dbot[..., -1:, :, :])
    dw = dw.reshape(n, k, B, C, H, W).astype(warped.dtype)
    return dw, jnp.zeros_like(target), jnp.zeros_like(muy), \
        jnp.zeros_like(ey2)


reproj_loss_pallas.defvjp(_fwd, _bwd)


def analytic_costs(n, k, B, C, H, W, bwd=False, dtype_bytes=2):
    """Analytic (flops, hbm_bytes) per execution of the fused SSIM+L1
    kernel, for roofline accounting (cost analysis is blind to pallas_call).

    VPU elementwise: ~45 flops/pixel/channel forward (three 3x3 box means
    + SSIM algebra + L1), ~3x that through the in-kernel VJP. HBM: warped
    rows (+2/RT halo re-reads), the target/muy/ey2 blocks re-fetched per
    (n, k) candidate, the (n, k, B, H, W) loss maps out; backward adds the
    incoming cotangent and the three d(warped) row outputs.
    """
    px = n * k * B * H * W
    flops = px * C * (45 if not bwd else 135)
    halo = 1.0 + 2.0 / RT
    warped_b = n * k * B * C * H * W * dtype_bytes
    tgt_b = 3 * warped_b          # target, muy, ey2 re-read per candidate
    maps_b = n * k * B * H * W * dtype_bytes
    base = warped_b * halo + tgt_b * halo + maps_b
    if bwd:
        return int(flops), int(base + maps_b + warped_b * halo)
    return int(flops), int(base)
