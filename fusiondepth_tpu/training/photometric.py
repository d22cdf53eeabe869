"""The self-supervised photometric objective: view synthesis + automask +
smoothness + scale-invariant LiDAR loss, assembled as one pure function.

Mirrors reference trainer.py:425-596 (generate_images_pred + compute_losses).
Everything is static-shaped and traces into a single XLA computation.

Two formulations, same semantics:

- PLANES (default, the fast path for 1 chip and N-chip meshes alike): all
  full-resolution maps live in (candidates..., B, C, H, W) layout with W in
  the 128-lane axis (ops/planes.py). The 8 (scale, frame) warps run as ONE
  Pallas banded-MXU kernel call (shard_mapped over the batch axis under a
  mesh) or one fused XLA gather; SSIM is two banded MXU matmuls; the
  identity reprojection is hoisted out of the scale loop (it is
  scale-invariant at full-res warping, reference trainer.py:515-528 with
  source_scale==0); the per-pixel automask min runs over a LEADING candidate
  axis so the batch axis is never concatenated and GSPMD data parallelism
  propagates untouched. This is the formulation the benchmark measures AND
  the one the multi-device mesh runs — there is no slow mesh fallback.

- REFERENCE (per-scale NHWC): a direct transcription of the reference's
  loop, used for the v1_multiscale ablation (per-scale warping resolutions,
  where the fusions don't apply) and as the numerical oracle the test suite
  checks the planes formulation against.

The per-pixel min over warp candidates is a stacked `jnp.min`; the automask
tie-break noise comes from an explicit PRNG key (reference trainer.py:549-551).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.ops.depth import disp_to_depth
from fusiondepth_tpu.ops.geometry import backproject_depth, project_3d
from fusiondepth_tpu.ops.losses import (
    normalized_smoothness,
    reprojection_loss,
    si_loss,
)
from fusiondepth_tpu.ops.planes import (
    from_planes,
    normalized_smoothness_planes,
    reprojection_loss_planes,
    resize_planes,
    to_planes,
)
from fusiondepth_tpu.ops.resize import resize_bilinear
from fusiondepth_tpu.ops.sampling import grid_sample
from fusiondepth_tpu.ops.warp import warp_planes


# --------------------------------------------------------------------------
# shared pieces
# --------------------------------------------------------------------------

def _pose_T(cfg: Config, batch, outputs, f_i, depth):
    """Camera transform for source frame f_i (reference trainer.py:440-459)."""
    if f_i == "s":
        return batch["stereo_T"]
    T = outputs[("cam_T_cam", 0, f_i)]
    if cfg.pose_model_type == "posecnn":
        from fusiondepth_tpu.ops.pose import transformation_from_parameters

        aa = outputs[("axisangle", 0, f_i)]
        t = outputs[("translation", 0, f_i)]
        inv_depth = 1.0 / depth
        mean_inv_depth = inv_depth.mean(axis=(1, 2, 3), keepdims=False)
        T = transformation_from_parameters(
            aa[:, 0, 0], t[:, 0, 0] * mean_inv_depth[:, None],
            invert=(f_i < 0))
    return T


def build_color_pyramid(cfg: Config, color0):
    """Frame-0 color at each scale for smoothness guidance (NHWC).

    The reference builds this on the host with PIL ANTIALIAS resizing
    (datasets/mono_dataset.py:85-104); here it is an in-step antialiased
    resize so the pyramid fuses into the training computation.
    """
    pyramid = {}
    for scale in cfg.scales:
        h = cfg.height // 2**scale
        w = cfg.width // 2**scale
        if scale == 0:
            pyramid[scale] = color0
        else:
            pyramid[scale] = jax.image.resize(
                color0, (color0.shape[0], h, w, color0.shape[-1]),
                method="bilinear", antialias=True)
    return pyramid


def _pyramid_planes(cfg: Config, target_p):
    """Frame-0 color pyramid in planes layout (B, C, Hs, Ws)."""
    B, C, H, W = target_p.shape
    pyramid = {}
    for scale in cfg.scales:
        h, w = H // 2**scale, W // 2**scale
        if scale == 0:
            pyramid[scale] = target_p
        else:
            pyramid[scale] = jax.image.resize(
                target_p, (B, C, h, w), method="bilinear", antialias=True)
    return pyramid


# --------------------------------------------------------------------------
# planes formulation (default)
# --------------------------------------------------------------------------

def warp_band_for(cfg: Config):
    """Effective banded-warp band spec for this config: an explicit
    cfg.warp_band wins; otherwise stereo training auto-widens to dyn384
    (stereo disparity spread at depth discontinuities exceeds dyn256's
    ~128 px exactness domain — reference trainer.py:467-470's grid_sample
    is exact everywhere, so the kernel's domain must cover the flows the
    config can produce). None = keep the env/default band."""
    return cfg.warp_band or ("dyn384" if cfg.use_stereo else None)


def _generate_images_pred_planes(cfg: Config, batch, outputs, frame_ids,
                                 mesh: Optional[Mesh]):
    """Full-res warping (v1_multiscale off): every (scale, frame) warp in
    one planes-layout call. Reference: trainer.py:425-474."""
    fid_index = {f: i for i, f in enumerate(cfg.frame_ids)}
    H, W = cfg.height, cfg.width
    src_frames = list(frame_ids[1:])

    grids = {}  # (f_i, scale) -> (B, H, W, 2)
    for scale in cfg.scales:
        disp = resize_bilinear(outputs[("disp", scale)], H, W)
        _, depth = disp_to_depth(disp, cfg.min_depth, cfg.max_depth)
        outputs[("depth", 0, scale)] = depth
        K, inv_K = batch["K"], batch["inv_K"]
        cam_points = backproject_depth(depth, inv_K)
        for f_i in src_frames:
            T = _pose_T(cfg, batch, outputs, f_i, depth)
            pix_coords = project_3d(cam_points, K, T)
            outputs[("sample", f_i, scale)] = pix_coords
            grids[(f_i, scale)] = pix_coords

    # (n_src, n_scales, B, H, W, 2) / (n_src, B, C, H, W)
    grid_stack = jnp.stack([
        jnp.stack([grids[(f, s)] for s in cfg.scales]) for f in src_frames])
    # bf16 training runs the whole loss image-path in bf16 (halves the HBM
    # traffic of the warped/SSIM maps — the loss is bandwidth-bound); all
    # mean-reductions accumulate in f32, and f32 training stays exact
    cdt = {"bfloat16": jnp.bfloat16,
           "float64": jnp.float64}.get(cfg.compute_dtype, jnp.float32)
    sources_p = jnp.stack([
        to_planes(batch["color"][:, fid_index[f]]) for f in src_frames]
    ).astype(cdt)
    target_p = to_planes(batch["color"][:, 0]).astype(cdt)

    # bf16 training already rounds colors through the MXU, so the default
    # fast matmul precision is numerically consistent (max diff vs exact
    # ~4e-3 on [0,1] colors, 8.6x faster incl. backward); f32 keeps HIGHEST
    prec = (jax.lax.Precision.DEFAULT if cfg.compute_dtype == "bfloat16"
            else jax.lax.Precision.HIGHEST)
    # Band-domain guard: the dyn256 default is exact while each strip's
    # in-strip ix SPREAD fits ~128 px — safe for temporal reprojection,
    # but stereo training warps by a full disparity field whose spread at
    # depth discontinuities can exceed it (fx*b*(1/z_near - 1/z_far)), so
    # use_stereo auto-selects the wider dyn384 band (exact spread <= 256
    # px; tests/test_pallas_warp.py stereo-discontinuity oracle).
    # cfg.warp_band pins an explicit choice; both override the
    # FUSIONDEPTH_WARP_BW env A/B gate and are recorded by selection.
    from fusiondepth_tpu.ops import pallas_warp
    from fusiondepth_tpu.utils import selection

    band = warp_band_for(cfg)
    if band and cfg.pallas_warp:
        selection.record(warp_band=band)
    with pallas_warp.band_override(band):
        warped = warp_planes(sources_p, grid_stack,
                             use_pallas=cfg.pallas_warp,
                             precision=prec, mesh=mesh,
                             backend=cfg.pallas_warp_backend)

    outputs["warped_planes"] = warped      # (n, k, B, C, H, W)
    outputs["sources_planes"] = sources_p  # (n, B, C, H, W)
    outputs["target_planes"] = target_p    # (B, C, H, W)
    # NHWC views for logging/inspection — dead code under jit unless used
    for ni, f in enumerate(src_frames):
        for ki, s in enumerate(cfg.scales):
            outputs[("color", f, s)] = from_planes(warped[ni, ki])
    return outputs


def _compute_losses_planes(cfg: Config, batch, outputs, rng,
                           mesh: Optional[Mesh] = None):
    """Multi-scale photometric + automask + smoothness + SI loss, planes
    layout. Reference: trainer.py:490-596."""
    losses: Dict[str, jnp.ndarray] = {}
    total_loss = 0.0
    H, W = cfg.height, cfg.width
    n_src = len(cfg.frame_ids) - 1

    warped = outputs["warped_planes"]      # (n, k, B, C, H, W)
    sources_p = outputs["sources_planes"]  # (n, B, C, H, W)
    target_p = outputs["target_planes"]    # (B, C, H, W)
    use_ssim = not cfg.no_ssim

    from fusiondepth_tpu.ops.pallas_reproj import (
        pallas_reproj_ok,
        reproj_maps_pallas,
    )

    from fusiondepth_tpu.utils import selection

    fuse_reproj = (cfg.pallas_reproj and use_ssim and pallas_reproj_ok(H)
                   and jax.default_backend() != "cpu")
    selection.record(formulation="planes",
                     reproj="pallas_fused" if fuse_reproj else "xla_stacked")
    if fuse_reproj:
        # fused SSIM+L1 kernel: the box-filtered moment fields never
        # touch HBM (ops/pallas_reproj.py); numerics match the XLA path
        reproj_maps = reproj_maps_pallas(warped, target_p, mesh=mesh)
        identity_maps = None
        if not cfg.disable_automasking:
            identity_maps = reproj_maps_pallas(
                sources_p[:, None], target_p, mesh=mesh)[:, 0]
    else:
        # every warped reprojection loss in ONE call (n, k, B, H, W)
        reproj_maps = reprojection_loss_planes(
            warped, target_p[None, None], use_ssim=use_ssim)
        identity_maps = None
        if not cfg.disable_automasking:
            identity_maps = reprojection_loss_planes(
                sources_p, target_p[None], use_ssim=use_ssim)  # (n,B,H,W)
    # identity reprojection is scale-invariant at full-res warping: hoisted
    # out of the scale loop (reference trainer.py:515-528); only the random
    # tie-break noise is drawn fresh per scale (trainer.py:549-551)

    pyr = _pyramid_planes(cfg, target_p)

    for si, scale in enumerate(cfg.scales):
        loss = 0.0
        reproj = reproj_maps[:, si]  # (n, B, H, W)

        if not cfg.disable_automasking:
            identity = identity_maps
            if cfg.avg_reprojection:
                identity = identity.mean(axis=0, keepdims=True)
            rng, sub = jax.random.split(rng)
            identity = identity + (jax.random.normal(
                sub, identity.shape) * 1e-5).astype(identity.dtype)
        elif cfg.predictive_mask:
            # Zhou-style learned mask: weight the reprojection losses and
            # pull the mask toward 1 with a BCE term (trainer.py:531-545)
            mask = outputs["predictive_mask"][("disp", scale)]
            mask_p = resize_planes(mask[..., 0], H, W)  # (B, H, W)
            reproj = reproj * mask_p[None].astype(reproj.dtype)
            eps = 1e-7
            bce = -jnp.log(jnp.clip(mask, eps, 1.0)).mean()
            loss = loss + 0.2 * bce

        if cfg.avg_reprojection:
            reproj = reproj.mean(axis=0, keepdims=True)

        if not cfg.disable_automasking:
            # candidate axis LEADS: batch axis untouched, shards cleanly
            combined = jnp.concatenate([identity, reproj], axis=0)
        else:
            combined = reproj

        if combined.shape[0] == 1:
            to_optimise = combined[0]
        else:
            to_optimise = combined.min(axis=0)
            if not cfg.disable_automasking:
                idxs = combined.argmin(axis=0)
                outputs[f"identity_selection/{scale}"] = (
                    idxs >= identity.shape[0]).astype(jnp.float32)

        loss = loss + to_optimise.mean(
            dtype=jnp.promote_types(to_optimise.dtype, jnp.float32))

        disp = outputs[("disp", scale)][..., 0]  # (B, Hs, Ws) planes-native
        smooth = normalized_smoothness_planes(disp, pyr[scale])
        loss = loss + cfg.disparity_smoothness * smooth / (2.0**scale)

        total_loss = total_loss + loss
        losses[f"loss/{scale}"] = loss

        if cfg.trainer_siloss and (cfg.trainer_siloss_all_scale or scale == 0):
            disp_full = resize_planes(disp, H, W)
            _, depth = disp_to_depth(disp_full, cfg.min_depth, cfg.max_depth)
            beam_depth = batch["four_beam"][..., 0] * 100.0
            # hard-coded metric scale (reference trainer.py:583)
            depth = depth * 26.0
            si = si_loss(depth, beam_depth,
                         threshold=cfg.gdc_loss_threshold,
                         si_var=cfg.si_var)
            total_loss = total_loss + si
            losses[f"loss/si_loss{scale}"] = si

    total_loss = total_loss / cfg.num_scales
    losses["loss"] = total_loss
    return losses


# --------------------------------------------------------------------------
# reference formulation (v1_multiscale + test oracle)
# --------------------------------------------------------------------------

def _frame_at_scale(cfg: Config, batch, frame_index: int, scale: int):
    """Source frame color at pyramid level `scale` (v1_multiscale only)."""
    if scale == 0:
        return batch["color"][:, frame_index]
    color = batch["color"][:, frame_index]
    h = cfg.height // 2**scale
    w = cfg.width // 2**scale
    return jax.image.resize(color, (color.shape[0], h, w, color.shape[-1]),
                            method="bilinear", antialias=True)


def generate_images_pred_reference(cfg: Config, batch, outputs, frame_ids):
    """Per-(scale, frame) NHWC warping — the direct transcription of
    reference trainer.py:425-474. Supports v1_multiscale."""
    fid_index = {f: i for i, f in enumerate(cfg.frame_ids)}
    H, W = cfg.height, cfg.width

    for scale in cfg.scales:
        disp = outputs[("disp", scale)]
        if cfg.v1_multiscale:
            source_scale = scale
            hs, ws = disp.shape[1], disp.shape[2]
            K = batch["K"].at[:, 0, :].mul(ws / W).at[:, 1, :].mul(hs / H)
            inv_K = jnp.linalg.inv(K)
        else:
            disp = resize_bilinear(disp, H, W)
            source_scale = 0
            K, inv_K = batch["K"], batch["inv_K"]
        _, depth = disp_to_depth(disp, cfg.min_depth, cfg.max_depth)
        outputs[("depth", 0, scale)] = depth

        cam_points = backproject_depth(depth, inv_K)
        for f_i in frame_ids[1:]:
            T = _pose_T(cfg, batch, outputs, f_i, depth)
            pix_coords = project_3d(cam_points, K, T)
            outputs[("sample", f_i, scale)] = pix_coords
            src = _frame_at_scale(cfg, batch, fid_index[f_i], source_scale)
            outputs[("color", f_i, scale)] = grid_sample(src, pix_coords)
    return outputs


def compute_losses_reference(cfg: Config, batch, outputs, rng):
    """Per-scale NHWC loss loop — direct transcription of reference
    trainer.py:490-596. `batch["color_pyramid"]` holds frame-0 color at
    each scale for the smoothness guidance."""
    losses: Dict[str, jnp.ndarray] = {}
    total_loss = 0.0
    fid_index = {f: i for i, f in enumerate(cfg.frame_ids)}
    H, W = cfg.height, cfg.width
    source_frames = [f for f in cfg.frame_ids[1:]]

    for scale in cfg.scales:
        loss = 0.0
        source_scale = scale if cfg.v1_multiscale else 0

        disp = outputs[("disp", scale)]
        color = batch["color_pyramid"][scale]  # (B, Hs, Ws, 3) frame 0
        if cfg.v1_multiscale:
            target = _frame_at_scale(cfg, batch, 0, source_scale)
        else:
            target = batch["color"][:, 0]

        def _src(f):
            if cfg.v1_multiscale:
                return _frame_at_scale(cfg, batch, fid_index[f],
                                       source_scale)
            return batch["color"][:, fid_index[f]]

        reproj = jnp.concatenate(
            [reprojection_loss(outputs[("color", f, scale)], target,
                               use_ssim=not cfg.no_ssim)
             for f in source_frames],
            axis=-1,
        )

        if not cfg.disable_automasking:
            identity = jnp.concatenate(
                [reprojection_loss(_src(f), target,
                                   use_ssim=not cfg.no_ssim)
                 for f in source_frames],
                axis=-1,
            )
            if cfg.avg_reprojection:
                identity = identity.mean(axis=-1, keepdims=True)
            # random tie-break noise (reference trainer.py:549-551)
            rng, sub = jax.random.split(rng)
            identity = identity + jax.random.normal(
                sub, identity.shape) * 1e-5
        elif cfg.predictive_mask:
            mask = outputs["predictive_mask"][("disp", scale)]
            if not cfg.v1_multiscale:
                mask = resize_bilinear(mask, H, W)
            reproj = reproj * mask
            eps = 1e-7
            bce = -jnp.log(jnp.clip(mask, eps, 1.0)).mean()
            loss = loss + 0.2 * bce

        if cfg.avg_reprojection:
            reproj = reproj.mean(axis=-1, keepdims=True)

        if not cfg.disable_automasking:
            combined = jnp.concatenate([identity, reproj], axis=-1)
        else:
            combined = reproj

        if combined.shape[-1] == 1:
            to_optimise = combined[..., 0]
        else:
            to_optimise = combined.min(axis=-1)
            idxs = combined.argmin(axis=-1)
            if not cfg.disable_automasking:
                outputs[f"identity_selection/{scale}"] = (
                    idxs >= identity.shape[-1]).astype(jnp.float32)

        loss = loss + to_optimise.mean()

        smooth = normalized_smoothness(disp, color)
        loss = loss + cfg.disparity_smoothness * smooth / (2.0**scale)

        total_loss = total_loss + loss
        losses[f"loss/{scale}"] = loss

        if cfg.trainer_siloss and (cfg.trainer_siloss_all_scale or scale == 0):
            disp_full = resize_bilinear(disp, H, W)
            _, depth = disp_to_depth(disp_full, cfg.min_depth, cfg.max_depth)
            beam_depth = batch["four_beam"] * 100.0
            depth = depth * 26.0
            si = si_loss(depth, beam_depth,
                         threshold=cfg.gdc_loss_threshold,
                         si_var=cfg.si_var)
            total_loss = total_loss + si
            losses[f"loss/si_loss{scale}"] = si

    total_loss = total_loss / cfg.num_scales
    losses["loss"] = total_loss
    return losses


# --------------------------------------------------------------------------
# public entry points
# --------------------------------------------------------------------------

def generate_images_pred(cfg: Config, batch, outputs: Dict[Any, Any],
                         frame_ids, mesh: Optional[Mesh] = None
                         ) -> Dict[Any, Any]:
    """Warp each source frame into frame 0's view at every scale.

    Populates outputs[("depth", 0, s)], outputs[("color", f, s)] and (on
    the default full-res path) the planes-layout tensors the loss consumes.
    Reference: trainer.py:425-474.
    """
    if cfg.v1_multiscale:
        return generate_images_pred_reference(cfg, batch, outputs, frame_ids)
    return _generate_images_pred_planes(cfg, batch, outputs, frame_ids, mesh)


def compute_losses(cfg: Config, batch, outputs: Dict[Any, Any],
                   rng, mesh: Optional[Mesh] = None
                   ) -> Dict[str, jnp.ndarray]:
    """Multi-scale photometric + automask + smoothness + SI loss.

    Reference: trainer.py:490-596.
    """
    if cfg.v1_multiscale:
        from fusiondepth_tpu.utils import selection

        selection.record(formulation="reference", reproj="per_scale_nhwc")
        return compute_losses_reference(cfg, batch, outputs, rng)
    return _compute_losses_planes(cfg, batch, outputs, rng, mesh=mesh)
