"""The self-supervised photometric objective: view synthesis + automask +
smoothness + scale-invariant LiDAR loss, assembled as one pure function.

Mirrors reference trainer.py:425-596 (generate_images_pred + compute_losses).
Everything is static-shaped and traces into a single XLA computation; the
per-pixel min over warp candidates is a stacked `jnp.min`, the automask
tie-break noise comes from an explicit PRNG key.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.ops.depth import disp_to_depth
from fusiondepth_tpu.ops.geometry import backproject_depth, project_3d
from fusiondepth_tpu.ops.losses import (
    normalized_smoothness,
    reprojection_loss,
    si_loss,
)
from fusiondepth_tpu.ops.resize import resize_bilinear
from fusiondepth_tpu.ops.sampling import grid_sample


def generate_images_pred(cfg: Config, batch, outputs: Dict[Any, Any],
                         frame_ids) -> Dict[Any, Any]:
    """Warp each source frame into frame 0's view at every scale.

    Populates outputs[("depth", 0, s)] and outputs[("color", f, s)].
    Reference: trainer.py:425-474.
    """
    fid_index = {f: i for i, f in enumerate(cfg.frame_ids)}
    H, W = cfg.height, cfg.width

    # at full-res warping (v1_multiscale off) every (scale, frame) warp
    # shares the same output size and source set: defer them and run ONE
    # fused gather (ops.sampling.grid_sample_multi)
    fuse_warps = not cfg.v1_multiscale
    pending = []  # (f_i, scale, source_position, pix_coords)
    src_frames = [f for f in frame_ids[1:]]
    src_pos = {f: i for i, f in enumerate(src_frames)}

    for scale in cfg.scales:
        disp = outputs[("disp", scale)]
        if cfg.v1_multiscale:
            # warp at this scale: scaled intrinsics + per-scale source color
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

        for f_i in frame_ids[1:]:
            if f_i == "s":
                T = batch["stereo_T"]
            else:
                T = outputs[("cam_T_cam", 0, f_i)]

            if cfg.pose_model_type == "posecnn" and f_i != "s":
                from fusiondepth_tpu.ops.pose import (
                    transformation_from_parameters,
                )
                aa = outputs[("axisangle", 0, f_i)]
                t = outputs[("translation", 0, f_i)]
                inv_depth = 1.0 / depth
                mean_inv_depth = inv_depth.mean(axis=(1, 2, 3), keepdims=False)
                T = transformation_from_parameters(
                    aa[:, 0, 0], t[:, 0, 0] * mean_inv_depth[:, None],
                    invert=(f_i < 0))

            cam_points = backproject_depth(depth, inv_K)
            pix_coords = project_3d(cam_points, K, T)
            outputs[("sample", f_i, scale)] = pix_coords
            if fuse_warps:
                pending.append((f_i, scale, src_pos[f_i], pix_coords))
            else:
                src = _frame_at_scale(cfg, batch, fid_index[f_i],
                                      source_scale)
                outputs[("color", f_i, scale)] = grid_sample(src, pix_coords)

    if fuse_warps and pending:
        sources = [batch["color"][:, fid_index[f]] for f in src_frames]
        warp_list = [(pos, pix) for _, _, pos, pix in pending]
        if (cfg.pallas_warp and H % 16 == 0 and H >= 64
                and jax.device_count() == 1):
            # single-device only for now: under a GSPMD mesh the kernel
            # would need a shard_map wrapper (the XLA fallback shards fine)
            from fusiondepth_tpu.ops.pallas_warp import warp_bilinear_banded

            # bf16 training already rounds colors through the MXU, so the
            # default fast matmul precision is numerically consistent
            # (max diff vs exact ~4e-3 on [0,1] colors, 8.6x faster incl.
            # backward); f32 training keeps HIGHEST (exact, 2e-7)
            prec = (jax.lax.Precision.DEFAULT
                    if cfg.compute_dtype == "bfloat16"
                    else jax.lax.Precision.HIGHEST)
            sampled = warp_bilinear_banded(sources, warp_list,
                                           precision=prec)
        else:
            from fusiondepth_tpu.ops.sampling import grid_sample_multi

            sampled = grid_sample_multi(sources, warp_list)
        for (f_i, scale, _, _), out in zip(pending, sampled):
            outputs[("color", f_i, scale)] = out

    return outputs


def _frame_at_scale(cfg: Config, batch, frame_index: int, scale: int):
    """Source frame color at pyramid level `scale` (v1_multiscale only)."""
    if scale == 0:
        return batch["color"][:, frame_index]
    color = batch["color"][:, frame_index]
    h = cfg.height // 2**scale
    w = cfg.width // 2**scale
    return jax.image.resize(color, (color.shape[0], h, w, color.shape[-1]),
                            method="bilinear", antialias=True)


def compute_losses(cfg: Config, batch, outputs: Dict[Any, Any],
                   rng) -> Dict[str, jnp.ndarray]:
    """Multi-scale photometric + automask + smoothness + SI loss.

    Reference: trainer.py:490-596. `batch["color_pyramid"]` holds frame-0
    color at each scale for the smoothness guidance (list indexed by scale).
    """
    losses: Dict[str, jnp.ndarray] = {}
    total_loss = 0.0
    fid_index = {f: i for i, f in enumerate(cfg.frame_ids)}
    H, W = cfg.height, cfg.width

    source_frames = [f for f in cfg.frame_ids[1:]]

    # identity reprojection is scale-INVARIANT when warping at full res
    # (source_scale==0 for every scale, reference trainer.py:515-528):
    # hoist the expensive SSIM/L1 out of the scale loop; only the random
    # tie-break noise is drawn fresh per scale (trainer.py:549-551)
    # single-device only: under a GSPMD mesh the cross-scale concats force
    # inefficient reshards ("[SPMD] Involuntary full rematerialization");
    # the per-scale formulation shards cleanly on the batch axis
    fuse_loss = jax.device_count() == 1

    identity_base = None
    if (not cfg.disable_automasking and not cfg.v1_multiscale
            and fuse_loss):
        target0 = batch["color"][:, 0]
        identity_base = jnp.concatenate(
            [reprojection_loss(batch["color"][:, fid_index[f]], target0,
                               use_ssim=not cfg.no_ssim)
             for f in source_frames],
            axis=-1,
        )

    # ALL warped reprojection losses in one stacked SSIM+L1 call: 8
    # separate per-(scale, frame) instances cost ~13 ms each in the
    # backward; one (n*B)-batch call fuses them
    stacked_reproj = None
    if not cfg.v1_multiscale and fuse_loss:
        target0 = batch["color"][:, 0]
        preds = [outputs[("color", f, s)] for s in cfg.scales
                 for f in source_frames]
        big = jnp.concatenate(preds, axis=0)
        tgt = jnp.tile(target0, (len(preds), 1, 1, 1))
        rl = reprojection_loss(big, tgt, use_ssim=not cfg.no_ssim)
        B0 = target0.shape[0]
        stacked_reproj = rl.reshape(len(cfg.scales), len(source_frames),
                                    B0, H, W, 1)

    for scale in cfg.scales:
        loss = 0.0
        source_scale = scale if cfg.v1_multiscale else 0

        disp = outputs[("disp", scale)]
        color = batch["color_pyramid"][scale]  # (B, Hs, Ws, 3) frame 0
        if cfg.v1_multiscale:
            target = _frame_at_scale(cfg, batch, 0, source_scale)
        else:
            target = batch["color"][:, 0]  # full-res frame 0

        def _src(f):
            if cfg.v1_multiscale:
                return _frame_at_scale(cfg, batch, fid_index[f],
                                       source_scale)
            return batch["color"][:, fid_index[f]]

        if stacked_reproj is not None:
            si_ = list(cfg.scales).index(scale)
            reproj = jnp.concatenate(
                [stacked_reproj[si_, fi]
                 for fi in range(len(source_frames))],
                axis=-1,
            )  # (B, H, W, n_src)
        else:
            reproj = jnp.concatenate(
                [reprojection_loss(outputs[("color", f, scale)], target,
                                   use_ssim=not cfg.no_ssim)
                 for f in source_frames],
                axis=-1,
            )

        if not cfg.disable_automasking:
            if identity_base is not None:
                identity = identity_base
            else:
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
            # Zhou-style learned mask: weight the reprojection losses and
            # pull the mask toward 1 with a BCE term (trainer.py:531-545)
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


def build_color_pyramid(cfg: Config, color0):
    """Frame-0 color at each scale for smoothness guidance.

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
