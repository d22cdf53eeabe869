"""Stage-2 refiner: distills offline GDC correction into a feed-forward
pseudo-3D refine decoder.

Mirrors reference refiner.py:25-693 (forced config clone_gdc=True,
refine_2d=True at :29-30):
- stage-1 nets (encoder, beam encoder, depth decoder, pose nets) are FROZEN
  (eval-mode batch norm, no gradients);
- per scale, a pseudo-3D input is built from the stage-1 disparity:
  median-ratio scaling to the 4-beam LiDAR inside crop [78:190, 23:617],
  re-normalized disparity (1/d - 0.01)/9.9, Cat_xy XYZ maps, and the
  2-channel LiDAR (refiner.py:316-346);
- the trainable refine2d decoder (DepthDecoder road=True + catxy + deep)
  consumes encoder features + beam features + these injected maps;
- loss = photometric/automask/smoothness (as stage 1) + a GDC-cloning SI
  loss against cached inf_gdc outputs (weight 0.008, x4 when scale-0-only;
  SI scale factor 10.0 — refiner.py:557-563,678-688), with gamma-weighted
  iterative refinement (refine_iter).

TPU-first: the frozen forward, pseudo-3D construction (sort-based masked
median), refine iterations (Python-unrolled, static count), and losses are
one jitted computation; only the refine decoder's params receive gradients.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.models.depth_decoder import DepthDecoder
from fusiondepth_tpu.models.fusion import FusionNets, _dtype
from fusiondepth_tpu.ops.depth import disp_to_depth
from fusiondepth_tpu.ops.geometry import cat_xy
from fusiondepth_tpu.ops.planes import (
    normalized_smoothness_planes,
    reprojection_loss_planes,
    resize_planes,
)
from fusiondepth_tpu.ops.pooling import masked_median, max_pool2x2_ceil
from fusiondepth_tpu.ops.resize import resize_bilinear
from fusiondepth_tpu.training.photometric import (
    _pyramid_planes,
    build_color_pyramid,
    generate_images_pred,
)

# the reference's 192x640-space crop window for median scaling
# (refiner.py:330-331, "375 1242" comment)
CROP = (78, 190, 23, 617)


def crop_window(height: int, width: int):
    """The median-scaling crop, scaled proportionally from its 192x640
    definition (identical values at the reference resolution)."""
    r0, r1, c0, c1 = CROP
    return (int(r0 / 192 * height), int(r1 / 192 * height),
            int(c0 / 640 * width), int(c1 / 640 * width))


def refiner_si_loss(pred, target, threshold: float, si_var: float):
    """SI loss with the refiner's constants (refiner.py:557-563):
    valid = target>1e-3 & 1e-3<pred<80 & |pred-target|<threshold; scale 10.
    """
    valid = ((target > 1e-3) & (pred < 80) & (pred > 1e-3)
             & (jnp.abs(pred - target) < threshold))
    w = valid.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    sp = jnp.where(valid, pred, 1.0)
    st = jnp.where(valid, target, 1.0)
    d = jnp.log(sp) - jnp.log(st)
    m2 = (d * d * w).sum() / n
    m1 = (d * w).sum() / n
    var = jnp.maximum(m2 - si_var * m1 * m1, 0.0)
    return jnp.where(w.sum() > 0, jnp.sqrt(var) * 10.0, 0.0)


class RefinerNets:
    """Stage-1 bundle + the trainable refine2d decoder."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.stage1 = FusionNets(cfg)
        self.refine2d = DepthDecoder(
            scales=tuple(cfg.scales),
            road=True,
            catxy=cfg.catxy,
            deep=cfg.refine2d_deep,
            # W-folded layout for the trainable road decoder too (round 5:
            # same param tree, outputs equal the generic path to dtype
            # tolerance — tests/test_folded.py road/deep cases)
            folded=cfg.folded_decoder,
            tanh_head=cfg.refine_offset,
            # the stage-1 encoder hands levels 0-1 over folded when the
            # seam is on (models/fusion.py seam_fold); the generic road
            # path unfolds them at entry when told the fold factor
            skip_fold=self.stage1.seam_fold,
            dtype=_dtype(cfg),
        )

    def init_refine(self, rng, batch_size: int = 1):
        cfg = self.cfg
        feats = [jnp.zeros(s) for s in self.stage1._pyramid_shapes(batch_size)]
        ch = 1 + (3 if cfg.catxy else 0) + 2
        depth_maps = {
            ("disp", i): jnp.zeros(
                (batch_size, cfg.height // 2**i, cfg.width // 2**i, ch))
            for i in cfg.scales
        }
        return self.refine2d.init(rng, feats, depth_maps=depth_maps)

    # ---- pseudo-3D input construction (refiner.py:316-346) ----

    def build_pseudo3d(self, batch, outputs) -> Dict[Any, jnp.ndarray]:
        cfg = self.cfg
        H, W = cfg.height, cfg.width
        beam = batch["four_beam"]  # (B, H, W, 1), meters/100
        two_cha = batch["two_channel"][:, 0]
        disp_0 = outputs[("disp", 0)]

        r0, r1, c0, c1 = crop_window(H, W)
        crop = jnp.zeros((1, H, W, 1))
        crop = crop.at[:, r0:r1, c0:c1, :].set(1.0)
        beam_mask = (beam > 0) & (crop > 0)

        depth_maps = {}
        for scale in cfg.scales:
            if cfg.refine_a0:
                disp = disp_0
                disp_0 = max_pool2x2_ceil(disp_0)
            else:
                disp = outputs[("disp", scale)]
            disp_full = resize_bilinear(disp, H, W)
            _, depth = disp_to_depth(disp_full, cfg.min_depth, cfg.max_depth)

            med_beam = masked_median(beam * 100.0, beam_mask)
            med_depth = masked_median(depth, beam_mask)
            ratio = jax.lax.stop_gradient(med_beam / jnp.maximum(
                med_depth, 1e-6))
            # no beam returns in the crop -> keep depths unscaled
            ratio = jnp.where(jnp.isfinite(ratio), ratio, 1.0)
            depth = depth * ratio

            hs, ws = disp.shape[1], disp.shape[2]
            scaled_disp = (resize_bilinear(1.0 / depth, hs, ws) - 0.01) / 9.9

            if scale != 0:
                two_cha = max_pool2x2_ceil(two_cha)

            if cfg.catxy:
                d = depth
                for _ in range(scale):
                    d = max_pool2x2_ceil(d)
                # per-scale intrinsics: scale K's u/v rows to this pyramid
                # level, then invert (reference builds per-scale K/inv_K in
                # the dataset, mono_dataset.py:166-175)
                K_s = batch["K"].at[:, 0, :].mul(ws / W)
                K_s = K_s.at[:, 1, :].mul(hs / H)
                inv_K_s = jnp.linalg.inv(K_s)
                xyz = cat_xy(d, inv_K_s)
                depth_maps[("disp", scale)] = jnp.concatenate(
                    [scaled_disp, xyz, two_cha], axis=-1)
            else:
                depth_maps[("disp", scale)] = jnp.concatenate(
                    [scaled_disp, two_cha], axis=-1)
        return depth_maps

def make_refine_loss_fn(cfg: Config, nets: RefinerNets):
    """loss_fn(refine_params, frozen_variables, batch, rng) -> loss, aux.

    Frozen stage-1 forward runs inside (eval-mode, stop-gradient); the
    refine decoder's output replaces the disparities, the photometric +
    GDC-clone loss is accumulated over refine_iter gamma-weighted passes.
    """

    def loss_fn(refine_params, frozen_variables, batch, rng):
        batch = dict(batch)
        batch["color_pyramid"] = build_color_pyramid(
            cfg, batch["color"][:, 0])

        s1 = nets.stage1
        color0 = batch["color_aug"][:, 0]
        feats = s1.encoder.apply(
            frozen_variables["encoder"], color0, train=False)
        beam_feats = s1.beam_encoder.apply(
            frozen_variables["beam_encoder"], batch["two_channel"][:, 0],
            train=False)
        if cfg.refine_depthnet_with_beam:
            outputs = s1.depth.apply(frozen_variables["depth"], feats,
                                     beam_features=beam_feats)
        else:
            outputs = s1.depth.apply(frozen_variables["depth"], feats)
        pose_out, _ = s1.predict_poses(frozen_variables, batch, feats,
                                       train=False)
        outputs.update(pose_out)
        if not cfg.train_entire_net:
            # frozen stage-1 (reference refiner.py:306 wraps the stage-1
            # forward in no_grad unless --train_entire_net)
            outputs = jax.tree.map(jax.lax.stop_gradient, outputs)
            feats = [jax.lax.stop_gradient(f) for f in feats]
            beam_feats = [jax.lax.stop_gradient(f) for f in beam_feats]

        depth_maps = nets.build_pseudo3d(batch, outputs)

        total = 0.0
        losses: Dict[str, jnp.ndarray] = {}
        n_iter = max(cfg.refine_iter, 1)
        gama_base = 1.0 if n_iter == 1 else cfg.refine_iter_gama

        for it in range(n_iter):
            refined = nets.refine2d.apply(
                refine_params, feats, beam_features=beam_feats,
                depth_maps=depth_maps)
            for i in cfg.scales:
                outputs[("disp", i)] = refined[("disp", i)]
            outputs = generate_images_pred(cfg, batch, outputs,
                                           list(cfg.frame_ids))
            gama = gama_base ** (n_iter - it)
            rng, sub = jax.random.split(rng)
            iter_loss, iter_metrics = _refine_losses(
                cfg, batch, outputs, sub)
            total = total + iter_loss * gama
            for k, v in iter_metrics.items():
                losses[f"iter{it}/{k}"] = v

        losses["loss"] = total
        return total, losses

    return loss_fn


def _refine_losses(cfg: Config, batch, outputs, rng):
    """Photometric/automask/smoothness + GDC-clone SI loss for one pass
    (reference refiner.py:592-693). Planes-layout (ops/planes.py), same
    formulation as the stage-1 loss: candidate axes lead, batch axis stays
    intact, so the path shards cleanly and is the one the benchmark runs."""
    H, W = cfg.height, cfg.width
    total = 0.0
    metrics: Dict[str, jnp.ndarray] = {}

    warped = outputs["warped_planes"]      # (n, k, B, C, H, W)
    sources_p = outputs["sources_planes"]  # (n, B, C, H, W)
    target_p = outputs["target_planes"]    # (B, C, H, W)
    use_ssim = not cfg.no_ssim

    reproj_maps = reprojection_loss_planes(
        warped, target_p[None, None], use_ssim=use_ssim)
    identity_maps = None
    if not cfg.disable_automasking:
        identity_maps = reprojection_loss_planes(
            sources_p, target_p[None], use_ssim=use_ssim)
    pyr = _pyramid_planes(cfg, target_p)

    for si_, scale in enumerate(cfg.scales):
        loss = 0.0
        disp = outputs[("disp", scale)][..., 0]  # (B, Hs, Ws)
        reproj = reproj_maps[:, si_]  # (n, B, H, W)

        if not cfg.disable_automasking:
            rng, sub = jax.random.split(rng)
            identity = identity_maps + (jax.random.normal(
                sub, identity_maps.shape) * 1e-5).astype(identity_maps.dtype)
            combined = jnp.concatenate([identity, reproj], axis=0)
        else:
            combined = reproj

        to_optimise = (combined[0] if combined.shape[0] == 1
                       else combined.min(axis=0))
        loss = loss + to_optimise.mean(dtype=jnp.float32)

        smooth = normalized_smoothness_planes(disp, pyr[scale])
        loss = loss + cfg.disparity_smoothness * smooth / (2.0**scale)
        total = total + loss
        metrics[f"loss/scale{scale}"] = loss

        if (not cfg.gdc_loss_only_on_scale_0) or scale == 0:
            gdc_out = batch["inf_gdc"][..., 0]  # (B, H, W)
            disp_full = resize_planes(disp, H, W)
            _, depth = disp_to_depth(disp_full, cfg.min_depth, cfg.max_depth)
            gdc_loss = refiner_si_loss(
                depth, gdc_out, cfg.gdc_loss_threshold,
                cfg.si_var) * cfg.gdc_loss_weight
            if cfg.gdc_loss_only_on_scale_0:
                gdc_loss = gdc_loss * 4.0
            total = total + gdc_loss
            metrics[f"loss/gdc_scale{scale}"] = gdc_loss

    return total / cfg.num_scales, metrics
