"""Model bundle: constructs the network set the trainer uses and runs the
full forward pass (depth + poses) on a batch.

Mirrors the reference's model wiring (trainer.py:66-127, process_batch
:268-319, predict_poses :321-388) as one functional `forward` over a params
pytree — everything traces into a single XLA computation.

Batch contract (NHWC jnp arrays; `F` indexes config.frame_ids order):
  color          (B, F, H, W, 3)   non-augmented frames
  color_aug      (B, F, H, W, 3)   color-jittered frames (network input)
  two_channel    (B, F, H, W, 2)   expanded-LiDAR 2-channel encoding
  four_beam      (B, H, W, 1)      sparse K-beam depth (meters / 100)
  K, inv_K       (B, 4, 4)         full-res intrinsics
  stereo_T       (B, 4, 4)         only when use_stereo
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.models.resnet import ResnetEncoder, RESNET_FEATURE_CHANNELS
from fusiondepth_tpu.models.depth_decoder import DepthDecoder
from fusiondepth_tpu.models.pose import PoseDecoder, PoseCNN
from fusiondepth_tpu.ops.pose import transformation_from_parameters


def _dtype(cfg: Config):
    # float64 exists for the torch-oracle parity suite (scoped jax.enable_x64)
    return {"bfloat16": jnp.bfloat16,
            "float64": jnp.float64}.get(cfg.compute_dtype, jnp.float32)


class FusionNets:
    """Holds the flax module definitions for one trainer configuration.

    `pose_depth` optionally gives the pose encoder a different ResNet depth
    than the depth encoder (the completor's completion_pose_num_layers
    split, reference completor.py:58-76).
    """

    def __init__(self, cfg: Config, pose_depth: int | None = None):
        self.cfg = cfg
        self.pose_depth = pose_depth or cfg.num_layers
        # the coarsest feature map (stride 32) must be >= 2x2 for the
        # decoder's reflect-padded convs
        assert cfg.height >= 64 and cfg.width >= 64, (
            f"minimum resolution is 64x64, got {cfg.height}x{cfg.width}")
        dt = _dtype(cfg)

        enc_in = 3
        if cfg.cat_4beam_to_color:
            enc_in = 4
        elif cfg.cat2start:
            enc_in = 5
        s2d = cfg.s2d_stem
        p2 = cfg.pack2_encoder
        f64 = cfg.fold64_encoder
        fst = cfg.fold_stem
        # folded encoder->decoder seam (config.folded_seam): the depth and
        # beam encoders hand their C=64 pyramid levels to the folded
        # decoder STILL FOLDED at F=2, eliding the unfold/refold reshape
        # pair (a real HBM relayout under the {3,0,2,1} conv layout).
        # Mirrors the exact trace-time gates of both ends: the encoder's
        # fold64 region must engage (basic-block depth, no pack2, W%4) and
        # the decoder must take its folded path (folded, no cat2end; the
        # FusionNets decoders never set road/deep/depth_maps).
        self.seam_fold = 2 if (
            cfg.folded_seam and cfg.folded_decoder and not cfg.cat2end
            and f64 and not p2 and not cfg.paired_encoders
            and cfg.num_layers <= 34 and cfg.width % 4 == 0) else 1
        ff = self.seam_fold > 1
        self.encoder = ResnetEncoder(depth=cfg.num_layers, in_channels=enc_in,
                                     s2d_stem=s2d, pack2=p2, fold64=f64,
                                     fold_stem=fst, folded_features=ff,
                                     dtype=dt)

        self.beam_encoder = None
        self.beam_encoder_pose = None
        if cfg.beam_encoder:
            self.beam_encoder = ResnetEncoder(
                depth=cfg.num_layers, in_channels=2, s2d_stem=s2d,
                pack2=p2, fold64=f64, fold_stem=fst, folded_features=ff,
                dtype=dt)
            self.beam_encoder_pose = ResnetEncoder(
                depth=self.pose_depth,
                in_channels=2 * cfg.num_pose_frames, s2d_stem=s2d,
                pack2=p2, fold64=f64, fold_stem=fst, dtype=dt)

        self.depth = DepthDecoder(scales=tuple(cfg.scales),
                                  cat2end=cfg.cat2end,
                                  folded=cfg.folded_decoder,
                                  skip_fold=self.seam_fold, dtype=dt)

        self.predictive_mask = None
        if cfg.predictive_mask:
            assert cfg.disable_automasking, (
                "predictive_mask requires disable_automasking "
                "(reference trainer.py:118-120)")
            self.predictive_mask = DepthDecoder(
                scales=tuple(cfg.scales),
                num_output_channels=len(cfg.frame_ids) - 1,
                folded=cfg.folded_decoder,
                skip_fold=self.seam_fold, dtype=dt)

        self.pose_encoder = None
        self.pose = None
        if cfg.use_pose_net:
            if cfg.pose_model_type == "separate_resnet":
                self.pose_encoder = ResnetEncoder(
                    depth=self.pose_depth,
                    in_channels=3 * cfg.num_pose_frames, s2d_stem=s2d,
                    pack2=p2, fold64=f64, fold_stem=fst, dtype=dt)
                self.pose = PoseDecoder(num_input_features=1,
                                        num_frames_to_predict_for=2, dtype=dt)
            elif cfg.pose_model_type == "shared":
                self.pose = PoseDecoder(
                    num_input_features=cfg.num_pose_frames, dtype=dt)
            elif cfg.pose_model_type == "posecnn":
                n = (cfg.num_input_frames
                     if cfg.pose_model_input == "all" else 2)
                self.pose = PoseCNN(num_input_frames=n, dtype=dt)

    # ---- initialization ----

    def init(self, rng, batch_size: int = 1) -> Dict[str, Any]:
        cfg = self.cfg
        H, W = cfg.height, cfg.width
        keys = jax.random.split(rng, 8)
        x = jnp.zeros((batch_size, H, W, self.encoder.in_channels))
        variables: Dict[str, Any] = {}
        variables["encoder"] = self.encoder.init(keys[0], x, train=False)

        feats_shape = self._pyramid_shapes(batch_size)
        dummy_feats = [jnp.zeros(s) for s in feats_shape]

        if self.beam_encoder is not None:
            variables["beam_encoder"] = self.beam_encoder.init(
                keys[1], jnp.zeros((batch_size, H, W, 2)), train=False)
            variables["beam_encoder_pose"] = self.beam_encoder_pose.init(
                keys[2],
                jnp.zeros((batch_size, H, W, 2 * cfg.num_pose_frames)),
                train=False)

        two_ch = jnp.zeros((batch_size, H, W, 2)) if cfg.cat2end else None
        variables["depth"] = self.depth.init(
            keys[3], dummy_feats, two_channel=two_ch)

        if self.predictive_mask is not None:
            variables["predictive_mask"] = self.predictive_mask.init(
                keys[6], dummy_feats)

        if self.pose is not None:
            if self.pose_encoder is not None:
                variables["pose_encoder"] = self.pose_encoder.init(
                    keys[4],
                    jnp.zeros((batch_size, H, W, 3 * cfg.num_pose_frames)),
                    train=False)
                pose_ch = RESNET_FEATURE_CHANNELS[self.pose_depth][-1]
                pose_feat = jnp.zeros(
                    (batch_size, H // 32, W // 32, pose_ch))
                variables["pose"] = self.pose.init(
                    keys[5], [pose_feat],
                    beam_last_feature=(pose_feat
                                       if cfg.beam_encoder else None))
            elif cfg.pose_model_type == "posecnn":
                n = (cfg.num_input_frames
                     if cfg.pose_model_input == "all" else 2)
                variables["pose"] = self.pose.init(
                    keys[5], jnp.zeros((batch_size, H, W, 3 * n)))
            else:  # shared
                variables["pose"] = self.pose.init(
                    keys[5], [dummy_feats[-1]] * cfg.num_pose_frames)
        return variables

    def _pyramid_shapes(self, batch_size):
        cfg = self.cfg
        chans = RESNET_FEATURE_CHANNELS[cfg.num_layers]
        shapes = [
            (batch_size, cfg.height // 2 ** (i + 1), cfg.width // 2 ** (i + 1), c)
            for i, c in enumerate(chans)
        ]
        if self.seam_fold > 1:
            sf = self.seam_fold
            shapes = [(b, h, w // sf, sf * c) if i <= 1 else (b, h, w, c)
                      for i, (b, h, w, c) in enumerate(shapes)]
        return shapes

    # ---- forward ----

    def _apply(self, module, variables, *args, train: bool, **kwargs):
        if train:
            out, updates = module.apply(
                variables, *args, train=True, mutable=["batch_stats"],
                **kwargs)
            return out, updates
        return module.apply(variables, *args, train=False, **kwargs), None

    def _paired_depth_ok(self) -> bool:
        cfg = self.cfg
        return (cfg.paired_encoders and cfg.beam_encoder
                and cfg.num_layers <= 34 and not cfg.s2d_stem
                and self.predictive_mask is None)

    def _paired_pose_ok(self) -> bool:
        cfg = self.cfg
        return (cfg.paired_encoders and cfg.beam_encoder
                and self.pose_depth <= 34 and not cfg.s2d_stem
                and cfg.pose_model_type == "separate_resnet")

    def forward_depth(self, variables, batch, train: bool):
        """Depth branch: encoder (+beam encoder) -> decoder disparities.

        Returns (outputs dict, batch_stats updates dict).
        """
        cfg = self.cfg
        updates: Dict[str, Any] = {}
        color0 = batch["color_aug"][:, 0]

        if cfg.cat_4beam_to_color:
            enc_in = jnp.concatenate([color0, batch["four_beam"]], axis=-1)
        elif cfg.cat2start:
            enc_in = jnp.concatenate(
                [color0, batch["two_channel"][:, 0]], axis=-1)
        else:
            enc_in = color0

        if self._paired_depth_ok():
            from fusiondepth_tpu.models.paired import (
                paired_resnet_apply,
                sum_halves,
            )

            paired, upd_a, upd_b = paired_resnet_apply(
                cfg.num_layers, variables["encoder"],
                variables["beam_encoder"], enc_in,
                batch["two_channel"][:, 0], train=train,
                dtype=self.encoder.dtype)
            if train:
                updates["encoder"] = upd_a
                updates["beam_encoder"] = upd_b
            # the decoder fuses beam features ADDITIVELY at every level
            # (depth_decoder.py), so pass the summed halves as features
            feats = [sum_halves(p) for p in paired]
            beam_feats = None
            two_ch = batch["two_channel"][:, 0] if cfg.cat2end else None
            outputs = self.depth.apply(
                variables["depth"], feats, two_channel=two_ch,
                beam_features=None)
            return outputs, feats, updates

        feats, upd = self._apply(self.encoder, variables["encoder"], enc_in,
                                 train=train)
        if upd:
            updates["encoder"] = upd

        beam_feats = None
        if cfg.beam_encoder:
            beam_feats, upd = self._apply(
                self.beam_encoder, variables["beam_encoder"],
                batch["two_channel"][:, 0], train=train)
            if upd:
                updates["beam_encoder"] = upd

        two_ch = batch["two_channel"][:, 0] if cfg.cat2end else None
        outputs = self.depth.apply(
            variables["depth"], feats, two_channel=two_ch,
            beam_features=beam_feats)
        if self.predictive_mask is not None:
            mask_out = self.predictive_mask.apply(
                variables["predictive_mask"], feats)
            outputs["predictive_mask"] = mask_out
        return outputs, feats, updates

    def forward_shared_features(self, variables, batch, train: bool):
        """Shared-encoder mode (pose_model_type='shared'): every frame runs
        through the depth encoder in one batched pass (reference
        trainer.py:276-287). Returns ({frame_id: pyramid}, updates)."""
        cfg = self.cfg
        B = batch["color_aug"].shape[0]
        F = len(cfg.frame_ids)
        stacked = batch["color_aug"].reshape((B * F,) + batch[
            "color_aug"].shape[2:])
        feats, upd = self._apply(self.encoder, variables["encoder"], stacked,
                                 train=train)
        per_frame = {
            f: [lvl.reshape((B, F) + lvl.shape[1:])[:, i] for lvl in feats]
            for i, f in enumerate(cfg.frame_ids)
        }
        return per_frame, ({"encoder": upd} if upd else {})

    def predict_poses(self, variables, batch, features, train: bool):
        """Per-source-frame relative poses (reference trainer.py:321-388)."""
        cfg = self.cfg
        outputs: Dict[Any, Any] = {}
        updates: Dict[str, Any] = {}
        fid_index = {f: i for i, f in enumerate(cfg.frame_ids)}

        if cfg.num_pose_frames == 2:
            temporal = [f for f in cfg.frame_ids[1:] if f != "s"]
            if cfg.pose_model_type == "separate_resnet" and len(temporal) > 1:
                # ALL frame pairs in ONE pose-encoder (and one beam-pose-
                # encoder) pass, pairs stacked on the batch axis: the
                # reference loops pairs sequentially (trainer.py:340-357),
                # which runs 2x R18 fwd+bwd back-to-back; fused, the MXU
                # sees one 2B batch. Deviation: train-mode BatchNorm
                # statistics are computed over both pairs jointly instead
                # of per pair (documented in PARITY.md).
                B = batch["color_aug"].shape[0]
                pairs = [((f, 0) if f < 0 else (0, f)) for f in temporal]
                pe_in = jnp.concatenate([
                    jnp.concatenate(
                        [batch["color_aug"][:, fid_index[a]],
                         batch["color_aug"][:, fid_index[b]]], axis=-1)
                    for a, b in pairs], axis=0)  # (P*B, H, W, 6)
                if self._paired_pose_ok():
                    from fusiondepth_tpu.models.paired import (
                        paired_resnet_apply,
                        sum_halves,
                    )

                    bp_in = jnp.concatenate([
                        jnp.concatenate(
                            [batch["two_channel"][:, fid_index[a]],
                             batch["two_channel"][:, fid_index[b]]], axis=-1)
                        for a, b in pairs], axis=0)
                    paired, upd_pe, upd_bp = paired_resnet_apply(
                        self.pose_depth, variables["pose_encoder"],
                        variables["beam_encoder_pose"], pe_in, bp_in,
                        train=train, dtype=self.pose_encoder.dtype)
                    if train:
                        updates["pose_encoder"] = upd_pe
                        updates["beam_encoder_pose"] = upd_bp
                    # pose decoder fuses the beam last feature ADDITIVELY
                    # (pose.py) -> pass the summed halves
                    pe_last = sum_halves(paired[-1])
                    aa, t = self.pose.apply(variables["pose"], [pe_last],
                                            beam_last_feature=None)
                else:
                    pe_feats, upd = self._apply(
                        self.pose_encoder, variables["pose_encoder"], pe_in,
                        train=train)
                    if upd:
                        updates["pose_encoder"] = upd
                    beam_last = None
                    if cfg.beam_encoder:
                        bp_in = jnp.concatenate([
                            jnp.concatenate(
                                [batch["two_channel"][:, fid_index[a]],
                                 batch["two_channel"][:, fid_index[b]]],
                                axis=-1)
                            for a, b in pairs], axis=0)
                        bp_feats, upd = self._apply(
                            self.beam_encoder_pose,
                            variables["beam_encoder_pose"], bp_in,
                            train=train)
                        if upd:
                            updates["beam_encoder_pose"] = upd
                        beam_last = bp_feats[-1]
                    aa, t = self.pose.apply(variables["pose"],
                                            [pe_feats[-1]],
                                            beam_last_feature=beam_last)
                for pi, f_i in enumerate(temporal):
                    aa_i = aa[pi * B:(pi + 1) * B]
                    t_i = t[pi * B:(pi + 1) * B]
                    outputs[("axisangle", 0, f_i)] = aa_i
                    outputs[("translation", 0, f_i)] = t_i
                    outputs[("cam_T_cam", 0, f_i)] = \
                        transformation_from_parameters(
                            aa_i[:, 0, 0], t_i[:, 0, 0], invert=(f_i < 0))
                return outputs, updates
            for f_i in temporal:
                # temporal order: (f_i, 0) if f_i < 0 else (0, f_i)
                pair = (f_i, 0) if f_i < 0 else (0, f_i)
                colors = [batch["color_aug"][:, fid_index[f]] for f in pair]

                beam_last = None
                if cfg.pose_model_type == "separate_resnet":
                    pe_in = jnp.concatenate(colors, axis=-1)
                    pe_feats, upd = self._apply(
                        self.pose_encoder, variables["pose_encoder"], pe_in,
                        train=train)
                    if upd:
                        updates["pose_encoder"] = upd
                    pose_in = [pe_feats[-1]]
                    if cfg.beam_encoder:
                        bp_in = jnp.concatenate(
                            [batch["two_channel"][:, fid_index[f]]
                             for f in pair], axis=-1)
                        bp_feats, upd = self._apply(
                            self.beam_encoder_pose,
                            variables["beam_encoder_pose"], bp_in,
                            train=train)
                        if upd:
                            updates["beam_encoder_pose"] = upd
                        beam_last = bp_feats[-1]
                    aa, t = self.pose.apply(variables["pose"], pose_in,
                                            beam_last_feature=beam_last)
                elif cfg.pose_model_type == "posecnn":
                    aa, t = self.pose.apply(
                        variables["pose"], jnp.concatenate(colors, axis=-1))
                else:  # shared: features is {frame_id: pyramid}
                    pose_in = [features[f][-1] for f in pair]
                    aa, t = self.pose.apply(variables["pose"], pose_in)

                outputs[("axisangle", 0, f_i)] = aa
                outputs[("translation", 0, f_i)] = t
                outputs[("cam_T_cam", 0, f_i)] = transformation_from_parameters(
                    aa[:, 0, 0], t[:, 0, 0], invert=(f_i < 0))
        else:
            colors = jnp.concatenate(
                [batch["color_aug"][:, fid_index[f]]
                 for f in cfg.frame_ids if f != "s"], axis=-1)
            if cfg.pose_model_type == "separate_resnet":
                pe_feats, upd = self._apply(
                    self.pose_encoder, variables["pose_encoder"], colors,
                    train=train)
                if upd:
                    updates["pose_encoder"] = upd
                aa, t = self.pose.apply(variables["pose"], [pe_feats[-1]])
            elif cfg.pose_model_type == "shared":
                aa, t = self.pose.apply(
                    variables["pose"],
                    [features[f][-1] for f in cfg.frame_ids if f != "s"])
            else:
                aa, t = self.pose.apply(variables["pose"], colors)
            for i, f_i in enumerate(cfg.frame_ids[1:]):
                if f_i == "s":
                    continue
                outputs[("axisangle", 0, f_i)] = aa
                outputs[("translation", 0, f_i)] = t
                outputs[("cam_T_cam", 0, f_i)] = transformation_from_parameters(
                    aa[:, i, 0], t[:, i, 0])
        return outputs, updates

    def forward(self, variables, batch, train: bool, with_pose: bool = True):
        cfg = self.cfg
        if cfg.pose_model_type == "shared" and cfg.use_pose_net:
            per_frame, updates = self.forward_shared_features(
                variables, batch, train)
            feats = per_frame[0]
            beam_feats = None
            if cfg.beam_encoder:
                beam_feats, upd = self._apply(
                    self.beam_encoder, variables["beam_encoder"],
                    batch["two_channel"][:, 0], train=train)
                if upd:
                    updates["beam_encoder"] = upd
            two_ch = batch["two_channel"][:, 0] if cfg.cat2end else None
            outputs = self.depth.apply(
                variables["depth"], feats, two_channel=two_ch,
                beam_features=beam_feats)
            if self.predictive_mask is not None:
                outputs["predictive_mask"] = self.predictive_mask.apply(
                    variables["predictive_mask"], feats)
            if with_pose:
                pose_out, pose_upd = self.predict_poses(
                    variables, batch, per_frame, train)
                outputs.update(pose_out)
                updates.update(pose_upd)
            return outputs, updates

        outputs, feats, updates = self.forward_depth(variables, batch, train)
        if with_pose and cfg.use_pose_net:
            pose_out, pose_upd = self.predict_poses(
                variables, batch, feats, train)
            outputs.update(pose_out)
            updates.update(pose_upd)
        return outputs, updates


def merge_batch_stats(variables: Dict[str, Any], updates: Dict[str, Any]):
    """Fold mutated batch_stats collections back into the variables tree."""
    out = dict(variables)
    for name, upd in updates.items():
        v = dict(out[name])
        v["batch_stats"] = upd["batch_stats"]
        out[name] = v
    return out
