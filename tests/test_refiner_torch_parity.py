"""Stage-2 (refiner) loss + gradient parity vs a torch transcription.

Pins the quirk-dense refine path the same way test_train_step_torch_parity
pins stage 1: the production JAX refine loss — frozen stage-1 forward
(eval-mode BN), pseudo-3D input construction (median-in-crop scaling,
(1/d-0.01)/9.9 renormalized disparity, Cat_xy XYZ maps, progressive
2-channel pooling), the road+catxy+deep refine decoder, photometric/
automask/smoothness, and the GDC-clone SI loss (x10 scale, weight 0.008,
x4 when scale-0-only) — must produce the SAME loss AND the SAME
refine-decoder gradients as an independent torch transcription of
reference refiner.py:316-346 (build), :557-563 (siloss), :592-693
(compute_losses), at float64 on a fixed tiny batch with shared weights.

Config = the reference refiner defaults (options.py:271-310): refine_iter
1, catxy/refine2d_deep/refine_a0 true, refine_depthnet_with_beam false,
gdc_loss_only_on_scale_0 true (store_false default).  refine_iter > 1 is
NOT covered because the reference's own loop is broken there: after
iteration 1 it feeds the refined C=1 disparity back as the C=6 pseudo-3D
injection, which crashes the torch decoder (refiner.py:356-362).

Documented deviations (PARITY.md): the median-scaling crop window scales
proportionally from its 192x640 definition (identical at the reference
resolution); the smoothness pyramid is the in-step antialiased resize,
shared with the oracle; automask tie-break noise is replayed exactly.
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.training.refiner import (
    RefinerNets,
    crop_window,
    make_refine_loss_fn,
)
from fusiondepth_tpu.training.train_state import combine_variables

from test_train_step_torch_parity import (
    _PoseDecT,
    _encoder_sd,
    _pose_sd,
    _t,
    _tconv,
    _tree_diffs,
)
from test_resnet_torch_parity import _ResNet18T
from test_decoder_torch_parity import _TorchDecoder, _copy_flax_to_torch
import torch_oracle as oracle

B, H, W = 2, 64, 96
SCALES = (0, 1, 2, 3)
SRC_FRAMES = (-1, 1)
FID = {0: 0, -1: 1, 1: 2}
ENC_CH = (64, 64, 128, 256, 512)
DEC_CH = (16, 32, 64, 128, 256)


class _RoadDeepDecoderT(tnn.Module):
    """Reference DepthDecoder(road=True, catxy=True, deep=True)
    (networks/depth_decoder.py:27-56): every ConvBlock doubled
    (ch->ch then ch->out), skips widened by 1+3+2 injected channels at
    every scale (incl. i=0, which has no encoder skip)."""

    INJ = 6  # scaled_disp(1) + xyz(3) + 2channel(2)

    def __init__(self):
        super().__init__()
        self.convs = tnn.ModuleDict()
        for i in range(4, -1, -1):
            cin = ENC_CH[-1] if i == 4 else DEC_CH[i + 1]
            self.convs[f"upconv_{i}_0_a"] = tnn.Conv2d(cin, cin, 3)
            self.convs[f"upconv_{i}_0_b"] = tnn.Conv2d(cin, DEC_CH[i], 3)
            cin = (DEC_CH[i] + (ENC_CH[i - 1] if i > 0 else 0)
                   + (self.INJ if i in SCALES else 0))
            self.convs[f"upconv_{i}_1_a"] = tnn.Conv2d(cin, cin, 3)
            self.convs[f"upconv_{i}_1_b"] = tnn.Conv2d(cin, DEC_CH[i], 3)
        for s in range(4):
            self.convs[f"dispconv_{s}"] = tnn.Conv2d(DEC_CH[s], 1, 3)

    @staticmethod
    def _block(conv, x):
        return F.elu(conv(F.pad(x, (1, 1, 1, 1), mode="reflect")))

    def forward(self, feats, beam_feats, depth_maps):
        out = {}
        x = feats[-1] + beam_feats[-1]
        for i in range(4, -1, -1):
            x = self._block(self.convs[f"upconv_{i}_0_a"], x)
            x = self._block(self.convs[f"upconv_{i}_0_b"], x)
            xs = [F.interpolate(x, scale_factor=2, mode="nearest")]
            if i > 0:
                xs.append(feats[i - 1] + beam_feats[i - 1])
            if i in SCALES:
                xs.append(depth_maps[i])
            x = torch.cat(xs, 1)
            x = self._block(self.convs[f"upconv_{i}_1_a"], x)
            x = self._block(self.convs[f"upconv_{i}_1_b"], x)
            if i in SCALES:
                d = self.convs[f"dispconv_{i}"](
                    F.pad(x, (1, 1, 1, 1), mode="reflect"))
                out[i] = torch.sigmoid(d)
        return out


def _copy_refine_to_torch(params, tmodel):
    """Flax deep-decoder params (upconv_{i}_{j}/{a,b}/conv) -> torch."""
    sd = {}
    for i in range(5):
        for j in range(2):
            for ab in ("a", "b"):
                p = params[f"upconv_{i}_{j}"][ab]["conv"]
                sd[f"convs.upconv_{i}_{j}_{ab}.weight"] = _tconv(p["kernel"])
                sd[f"convs.upconv_{i}_{j}_{ab}.bias"] = _t(p["bias"])
    for s in range(4):
        p = params[f"dispconv_{s}"]["conv"]
        sd[f"convs.dispconv_{s}.weight"] = _tconv(p["kernel"])
        sd[f"convs.dispconv_{s}.bias"] = _t(p["bias"])
    tmodel.load_state_dict(sd)


def _refine_grads_to_flax(tmodel):
    g = {}
    for i in range(5):
        for j in range(2):
            g[f"upconv_{i}_{j}"] = {
                ab: {"conv": {
                    "kernel": np.transpose(
                        tmodel.convs[f"upconv_{i}_{j}_{ab}"]
                        .weight.grad.numpy(), (2, 3, 1, 0)),
                    "bias": tmodel.convs[f"upconv_{i}_{j}_{ab}"]
                    .bias.grad.numpy()}}
                for ab in ("a", "b")}
    for s in range(4):
        conv = tmodel.convs[f"dispconv_{s}"]
        g[f"dispconv_{s}"] = {"conv": {
            "kernel": np.transpose(conv.weight.grad.numpy(), (2, 3, 1, 0)),
            "bias": conv.bias.grad.numpy()}}
    return g


def test_refiner_step_loss_and_grad_parity():
    with jax.enable_x64():
        cfg = Config(num_layers=18, height=H, width=W, batch_size=B,
                     compute_dtype="float64", pallas_warp=False,
                     weights_init="scratch")
        nets = RefinerNets(cfg)
        frozen = nets.stage1.init(jax.random.PRNGKey(0), batch_size=B)
        frozen = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float64)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
            frozen)
        refine_params = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float64),
            nets.init_refine(jax.random.PRNGKey(3), batch_size=B))

        rng = np.random.default_rng(11)
        F_ = len(cfg.frame_ids)
        color = rng.uniform(0, 1, (B, F_, H, W, 3))
        color_aug = np.clip(color + rng.normal(0, 0.02, color.shape), 0, 1)
        two_ch = np.zeros((B, F_, H, W, 2))
        hit = rng.uniform(size=(B, F_, H, W)) < 0.15
        d = rng.uniform(2.0, 20.0, (B, F_, H, W))
        two_ch[..., 0] = np.where(hit, d / 100.0, 0.0)
        two_ch[..., 1] = np.where(hit, 1.0 / (d + 1.0), 0.0)
        four_beam = np.where(rng.uniform(size=(B, H, W, 1)) < 0.1,
                             rng.uniform(3.0, 7.0, (B, H, W, 1)) / 100.0,
                             0.0)
        # GDC targets near the random-init depth (~0.2 m) so the siloss
        # valid mask (|pred-target| < 2) is well-populated
        inf_gdc = rng.uniform(0.5, 1.5, (B, H, W, 1))
        K = np.zeros((B, 4, 4))
        K[:, 0, 0], K[:, 1, 1] = 0.58 * W, 1.92 * H
        K[:, 0, 2], K[:, 1, 2] = 0.5 * W, 0.5 * H
        K[:, 2, 2] = K[:, 3, 3] = 1.0
        batch = {
            "color": jnp.asarray(color),
            "color_aug": jnp.asarray(color_aug),
            "two_channel": jnp.asarray(two_ch),
            "four_beam": jnp.asarray(four_beam),
            "inf_gdc": jnp.asarray(inf_gdc),
            "K": jnp.asarray(K),
            "inv_K": jnp.asarray(np.linalg.inv(K)),
        }

        key = jax.random.PRNGKey(42)
        loss_fn = make_refine_loss_fn(cfg, nets)
        (jax_loss, _), jax_grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True)
        )(refine_params, frozen, batch, key)
        jax_loss = float(jax_loss)

        # replay the automask tie-break noise: loss_fn splits once per
        # refine iteration, _refine_losses once per scale
        r, sub_it = jax.random.split(key)
        noise = {}
        rr = sub_it
        for scale in SCALES:
            rr, sub = jax.random.split(rr)
            n = np.asarray(
                jax.random.normal(sub, (len(SRC_FRAMES), B, H, W))) * 1e-5
            noise[scale] = _t(np.transpose(n, (1, 0, 2, 3)))

        from fusiondepth_tpu.ops.planes import to_planes
        from fusiondepth_tpu.training.photometric import _pyramid_planes

        target_p = to_planes(batch["color"][:, 0]).astype(jnp.float64)
        pyr = _pyramid_planes(cfg, target_p)
        color_pyr = {s: _t(pyr[s]) for s in SCALES}

        s1_params = {k: frozen[k]["params"] for k in frozen}
        s1_stats = {k: frozen[k].get("batch_stats", {}) for k in frozen}

    # ---------------- torch twin (float64, stage-1 in eval mode) --------
    torch.set_default_dtype(torch.float64)
    try:
        enc3 = _ResNet18T(3).eval().double()
        enc2 = _ResNet18T(2).eval().double()
        enc6 = _ResNet18T(6).eval().double()
        enc4 = _ResNet18T(4).eval().double()
        for enc, name in ((enc3, "encoder"), (enc2, "beam_encoder"),
                          (enc6, "pose_encoder"),
                          (enc4, "beam_encoder_pose")):
            missing, unexpected = enc.load_state_dict(
                _encoder_sd(s1_params[name], s1_stats[name]), strict=False)
            assert all("num_batches_tracked" in k for k in missing), missing
            assert not unexpected, unexpected
            for p in enc.parameters():
                p.requires_grad_(False)
        dec = _TorchDecoder().eval().double()
        _copy_flax_to_torch(
            jax.tree.map(lambda x: np.asarray(x, np.float64),
                         s1_params["depth"]), dec)
        for p in dec.parameters():
            p.requires_grad_(False)
        posed = _PoseDecT().eval().double()
        posed.load_state_dict(_pose_sd(s1_params["pose"]))
        for p in posed.parameters():
            p.requires_grad_(False)
        refdec = _RoadDeepDecoderT().train().double()
        _copy_refine_to_torch(
            jax.tree.map(lambda x: np.asarray(x, np.float64),
                         refine_params["params"]), refdec)

        def nchw(a):
            return _t(np.moveaxis(np.asarray(a), -1, 1))

        colors = {f: nchw(color[:, FID[f]]) for f in (0, -1, 1)}
        colors_aug = {f: nchw(color_aug[:, FID[f]]) for f in (0, -1, 1)}
        two_t = {f: nchw(two_ch[:, FID[f]]) for f in (0, -1, 1)}
        norm = lambda x: (x - 0.45) / 0.225  # noqa: E731

        with torch.no_grad():
            feats = enc3(norm(colors_aug[0]))
            bfeats = enc2(norm(two_t[0]))
            # refine_depthnet_with_beam=false: stage-1 depth WITHOUT beam
            # fusion (refiner.py process_batch)
            disps_t = dec(feats)
            s1_disps = {s: disps_t[("disp", s)] for s in SCALES}

            pairs = [(-1, 0), (0, 1)]
            pe_in = torch.cat([torch.cat([colors_aug[a], colors_aug[b]], 1)
                               for a, b in pairs], 0)
            bp_in = torch.cat([torch.cat([two_t[a], two_t[b]], 1)
                               for a, b in pairs], 0)
            pf = enc6(norm(pe_in))[-1]
            bf = enc4(norm(bp_in))[-1]
            aa, tr = posed(pf, bf)
            cam_T = {}
            for pi, f in enumerate(SRC_FRAMES):
                cam_T[f] = oracle.transformation_from_parameters_t(
                    aa[pi * B:(pi + 1) * B, 0], tr[pi * B:(pi + 1) * B, 0],
                    invert=(f < 0))

        # per-scale inv_K the reference dataset way (mono_dataset:166-175)
        inv_K_ps = {}
        for s in SCALES:
            Ks = K.copy()
            Ks[:, 0, :] *= (W // 2 ** s) / W
            Ks[:, 1, :] *= (H // 2 ** s) / H
            inv_K_ps[s] = _t(np.linalg.inv(Ks))

        depth_maps = oracle.build_pseudo3d_t(
            s1_disps, nchw(four_beam), two_t[0], inv_K_ps, H, W, SCALES,
            crop_window(H, W), cfg.min_depth, cfg.max_depth,
            refine_a0=cfg.refine_a0, catxy=cfg.catxy)

        refined = refdec(feats, bfeats, depth_maps)
        ref_disps = {s: refined[s] for s in SCALES}

        warped, _ = oracle.generate_images_pred_t(
            ref_disps, cam_T, {f: colors[f] for f in SRC_FRAMES},
            _t(K), _t(np.linalg.inv(K)), H, W,
            cfg.min_depth, cfg.max_depth)
        torch_loss = oracle.refiner_losses_t(
            ref_disps, warped, colors, color_pyr, nchw(inf_gdc).squeeze(1),
            noise, H, W, SCALES, SRC_FRAMES, cfg.min_depth, cfg.max_depth,
            cfg.disparity_smoothness, cfg.gdc_loss_threshold, cfg.si_var,
            cfg.gdc_loss_weight,
            gdc_loss_only_on_scale_0=cfg.gdc_loss_only_on_scale_0,
            gama=1.0)
        torch_loss.backward()
    finally:
        torch.set_default_dtype(torch.float32)

    assert abs(jax_loss - float(torch_loss)) < 1e-6, (
        f"refiner loss diverged: jax={jax_loss!r} torch={float(torch_loss)!r}")

    bad = _tree_diffs(jax_grads["params"], _refine_grads_to_flax(refdec),
                      "refine2d", rtol=1e-5, atol=1e-9)
    assert not bad, "refine grad leaves diverged:\n" + "\n".join(bad)
