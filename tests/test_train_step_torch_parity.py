"""END-TO-END train-step parity vs a torch transcription of the reference.

The strongest training-equivalence proxy this box can produce (no KITTI, no
ImageNet weights over the zero-egress tunnel): the production JAX loss
function — four ResNet-18 encoders, depth + pose decoders, full-res view
synthesis, automasked SSIM+L1 photometric loss, normalized smoothness, SI
loss — must produce the SAME loss value AND the SAME parameter gradients
as an independent torch oracle (tests/torch_oracle.py, transcribed from
reference trainer.py:425-596 + layers.py) on a fixed tiny batch, with both
sides sharing weights, at float64.

Wiring deviations deliberately mirrored (each documented in PARITY.md):
- pose frame-pairs stacked on the batch axis (ONE pose-encoder pass); BN
  batch statistics pool over both pairs (fusion.py predict_poses).
- the smoothness color pyramid is the in-step antialiased resize
  (photometric._pyramid_planes); the oracle consumes the SAME pyramid
  arrays — the host-side PIL resize is out of scope here.
- automask tie-break noise replayed exactly: the test replicates the JAX
  PRNG split sequence (photometric.py scale loop) and feeds the identical
  arrays to the oracle (reference trainer.py:549-551).

This exercises the production formulations (planes loss layout, folded
decoder, fold64 encoder) — all pinned exact vs their generic forms by
their own suites — end to end through the real `make_loss_fn`.
"""

import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from fusiondepth_tpu.config import Config
from fusiondepth_tpu.models.fusion import FusionNets
from fusiondepth_tpu.models.torch_import import convert_resnet
from fusiondepth_tpu.training.train_state import make_loss_fn, split_variables

from test_resnet_torch_parity import _ResNet18T
from test_decoder_torch_parity import _TorchDecoder, _copy_flax_to_torch
import torch_oracle as oracle

B, H, W = 2, 64, 96
SCALES = (0, 1, 2, 3)
SRC_FRAMES = (-1, 1)  # cfg.frame_ids[1:]
FID = {0: 0, -1: 1, 1: 2}


# ---------------------------------------------------------------- weights

def _t(a):
    return torch.from_numpy(np.asarray(a, np.float64))


def _tconv(kernel):  # flax HWIO -> torch OIHW
    return _t(np.transpose(np.asarray(kernel), (3, 2, 0, 1)))


def _encoder_sd(params, stats):
    """Flax ResnetEncoder params -> torch state dict (R18 twin naming)."""
    sd = {"conv1.weight": _tconv(params["conv1"]["kernel"])}

    def bn(name, p, s):
        sd[f"{name}.weight"] = _t(p["scale"])
        sd[f"{name}.bias"] = _t(p["bias"])
        sd[f"{name}.running_mean"] = _t(s["mean"])
        sd[f"{name}.running_var"] = _t(s["var"])

    bn("bn1", params["bn1"], stats["bn1"])
    for si in range(4):
        for bi in range(2):
            fp, tp = f"layer{si + 1}_{bi}", f"layer{si + 1}.{bi}"
            for ci in (1, 2):
                sd[f"{tp}.conv{ci}.weight"] = _tconv(
                    params[fp][f"conv{ci}"]["kernel"])
                bn(f"{tp}.bn{ci}", params[fp][f"bn{ci}"],
                   stats[fp][f"bn{ci}"])
            if "downsample_conv" in params[fp]:
                sd[f"{tp}.downsample.0.weight"] = _tconv(
                    params[fp]["downsample_conv"]["kernel"])
                bn(f"{tp}.downsample.1", params[fp]["downsample_bn"],
                   stats[fp]["downsample_bn"])
    return sd


def _encoder_grads_to_flax(model, in_ch):
    """Torch .grad tensors -> flax-layout tree via the tested converter."""
    gsd = {}
    for name, p in model.named_parameters():
        g = p.grad
        gsd[name] = (np.zeros(p.shape, np.float64) if g is None
                     else g.detach().numpy())
    for name, buf in model.named_buffers():
        gsd[name] = np.zeros(buf.shape, np.float64)  # running stats: unused
    return convert_resnet(gsd, 18, in_channels=in_ch)["params"]


class _PoseDecT(tnn.Module):
    """Reference PoseDecoder (networks/pose_decoder.py:8-51), single input
    feature, 2 frames predicted, additive beam fusion before the squeeze."""

    def __init__(self):
        super().__init__()
        self.squeeze = tnn.Conv2d(512, 256, 1)
        self.pose_0 = tnn.Conv2d(256, 256, 3, 1, 1)
        self.pose_1 = tnn.Conv2d(256, 256, 3, 1, 1)
        self.pose_2 = tnn.Conv2d(256, 12, 1)

    def forward(self, last, beam_last):
        x = last + beam_last
        x = torch.relu(self.squeeze(x))
        x = torch.relu(self.pose_0(x))
        x = torch.relu(self.pose_1(x))
        x = self.pose_2(x)
        x = x.mean(3).mean(2)
        x = 0.01 * x.reshape(-1, 2, 1, 6)
        return x[..., :3], x[..., 3:]


def _pose_sd(params):
    sd = {}
    for name in ("squeeze", "pose_0", "pose_1", "pose_2"):
        sd[f"{name}.weight"] = _tconv(params[name]["kernel"])
        sd[f"{name}.bias"] = _t(params[name]["bias"])
    return sd


def _pose_grads_to_flax(model):
    return {
        name: {"kernel": np.transpose(
                   getattr(model, name).weight.grad.numpy(), (2, 3, 1, 0)),
               "bias": getattr(model, name).bias.grad.numpy()}
        for name in ("squeeze", "pose_0", "pose_1", "pose_2")
    }


def _decoder_grads_to_flax(tmodel):
    g = {}
    for i in range(5):
        for j in range(2):
            conv = tmodel.convs[f"upconv_{i}_{j}"]
            g[f"upconv_{i}_{j}"] = {"conv": {
                "kernel": np.transpose(conv.weight.grad.numpy(),
                                       (2, 3, 1, 0)),
                "bias": conv.bias.grad.numpy()}}
    for s in range(4):
        conv = tmodel.convs[f"dispconv_{s}"]
        g[f"dispconv_{s}"] = {"conv": {
            "kernel": np.transpose(conv.weight.grad.numpy(), (2, 3, 1, 0)),
            "bias": conv.bias.grad.numpy()}}
    return g


def _tree_diffs(jax_tree, oracle_tree, net, rtol, atol):
    """Compare leaf-by-leaf; return a list of 'net/path: maxabs maxrel'
    report lines for every leaf violating |j-o| <= atol + rtol*|o|."""
    jl, jd = jax.tree_util.tree_flatten_with_path(jax_tree)
    ol, od = jax.tree_util.tree_flatten_with_path(oracle_tree)
    assert jd == od, f"{net}: tree structure mismatch"
    bad = []
    for (path, jv), (_, ov) in zip(jl, ol):
        j = np.asarray(jv, np.float64)
        o = np.asarray(ov, np.float64)
        err = np.abs(j - o) - (atol + rtol * np.abs(o))
        if np.max(err) > 0:
            ad = np.abs(j - o)
            rel = np.max(ad / (np.abs(o) + atol))
            bad.append(
                f"{net}{jax.tree_util.keystr(path)}: max|d|={np.max(ad):.3e}"
                f" maxrel={rel:.3e} scale={np.max(np.abs(o)):.3e}"
                f" frac_bad={np.mean(err > 0):.3f}")
    return bad


# ---------------------------------------------------------------- the test

def test_train_step_loss_and_grad_parity():
    with jax.enable_x64():
        cfg = Config(num_layers=18, height=H, width=W, batch_size=B,
                     compute_dtype="float64", pallas_warp=False,
                     weights_init="scratch")
        nets = FusionNets(cfg)
        variables = nets.init(jax.random.PRNGKey(0), batch_size=B)
        variables = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float64)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
            variables)
        params, stats = split_variables(variables)

        rng = np.random.default_rng(7)
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
        K = np.zeros((B, 4, 4))
        K[:, 0, 0], K[:, 1, 1] = 0.58 * W, 1.92 * H
        K[:, 0, 2], K[:, 1, 2] = 0.5 * W, 0.5 * H
        K[:, 2, 2] = K[:, 3, 3] = 1.0
        batch = {
            "color": jnp.asarray(color),
            "color_aug": jnp.asarray(color_aug),
            "two_channel": jnp.asarray(two_ch),
            "four_beam": jnp.asarray(four_beam),
            "K": jnp.asarray(K),
            "inv_K": jnp.asarray(np.linalg.inv(K)),
        }

        key = jax.random.PRNGKey(42)
        loss_fn = make_loss_fn(cfg, nets)
        (jax_loss, (losses, _)), jax_grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True)
        )(params, stats, batch, key)
        jax_loss = float(jax_loss)

        # replay the automask tie-break noise (photometric.py scale loop)
        noise = {}
        r = key
        for scale in SCALES:
            r, sub = jax.random.split(r)
            n = np.asarray(
                jax.random.normal(sub, (len(SRC_FRAMES), B, H, W))) * 1e-5
            noise[scale] = _t(np.transpose(n, (1, 0, 2, 3)))

        # the in-step smoothness pyramid, shared with the oracle
        from fusiondepth_tpu.ops.planes import to_planes
        from fusiondepth_tpu.training.photometric import _pyramid_planes

        target_p = to_planes(batch["color"][:, 0]).astype(jnp.float64)
        pyr = _pyramid_planes(cfg, target_p)
        color_pyr = {s: _t(pyr[s]) for s in SCALES}

    # ---------------- torch oracle (float64 end to end) ----------------
    torch.set_default_dtype(torch.float64)
    try:
        enc3 = _ResNet18T(3).train().double()
        enc2 = _ResNet18T(2).train().double()
        enc6 = _ResNet18T(6).train().double()
        enc4 = _ResNet18T(4).train().double()
        for enc, name in ((enc3, "encoder"), (enc2, "beam_encoder"),
                          (enc6, "pose_encoder"),
                          (enc4, "beam_encoder_pose")):
            missing, unexpected = enc.load_state_dict(
                _encoder_sd(params[name], stats[name]), strict=False)
            assert all("num_batches_tracked" in k for k in missing), missing
            assert not unexpected, unexpected
        dec = _TorchDecoder().train().double()
        _copy_flax_to_torch(
            jax.tree.map(lambda x: np.asarray(x, np.float64),
                         params["depth"]), dec)
        posed = _PoseDecT().train().double()
        posed.load_state_dict(_pose_sd(params["pose"]))

        def nchw(a):
            return _t(np.moveaxis(np.asarray(a), -1, 1))

        colors = {f: nchw(color[:, FID[f]]) for f in (0, -1, 1)}
        colors_aug = {f: nchw(color_aug[:, FID[f]]) for f in (0, -1, 1)}
        two_t = {f: nchw(two_ch[:, FID[f]]) for f in (0, -1, 1)}
        norm = lambda x: (x - 0.45) / 0.225

        # depth branch: encoder + beam encoder, additive feature fusion
        feats = enc3(norm(colors_aug[0]))
        bfeats = enc2(norm(two_t[0]))
        disps_t = dec([a + b for a, b in zip(feats, bfeats)])
        disps = {s: disps_t[("disp", s)] for s in SCALES}

        # pose branch: both pairs stacked on the batch axis (fusion.py)
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

        warped, _ = oracle.generate_images_pred_t(
            disps, cam_T, {f: colors[f] for f in SRC_FRAMES},
            _t(K), _t(np.linalg.inv(K)), H, W,
            cfg.min_depth, cfg.max_depth)
        torch_loss = oracle.compute_losses_t(
            disps, warped, colors, color_pyr,
            nchw(four_beam), noise, H, W, SCALES, SRC_FRAMES,
            cfg.min_depth, cfg.max_depth, cfg.disparity_smoothness,
            cfg.gdc_loss_threshold, cfg.si_var)
        torch_loss.backward()
    finally:
        torch.set_default_dtype(torch.float32)

    # ---------------- compare ----------------
    assert abs(jax_loss - float(torch_loss)) < 1e-6, (
        f"loss diverged: jax={jax_loss!r} torch={float(torch_loss)!r}")

    bad = []
    for enc, name, in_ch in ((enc3, "encoder", 3), (enc2, "beam_encoder", 2),
                             (enc6, "pose_encoder", 6),
                             (enc4, "beam_encoder_pose", 4)):
        bad += _tree_diffs(jax_grads[name], _encoder_grads_to_flax(enc, in_ch),
                           name, rtol=1e-5, atol=1e-9)
    bad += _tree_diffs(jax_grads["depth"], _decoder_grads_to_flax(dec),
                       "depth", rtol=1e-5, atol=1e-9)
    bad += _tree_diffs(jax_grads["pose"], _pose_grads_to_flax(posed),
                       "pose", rtol=1e-5, atol=1e-9)
    assert not bad, "grad leaves diverged:\n" + "\n".join(bad)
