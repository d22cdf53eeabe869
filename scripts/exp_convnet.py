"""One-off: where do net_fwd's 30 ms go? Times conv-net pieces in
isolation on the real TPU with the bench.py measurement model (scan-fold,
one-scalar fetch). Prints ms per unit plus an ideal-roofline estimate.

Pieces:
  enc3        ResnetEncoder(18, 3ch) b12 fwd, train=True
  enc3_eval   same, train=False (running BN stats — isolates stat cost)
  enc3_grad   same + full backward
  enc6        pose-style encoder (6ch, b24) fwd
  dec         DepthDecoder fwd on enc3 features
  pose_dec    PoseDecoder on enc6 last feature
  nets        FusionNets.forward (the anatomy's net_fwd, for cross-check)
  conv64      single 3x3 64->64 conv at 48x160 b12 (MXU calibration)
  conv256     single 3x3 256->256 conv at 12x40 b12

Usage: python scripts/exp_convnet.py [--pieces enc3,dec,...]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import _timeit_stats  # noqa: E402
from scripts.bench_anatomy import scan_fold  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pieces", default="conv64,conv256,enc3,enc3_eval,"
                                       "enc3_grad,enc3_s2d,enc3_s2d_grad,"
                                       "enc6,dec,nets")
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--costs", action="store_true",
                   help="XLA compiled cost analysis instead of timing")
    args = p.parse_args()
    pieces = args.pieces.split(",")
    B = args.batch

    from fusiondepth_tpu.config import Config
    from fusiondepth_tpu.data.synthetic import make_batch
    from fusiondepth_tpu.models.depth_decoder import DepthDecoder
    from fusiondepth_tpu.models.fusion import FusionNets
    from fusiondepth_tpu.models.resnet import ResnetEncoder
    from fusiondepth_tpu.training.train_state import (
        combine_variables,
        create_train_state,
        make_optimizer,
    )

    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    def timed(name, fn_c, *fargs, flops=None):
        jfn, n = scan_fold(fn_c)
        if args.costs:
            ca = jfn.lower(*fargs).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            fl = float(ca.get("flops", 0) or 0)
            by = float(ca.get("bytes accessed", 0) or 0)
            print(f"{name:14s} {fl/1e9:8.1f} GF  {by/1e9:8.2f} GB  "
                  f"(byte-roofline {by/819e9*1e3:6.2f} ms)", flush=True)
            return
        st = _timeit_stats(lambda: jfn(*fargs), iters=1, warmup=2, trials=3)
        ms = st["median"] / n * 1e3
        extra = ""
        if flops:
            extra = (f"  [{flops/1e9:6.1f} GF -> ideal "
                     f"{flops/197e12*1e3:5.2f} ms, mfu {flops/197e12/ms*1e3*100:4.1f}%]")
        print(f"{name:10s} {ms:8.2f} ms{extra}", flush=True)

    if "conv64" in pieces:
        import flax.linen as nn

        m = nn.Conv(64, (3, 3), padding=1, use_bias=False, dtype=dt)
        x = jnp.zeros((B, 48, 160, 64), dt)
        v = m.init(rng, x)

        def f(c, v, x):
            return m.apply(v, x + c * 1e-30).astype(jnp.float32).mean()

        timed("conv64", f, v, x, flops=2 * 9 * 64 * 64 * 48 * 160 * B)

    if "convg" in pieces:
        # 2-group conv at C=128 vs two separate C=64 convs: if XLA lowers
        # feature_group_count=2 as one full-lane-density pass, pairing the
        # depth+beam (and pose+beam-pose) encoders halves encoder time
        w2 = jnp.zeros((3, 3, 64, 128), dt)  # grouped kernel: in C/g=64
        xg = jnp.zeros((B, 48, 160, 128), dt)

        def fg(c, w, x):
            y = jax.lax.conv_general_dilated(
                x + c.astype(x.dtype) * 1e-30, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=2)
            return y.astype(jnp.float32).mean()

        timed("convg", fg, w2, xg, flops=2 * 2 * 9 * 64 * 64 * 48 * 160 * B)

        def fg_g(c, w, x):
            gw = jax.grad(lambda ww: fg(c, ww, x))(w)
            return jnp.sum(gw.astype(jnp.float32)) * 1e-20

        timed("convg_grad", fg_g, w2, xg,
              flops=3 * 2 * 2 * 9 * 64 * 64 * 48 * 160 * B)

    if "conv64_grad" in pieces:
        import flax.linen as nn

        m = nn.Conv(64, (3, 3), padding=1, use_bias=False, dtype=dt)
        x = jnp.zeros((B, 48, 160, 64), dt)
        v = m.init(rng, x)

        def f64(c, v, x):
            return m.apply(v, x + c * 1e-30).astype(jnp.float32).mean()

        def f64_g(c, v, x):
            g = jax.grad(lambda vv: f64(c, vv, x))(v)
            return sum(jnp.sum(t.astype(jnp.float32))
                       for t in jax.tree.leaves(g)) * 1e-20

        timed("conv64_grad", f64_g, v, x,
              flops=3 * 2 * 9 * 64 * 64 * 48 * 160 * B)

    if "mm576" in pieces:
        # the SAME contraction a 3x3 64->64 conv @48x160 b12 performs, as a
        # plain matmul over pre-formed patches: isolates conv-lowering
        # overhead from MXU capability
        a = jnp.zeros((B * 48 * 160, 576), dt)
        w = jnp.zeros((576, 64), dt)

        def f(c, a, w):
            return (a + c * 1e-30) @ w

        def g(c, a, w):
            return f(c, a, w).astype(jnp.float32).mean()

        timed("mm576", g, a, w, flops=2 * B * 48 * 160 * 576 * 64)

    if "conv128" in pieces:
        import flax.linen as nn

        m = nn.Conv(128, (3, 3), padding=1, use_bias=False, dtype=dt)
        x = jnp.zeros((B, 24, 80, 128), dt)
        v = m.init(rng, x)

        def f(c, v, x):
            return m.apply(v, x + c * 1e-30).astype(jnp.float32).mean()

        timed("conv128", f, v, x, flops=2 * 9 * 128 * 128 * 24 * 80 * B)

    if "conv16" in pieces:
        import flax.linen as nn

        # decoder stage-0 size: full res, 16 channels
        m = nn.Conv(16, (3, 3), padding=1, use_bias=False, dtype=dt)
        x = jnp.zeros((B, 192, 640, 16), dt)
        v = m.init(rng, x)

        def f(c, v, x):
            return m.apply(v, x + c * 1e-30).astype(jnp.float32).mean()

        timed("conv16", f, v, x, flops=2 * 9 * 16 * 16 * 192 * 640 * B)

    if "conv16f" in pieces:
        # folded conv: (B,H,W,16) viewed as (B,H,W/8,128) [free bitcast in
        # (W,C)-contiguous layout]; the 3x3 16->16 conv becomes a 3x3
        # 128->128 conv whose kernel holds w on the fold-band (dx = 8*(dxf-1)
        # + pi - po in [-1,1]) and zeros elsewhere. 8x the MACs, but full
        # lane occupancy and dense bytes.
        F = 8
        C = 16
        w = jnp.zeros((3, 3, C, C), dt)

        def fold_kernel(w):
            wf = jnp.zeros((3, 3, F * C, F * C), dt)
            for dxf in range(3):
                for pi in range(F):
                    for po in range(F):
                        dx = 8 * (dxf - 1) + pi - po
                        if -1 <= dx <= 1:
                            wf = wf.at[:, dxf, pi * C:(pi + 1) * C,
                                       po * C:(po + 1) * C].set(
                                           w[:, dx + 1])
            return wf

        x = jnp.zeros((B, 192, 640 // F, F * C), dt)

        def f(c, w, x):
            wf = fold_kernel(w)
            y = jax.lax.conv_general_dilated(
                x + c.astype(x.dtype) * 1e-30, wf, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y.astype(jnp.float32).mean()

        timed("conv16f", f, w, x, flops=2 * 9 * 16 * 16 * 192 * 640 * B)

    if "conv16t" in pieces:
        # NHCW layout probe: W minor (dense lanes), C in sublanes
        import flax.linen as nn

        w = jnp.zeros((3, 3, 16, 16), dt)
        x = jnp.zeros((B, 192, 16, 640), dt)

        def f(c, w, x):
            y = jax.lax.conv_general_dilated(
                x + c.astype(x.dtype) * 1e-30, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHCW", "HWIO", "NHCW"))
            return y.astype(jnp.float32).mean()

        timed("conv16t", f, w, x, flops=2 * 9 * 16 * 16 * 192 * 640 * B)

    if "cb16" in pieces:
        from fusiondepth_tpu.models.depth_decoder import ConvBlock

        m = ConvBlock(16, dtype=dt)
        x = jnp.zeros((B, 192, 640, 16), dt)
        v = m.init(rng, x)

        def f(c, v, x):
            return m.apply(v, x + c * 1e-30).astype(jnp.float32).mean()

        timed("cb16", f, v, x, flops=2 * 9 * 16 * 16 * 192 * 640 * B)

    if "up16" in pieces:
        from fusiondepth_tpu.ops.resize import upsample2x_nearest

        x = jnp.zeros((B, 96, 320, 16), dt)

        def f(c, x):
            return upsample2x_nearest(x + c * 1e-30).astype(
                jnp.float32).mean()

        timed("up16", f, x, flops=0)

    if "dec_grad" in pieces:
        feats_g = [jnp.zeros((B, 96, 320, 64), dt),
                   jnp.zeros((B, 48, 160, 64), dt),
                   jnp.zeros((B, 24, 80, 128), dt),
                   jnp.zeros((B, 12, 40, 256), dt),
                   jnp.zeros((B, 6, 20, 512), dt)]
        dec_g = DepthDecoder(dtype=dt)
        vdg = dec_g.init(rng, feats_g)

        def dg(c, v, fs):
            def l(p):
                out = dec_g.apply({"params": p["params"]},
                                  [t + c * 1e-30 for t in fs])
                return sum(t.astype(jnp.float32).mean()
                           for t in out.values())
            gr = jax.grad(l)(v)
            return sum(jnp.sum(t.astype(jnp.float32))
                       for t in jax.tree.leaves(gr)) * 1e-20

        timed("dec_grad", dg, vdg, feats_g, flops=150e9)

    if "decf" in pieces or "dec_gradf" in pieces:
        feats_g = [jnp.zeros((B, 96, 320, 64), dt),
                   jnp.zeros((B, 48, 160, 64), dt),
                   jnp.zeros((B, 24, 80, 128), dt),
                   jnp.zeros((B, 12, 40, 256), dt),
                   jnp.zeros((B, 6, 20, 512), dt)]
        dec_f = DepthDecoder(dtype=dt, folded=True)
        vdf = dec_f.init(rng, feats_g)

        if "decf" in pieces:
            def ff(c, v, fs):
                fs = [t + c * 1e-30 for t in fs]
                out = dec_f.apply(v, fs)
                return sum(t.astype(jnp.float32).mean()
                           for t in out.values())

            timed("decf", ff, vdf, feats_g, flops=50e9)

        if "dec_gradf" in pieces:
            def dgf(c, v, fs):
                def l(p):
                    out = dec_f.apply({"params": p["params"]},
                                      [t + c * 1e-30 for t in fs])
                    return sum(t.astype(jnp.float32).mean()
                               for t in out.values())
                gr = jax.grad(l)(v)
                return sum(jnp.sum(t.astype(jnp.float32))
                           for t in jax.tree.leaves(gr)) * 1e-20

            timed("dec_gradf", dgf, vdf, feats_g, flops=150e9)

    for pc in pieces:
        # decstopK / decstopK (grad): folded decoder truncated after stage
        # K (4..1); successive differences vs dec_gradf give the
        # in-context marginal grad cost of each up-stage
        if not pc.startswith("decstop"):
            continue
        k = int(pc[7:])
        feats_t = [jnp.zeros((B, 96, 320, 64), dt),
                   jnp.zeros((B, 48, 160, 64), dt),
                   jnp.zeros((B, 24, 80, 128), dt),
                   jnp.zeros((B, 12, 40, 256), dt),
                   jnp.zeros((B, 6, 20, 512), dt)]
        dec_t = DepthDecoder(dtype=dt, folded=True, probe_stop=k)
        vdt = dec_t.init(rng, feats_t)

        def dgt(c, v, fs, m=dec_t):
            def l(p):
                out = m.apply({"params": p["params"]},
                              [t + c * 1e-30 for t in fs])
                return sum(t.astype(jnp.float32).mean()
                           for t in out.values())
            gr = jax.grad(l)(v)
            return sum(jnp.sum(t.astype(jnp.float32))
                       for t in jax.tree.leaves(gr)) * 1e-20

        timed(pc, dgt, vdt, feats_t)

    if "convg4_16" in pieces or "convg4_16_grad" in pieces:
        # batch-packed decoder stage-0 conv: 4 batch samples' 16 channels
        # side by side in lanes, feature_group_count=4 — dense MACs (no
        # band inflation), density depends on XLA's grouped lowering
        wg4 = jnp.zeros((3, 3, 16, 64), dt)
        xg4 = jnp.zeros((B // 4, 192, 640, 64), dt)

        def fg4(c, w, x):
            y = jax.lax.conv_general_dilated(
                x + c.astype(x.dtype) * 1e-30, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=4)
            return y.astype(jnp.float32).mean()

        if "convg4_16" in pieces:
            timed("convg4_16", fg4, wg4, xg4,
                  flops=2 * 9 * 16 * 16 * 192 * 640 * B)
        if "convg4_16_grad" in pieces:
            def fg4g(c, w, x):
                gw = jax.grad(lambda ww: fg4(c, ww, x))(w)
                return jnp.sum(gw.astype(jnp.float32)) * 1e-20

            timed("convg4_16_grad", fg4g, wg4, xg4,
                  flops=2 * 2 * 9 * 16 * 16 * 192 * 640 * B)

    if "convg8_16" in pieces or "convg8_16_grad" in pieces:
        # b24 variant: 8-sample pack fills all 128 lanes
        wg8 = jnp.zeros((3, 3, 16, 128), dt)
        xg8 = jnp.zeros((3, 192, 640, 128), dt)

        def fg8(c, w, x):
            y = jax.lax.conv_general_dilated(
                x + c.astype(x.dtype) * 1e-30, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=8)
            return y.astype(jnp.float32).mean()

        if "convg8_16" in pieces:
            timed("convg8_16", fg8, wg8, xg8,
                  flops=2 * 9 * 16 * 16 * 192 * 640 * 24)
        if "convg8_16_grad" in pieces:
            def fg8g(c, w, x):
                gw = jax.grad(lambda ww: fg8(c, ww, x))(w)
                return jnp.sum(gw.astype(jnp.float32)) * 1e-20

            timed("convg8_16_grad", fg8g, wg8, xg8,
                  flops=2 * 2 * 9 * 16 * 16 * 192 * 640 * 24)

    if "convg2_64" in pieces or "convg2_64_grad" in pieces:
        # layer1 case: 2-sample pack of C=64 at 48x160
        wg2 = jnp.zeros((3, 3, 64, 128), dt)
        xg2 = jnp.zeros((B // 2, 48, 160, 128), dt)

        def fg2(c, w, x):
            y = jax.lax.conv_general_dilated(
                x + c.astype(x.dtype) * 1e-30, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=2)
            return y.astype(jnp.float32).mean()

        if "convg2_64" in pieces:
            timed("convg2_64", fg2, wg2, xg2,
                  flops=2 * 9 * 64 * 64 * 48 * 160 * B)
        if "convg2_64_grad" in pieces:
            def fg2g(c, w, x):
                gw = jax.grad(lambda ww: fg2(c, ww, x))(w)
                return jnp.sum(gw.astype(jnp.float32)) * 1e-20

            timed("convg2_64_grad", fg2g, wg2, xg2,
                  flops=2 * 2 * 9 * 64 * 64 * 48 * 160 * B)

    if "conv256" in pieces:
        import flax.linen as nn

        m = nn.Conv(256, (3, 3), padding=1, use_bias=False, dtype=dt)
        x = jnp.zeros((B, 12, 40, 256), dt)
        v = m.init(rng, x)

        def f(c, v, x):
            return m.apply(v, x + c * 1e-30).astype(jnp.float32).mean()

        timed("conv256", f, v, x, flops=2 * 9 * 256 * 256 * 12 * 40 * B)

    if "stem7" in pieces or "stem7_grad" in pieces:
        w7 = jnp.zeros((7, 7, 3, 64), dt)
        x7 = jnp.zeros((B, 192, 640, 3), dt)

        def stem_f(c, w, x):
            y = jax.lax.conv_general_dilated(
                x + c.astype(x.dtype) * 1e-30, w, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y.astype(jnp.float32).mean()

        if "stem7" in pieces:
            timed("stem7", stem_f, w7, x7,
                  flops=2 * 49 * 3 * 64 * 96 * 320 * B)

        if "stem7_grad" in pieces:
            def stem_g(c, w, x):
                gw = jax.grad(lambda ww: stem_f(c, ww, x))(w)
                return jnp.sum(gw.astype(jnp.float32)) * 1e-20

            timed("stem7_grad", stem_g, w7, x7,
                  flops=2 * 2 * 49 * 3 * 64 * 96 * 320 * B)

    if "pool_grad" in pieces or "pool" in pieces:
        from fusiondepth_tpu.models.resnet import ResnetEncoder as _RE  # noqa
        xp_ = jnp.zeros((B, 96, 320, 64), dt)

        def pool_f(c, y):
            y = y + c.astype(y.dtype) * 1e-30
            y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                        constant_values=-jnp.inf)
            Ho = (y.shape[1] - 3) // 2 + 1
            Wo = (y.shape[2] - 3) // 2 + 1
            m = None
            for di in range(3):
                for dj in range(3):
                    t = y[:, di:di + 2 * Ho - 1:2, dj:dj + 2 * Wo - 1:2, :]
                    m = t if m is None else jnp.maximum(m, t)
            return m.astype(jnp.float32).mean()

        if "pool" in pieces:
            timed("pool", pool_f, xp_, flops=0)

        if "pool_grad" in pieces:
            def pool_g(c, y):
                g = jax.grad(lambda t: pool_f(c, t))(y)
                return jnp.sum(g.astype(jnp.float32)) * 1e-20

            timed("pool_grad", pool_g, xp_, flops=0)

    if "pool2" in pieces or "pool2_grad" in pieces:
        from fusiondepth_tpu.models.resnet import max_pool_3x3s2

        xp2 = jnp.zeros((B, 96, 320, 64), dt)

        def pool2_f(c, y):
            return max_pool_3x3s2(y + c.astype(y.dtype) * 1e-30).astype(
                jnp.float32).mean()

        if "pool2" in pieces:
            timed("pool2", pool2_f, xp2, flops=0)

        if "pool2_grad" in pieces:
            def pool2_g(c, y):
                g = jax.grad(lambda t: pool2_f(c, t))(y)
                return jnp.sum(g.astype(jnp.float32)) * 1e-20

            timed("pool2_grad", pool2_g, xp2, flops=0)

    if "l1_grad" in pieces:
        from fusiondepth_tpu.models.resnet import _BasicBlock

        xl = jnp.zeros((B, 48, 160, 64), dt)
        blocks = [_BasicBlock(64, dtype=dt) for _ in range(2)]
        vs = [b.init(rng, xl, train=True) for b in blocks]

        def l1_f(c, vs, x):
            y = x + c.astype(x.dtype) * 1e-30
            for b, v in zip(blocks, vs):
                y, _ = b.apply(v, y, train=True, mutable=["batch_stats"])
            return y.astype(jnp.float32).mean()

        def l1_g(c, vs, x):
            g = jax.grad(lambda v: l1_f(c, v, x))(vs)
            return sum(jnp.sum(t.astype(jnp.float32))
                       for t in jax.tree.leaves(g)) * 1e-20

        timed("l1_grad", l1_g, vs, xl,
              flops=3 * 4 * 2 * 9 * 64 * 64 * 48 * 160 * B)

    enc = ResnetEncoder(depth=18, in_channels=3, dtype=dt)
    x3 = jnp.zeros((B, 192, 640, 3), jnp.float32)
    v3 = enc.init(rng, x3, train=True)
    ENC_GF = 107e9  # hand-counted R18 @ 192x640 b12

    def _enc_fwd(mod, c, v, x, train):
        out = mod.apply(v, x + c * 1e-30, train=train,
                        mutable=["batch_stats"] if train else False)
        feats = out[0] if train else out
        return sum(f.astype(jnp.float32).mean() for f in feats)

    def _enc_grad(mod, c, v, x):
        gr = jax.grad(
            lambda p: _enc_fwd(mod, c, {"params": p,
                                        "batch_stats": v["batch_stats"]},
                               x, True))(v["params"])
        return sum(jnp.sum(t.astype(jnp.float32))
                   for t in jax.tree.leaves(gr)) * 1e-20

    enc_fwd = lambda c, v, x, train: _enc_fwd(enc, c, v, x, train)

    if "enc3" in pieces:
        timed("enc3", lambda c, v, x: enc_fwd(c, v, x, True), v3, x3,
              flops=ENC_GF)
    if "enc3_eval" in pieces:
        timed("enc3_eval", lambda c, v, x: enc_fwd(c, v, x, False), v3, x3,
              flops=ENC_GF)
    if "enc3_grad" in pieces:
        timed("enc3_grad", lambda c, v, x: _enc_grad(enc, c, v, x), v3, x3,
              flops=3 * ENC_GF)

    # the other three encoder variants the step runs (beam 2ch b, pose
    # 6ch 2b, beam-pose 4ch 2b) — together with enc3_grad they decompose
    # net_grad's encoder budget
    for nm, ch, mult in (("enc2_grad", 2, 1), ("enc6_grad", 6, 2),
                         ("enc4p_grad", 4, 2)):
        if nm not in pieces:
            continue
        enc_v = ResnetEncoder(depth=18, in_channels=ch, dtype=dt)
        xv = jnp.zeros((mult * B, 192, 640, ch), jnp.float32)
        vv = enc_v.init(rng, xv, train=True)
        timed(nm, lambda c, v, x, m=enc_v: _enc_grad(m, c, v, x), vv, xv,
              flops=3 * ENC_GF * mult)

    for pc in pieces:
        # pfxK / pfxK_f: encoder truncated after stage K (1=conv1, 2=+bn/relu,
        # 3=+pool, 4..7=layer1..4), grad (or fwd) — in-context marginal cost
        # of each stage is the successive difference
        if not pc.startswith("pfx"):
            continue
        fwd_only = pc.endswith("_f")
        body = pc[3:-2] if fwd_only else pc[3:]
        folded = body.endswith("d64")  # pfxKd64 = fold64 variant
        k = int(body[:-3] if folded else body)
        enc_k = ResnetEncoder(depth=18, in_channels=3, truncate_at=k,
                              fold64=folded, dtype=dt)
        v_k = dict(enc_k.init(rng, jnp.zeros((B, 192, 640, 3), jnp.float32),
                              train=True))
        v_k.setdefault("batch_stats", {})
        if fwd_only:
            timed(pc, lambda c, v, x, m=enc_k: _enc_fwd(m, c, v, x, True),
                  v_k, x3)
        else:
            timed(pc, lambda c, v, x, m=enc_k: _enc_grad(m, c, v, x),
                  v_k, x3)

    if "enc3_p2" in pieces or "enc3_p2_grad" in pieces:
        enc_p = ResnetEncoder(depth=18, in_channels=3, pack2=True, dtype=dt)
        if "enc3_p2" in pieces:
            timed("enc3_p2", lambda c, v, x: _enc_fwd(enc_p, c, v, x, True),
                  v3, x3, flops=ENC_GF)
        if "enc3_p2_grad" in pieces:
            timed("enc3_p2_grad",
                  lambda c, v, x: _enc_grad(enc_p, c, v, x), v3, x3,
                  flops=3 * ENC_GF)

    if "enc3_f64" in pieces or "enc3_f64_grad" in pieces:
        enc_f = ResnetEncoder(depth=18, in_channels=3, fold64=True, dtype=dt)
        if "enc3_f64" in pieces:
            timed("enc3_f64", lambda c, v, x: _enc_fwd(enc_f, c, v, x, True),
                  v3, x3, flops=ENC_GF)
        if "enc3_f64_grad" in pieces:
            timed("enc3_f64_grad",
                  lambda c, v, x: _enc_grad(enc_f, c, v, x), v3, x3,
                  flops=3 * ENC_GF)

    if "enc3_fst" in pieces or "enc3_fst_grad" in pieces:
        enc_fs = ResnetEncoder(depth=18, in_channels=3, fold64=True,
                               fold_stem=True, dtype=dt)
        if "enc3_fst" in pieces:
            timed("enc3_fst", lambda c, v, x: _enc_fwd(enc_fs, c, v, x, True),
                  v3, x3, flops=ENC_GF)
        if "enc3_fst_grad" in pieces:
            timed("enc3_fst_grad",
                  lambda c, v, x: _enc_grad(enc_fs, c, v, x), v3, x3,
                  flops=3 * ENC_GF)

    if "enc3_s2d" in pieces or "enc3_s2d_grad" in pieces:
        enc_s = ResnetEncoder(depth=18, in_channels=3, s2d_stem=True,
                              dtype=dt)
        if "enc3_s2d" in pieces:
            timed("enc3_s2d", lambda c, v, x: _enc_fwd(enc_s, c, v, x, True),
                  v3, x3, flops=ENC_GF)
        if "enc3_s2d_grad" in pieces:
            timed("enc3_s2d_grad",
                  lambda c, v, x: _enc_grad(enc_s, c, v, x), v3, x3,
                  flops=3 * ENC_GF)

    if "enc6" in pieces:
        enc6 = ResnetEncoder(depth=18, in_channels=6, dtype=dt)
        x6 = jnp.zeros((2 * B, 192, 640, 6), jnp.float32)
        v6 = enc6.init(rng, x6, train=True)

        def f(c, v, x):
            out, _ = enc6.apply(v, x + c * 1e-30, train=True,
                                mutable=["batch_stats"])
            return sum(t.astype(jnp.float32).mean() for t in out)

        timed("enc6", f, v6, x6, flops=2 * ENC_GF)

    if "dec" in pieces:
        feats = [jnp.zeros((B, 96, 320, 64), dt),
                 jnp.zeros((B, 48, 160, 64), dt),
                 jnp.zeros((B, 24, 80, 128), dt),
                 jnp.zeros((B, 12, 40, 256), dt),
                 jnp.zeros((B, 6, 20, 512), dt)]
        dec = DepthDecoder(dtype=dt)
        vd = dec.init(rng, feats)

        def f(c, v, fs):
            fs = [t + c * 1e-30 for t in fs]
            out = dec.apply(v, fs)
            return sum(t.astype(jnp.float32).mean() for t in out.values())

        timed("dec", f, vd, feats, flops=50e9)

    if "nets" in pieces:
        cfg = Config(num_layers=18, height=192, width=640, batch_size=B,
                     compute_dtype="bfloat16")
        nets = FusionNets(cfg)
        tx = make_optimizer(cfg, 1000)
        state = create_train_state(cfg, nets, rng, tx)
        batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=B))
        variables = combine_variables(state.params, state.batch_stats)

        def f(c, v, b):
            bb = dict(b)
            bb["color_aug"] = b["color_aug"] + c * 1e-30
            out, _ = nets.forward(v, bb, train=True)
            tot = sum(out[("disp", sc)].astype(jnp.float32).mean()
                      for sc in cfg.scales)
            for k, vv in out.items():
                if isinstance(k, tuple) and k[0] == "cam_T_cam":
                    tot = tot + vv.astype(jnp.float32).sum() * 1e-6
            return tot

        timed("nets", f, variables, batch, flops=700e9)


if __name__ == "__main__":
    main()
