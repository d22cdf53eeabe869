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

    if "conv256" in pieces:
        import flax.linen as nn

        m = nn.Conv(256, (3, 3), padding=1, use_bias=False, dtype=dt)
        x = jnp.zeros((B, 12, 40, 256), dt)
        v = m.init(rng, x)

        def f(c, v, x):
            return m.apply(v, x + c * 1e-30).astype(jnp.float32).mean()

        timed("conv256", f, v, x, flops=2 * 9 * 256 * 256 * 12 * 40 * B)

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
