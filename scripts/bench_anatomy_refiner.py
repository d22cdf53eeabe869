"""Per-stage anatomy of the config-4 refiner train step (true-sync).

Same measurement model as bench.py / bench_anatomy.py: fold S executions
into one jitted lax.scan, fetch ONE scalar, subtract the tunnel
round-trip. Stages:

  step         full refine train step (frozen s1 fwd + pseudo-3D build +
               refine decoder + warp + losses + refine grads + Adam)
  grad         value_and_grad of the refine loss (no optimizer)
  fwd_loss     refine loss forward only
  s1_fwd       frozen stage-1 forward + build_pseudo3d (no refine dec)
  refine_fwd   refine2d decoder forward alone (fixed feats/depth_maps)
  refine_grad  refine2d decoder fwd+bwd alone

Usage: python scripts/bench_anatomy_refiner.py [--batch 4] [--stages ...]
[--set KEY=VALUE] [--xopt KEY=VALUE]. TPU box only.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import _timeit_stats, tunnel_latency  # noqa: E402

XOPTS = {}


def scan_fold(fn, n=10):
    def multi(*args):
        def body(c, _):
            out = fn(c, *args)
            return out.astype(jnp.float32), None

        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return out

    return jax.jit(multi, compiler_options=XOPTS or None), n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stages", default="step,grad,fwd_loss,s1_fwd,"
                                       "refine_fwd,refine_grad")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--set", action="append", metavar="KEY=VALUE")
    p.add_argument("--xopt", action="append", metavar="KEY=VALUE")
    args = p.parse_args()
    for item in args.xopt or []:
        k, _, v = item.partition("=")
        XOPTS[k] = v
    from bench import _parse_set

    overrides = _parse_set(getattr(args, "set", None))
    stages = args.stages.split(",")

    import numpy as np

    from fusiondepth_tpu.config import Config
    from fusiondepth_tpu.data.synthetic import make_batch
    from fusiondepth_tpu.training.refiner import (
        RefinerNets,
        make_refine_loss_fn,
    )
    from fusiondepth_tpu.training.train_state import (
        combine_variables,
        create_train_state,
        make_optimizer,
    )

    on_tpu = jax.devices()[0].platform != "cpu"
    cfg = Config(**dict(
        dict(num_layers=18, height=192, width=640, batch_size=args.batch,
             compute_dtype="bfloat16" if on_tpu else "float32",
             pallas_warp=on_tpu, clone_gdc=True, refine_2d=True),
        **overrides))
    B = cfg.batch_size
    nets = RefinerNets(cfg)
    tx1 = make_optimizer(cfg, 1)
    s1 = create_train_state(cfg, nets.stage1, jax.random.PRNGKey(0), tx1)
    frozen = combine_variables(s1.params, s1.batch_stats)
    refine_params = nets.init_refine(jax.random.PRNGKey(2), batch_size=B)
    batch = make_batch(cfg, batch_size=B)
    batch["inf_gdc"] = np.full((B, cfg.height, cfg.width, 1), 12.0,
                               np.float32)
    batch = jax.tree.map(jnp.asarray, batch)
    loss_fn = make_refine_loss_fn(cfg, nets)
    rng = jax.random.PRNGKey(1)
    lat = tunnel_latency()
    print(f"b={B} dtype={cfg.compute_dtype} latency={lat*1e3:.1f}ms",
          file=sys.stderr)

    import optax

    tx = optax.adam(cfg.learning_rate * (B / 8.0))
    opt_state = tx.init(refine_params)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    # fixed decoder inputs for the decoder-only stages
    s1n = nets.stage1
    feats0 = s1n.encoder.apply(frozen["encoder"], batch["color_aug"][:, 0],
                               train=False)
    beam0 = s1n.beam_encoder.apply(frozen["beam_encoder"],
                                   batch["two_channel"][:, 0], train=False)
    outs0 = s1n.depth.apply(frozen["depth"], feats0)
    dmaps0 = nets.build_pseudo3d(batch, outs0)

    def run(name, fn):
        multi, n = scan_fold(fn)
        holder = [None]

        def call():
            return multi(*holder[0])

        holder[0] = run.args
        stats = _timeit_stats(call, iters=1, warmup=2, trials=3)
        ms = stats["median"] / n * 1e3
        extra = ""
        if name == "step":
            extra = f"  [{B / (stats['median'] / n):.1f} samples/s]"
        print(f"{name:<12} {ms:7.2f} ms  (min {stats['min']/n*1e3:.2f} / "
              f"max {stats['max']/n*1e3:.2f}){extra}", flush=True)

    for name in stages:
        if name == "step":
            def f(c, rp, os_, fr, b, r):
                (loss, _), g = grad_fn(rp, fr, b, jax.random.fold_in(
                    r, c.astype(jnp.int32)))
                up, _ = tx.update(g, os_, rp)
                rp2 = optax.apply_updates(rp, up)
                lead = jax.tree.leaves(rp2)[0]
                return loss.astype(jnp.float32) + lead.mean() * 1e-30
            args_ = (refine_params, opt_state, frozen, batch, rng)
        elif name == "grad":
            def f(c, rp, fr, b, r):
                (loss, _), g = grad_fn(rp, fr, b, jax.random.fold_in(
                    r, c.astype(jnp.int32)))
                lead = jax.tree.leaves(g)[0]
                return loss.astype(jnp.float32) + lead.mean() * 1e-30
            args_ = (refine_params, frozen, batch, rng)
        elif name == "fwd_loss":
            def f(c, rp, fr, b, r):
                loss, _ = loss_fn(rp, fr, b, jax.random.fold_in(
                    r, c.astype(jnp.int32)))
                return loss.astype(jnp.float32)
            args_ = (refine_params, frozen, batch, rng)
        elif name == "s1_fwd":
            def f(c, fr, b):
                bb = dict(b)
                bb["color_aug"] = b["color_aug"] + c * jnp.float32(1e-30)
                feats = s1n.encoder.apply(fr["encoder"],
                                          bb["color_aug"][:, 0], train=False)
                outs = s1n.depth.apply(fr["depth"], feats)
                dm = nets.build_pseudo3d(bb, outs)
                return dm[("disp", 0)].astype(jnp.float32).mean()
            args_ = (frozen, batch)
        elif name == "refine_fwd":
            def f(c, rp, fts, bfs, dms):
                fts = [fts[0] + c * jnp.float32(1e-30).astype(fts[0].dtype)
                       ] + list(fts[1:])
                out = nets.refine2d.apply(rp, fts, beam_features=bfs,
                                          depth_maps=dms)
                return out[("disp", 0)].astype(jnp.float32).mean()
            args_ = (refine_params, feats0, beam0, dmaps0)
        elif name == "refine_grad":
            def g_only(rp, fts, bfs, dms):
                out = nets.refine2d.apply(rp, fts, beam_features=bfs,
                                          depth_maps=dms)
                return sum(out[("disp", s)].astype(jnp.float32).mean()
                           for s in cfg.scales)

            gf = jax.value_and_grad(g_only)

            def f(c, rp, fts, bfs, dms):
                fts = [fts[0] + c * jnp.float32(1e-30).astype(fts[0].dtype)
                       ] + list(fts[1:])
                v, g = gf(rp, fts, bfs, dms)
                lead = jax.tree.leaves(g)[0]
                return v + lead.astype(jnp.float32).mean() * 1e-30
            args_ = (refine_params, feats0, beam0, dmaps0)
        else:
            print(f"unknown stage {name}", file=sys.stderr)
            continue
        run.args = args_
        try:
            run(name, f)
        except Exception as e:  # noqa: BLE001
            print(f"{name:<12} FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
