"""Per-stage train-step anatomy on the real TPU (true-sync measurement).

Times each stage of the b12 R18 640x192 train step in isolation, with the
same measurement model as bench.py (fold S executions into one jitted
lax.scan, fetch ONE scalar, subtract the tunnel round-trip):

  stage            what runs
  -----            ---------
  step             full train step (forward + warp + losses + grads + Adam)
  fwd_loss         loss_fn forward only (no gradients)
  grad             value_and_grad of loss_fn (no optimizer)
  net_fwd          conv nets forward only (encoders + decoders + pose)
  warp             the warp (Pallas or XLA) alone, fwd
  warp_grad        warp + its VJP (cotangents to coordinates)
  reproj_fwd       reprojection_loss_planes on the 8 warped maps, fwd
  reproj_grad      same + VJP
  automask         candidate concat + min/argmin + means (given loss maps)

Usage: python scripts/bench_anatomy.py [--stages step,grad,...] [--batch 12]
Prints one line per stage to stdout. Run on the TPU box only (not under
pytest — compiles are serialized on this 1-core host).
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import SCAN_STEPS, _timeit_stats, tunnel_latency  # noqa: E402


XOPTS = {}  # --xopt key=value -> XLA compiler options (forwarded to the
#             axon server-side compiler; the LOCAL XLA_FLAGS parser aborts
#             on TPU-only flag names, so env vars cannot carry these)


def scan_fold(fn, n=SCAN_STEPS):
    """Fold fn (carry-free, returns scalar) n times into one jit; the carry
    perturbs the input so XLA cannot hoist the body out of the loop."""

    def multi(*args):
        def body(c, _):
            out = fn(c, *args)
            return out.astype(jnp.float32), None

        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return out

    return jax.jit(multi, compiler_options=XOPTS or None), n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stages", default="step,fwd_loss,grad,update,net_fwd,"
                                       "net_grad,loss_tail,warp,warp_grad,"
                                       "reproj_fwd,reproj_grad,automask")
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--pallas", type=int, default=None,
                   help="1/0 override for cfg.pallas_warp")
    p.add_argument("--costs", action="store_true",
                   help="print XLA compiled cost analysis per stage "
                        "(flops + bytes accessed) instead of timing")
    p.add_argument("--set", action="append", metavar="KEY=VALUE",
                   help="Config field overrides, same syntax as bench.py "
                        "(profile the flag combo the benchmark recorded)")
    p.add_argument("--xopt", action="append", metavar="KEY=VALUE",
                   help="XLA compiler options for the timed jits, e.g. "
                        "--xopt xla_tpu_scoped_vmem_limit_kib=65536 "
                        "(reaches the axon server-side compiler; XLA_FLAGS "
                        "env aborts locally on TPU-only flag names)")
    args = p.parse_args()
    for item in args.xopt or []:
        k, _, v = item.partition("=")
        XOPTS[k] = v
    stages = args.stages.split(",")
    from bench import _parse_set

    overrides = _parse_set(getattr(args, "set", None))

    from fusiondepth_tpu.config import Config
    from fusiondepth_tpu.data.synthetic import make_batch
    from fusiondepth_tpu.models.fusion import FusionNets
    from fusiondepth_tpu.ops.planes import reprojection_loss_planes, to_planes
    from fusiondepth_tpu.ops.warp import warp_planes
    from fusiondepth_tpu.training.photometric import generate_images_pred
    from fusiondepth_tpu.training.train_state import (
        combine_variables,
        create_train_state,
        make_loss_fn,
        make_optimizer,
        make_train_step,
    )

    on_tpu = jax.devices()[0].platform != "cpu"
    use_pallas = bool(args.pallas) if args.pallas is not None else on_tpu
    cfg = Config(**dict(
        dict(num_layers=18, height=192, width=640, batch_size=args.batch,
             compute_dtype="bfloat16" if on_tpu else "float32",
             pallas_warp=use_pallas),
        **overrides))
    B = cfg.batch_size
    nets = FusionNets(cfg)
    tx = make_optimizer(cfg, 1000)
    state = create_train_state(cfg, nets, jax.random.PRNGKey(0), tx)
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=B))
    variables = combine_variables(state.params, state.batch_stats)
    loss_fn = make_loss_fn(cfg, nets)
    rng = jax.random.PRNGKey(1)
    lat = tunnel_latency()
    print(f"pallas={use_pallas} dtype={cfg.compute_dtype} b={B} "
          f"latency={lat*1e3:.1f}ms", file=sys.stderr)

    # shared warped-stage inputs: run images_pred once to get grids
    outputs, _ = nets.forward(variables, batch, train=True)
    outputs = generate_images_pred(cfg, batch, dict(outputs),
                                   list(cfg.frame_ids))
    grids = jnp.stack([
        jnp.stack([outputs[("sample", f, s)] for s in cfg.scales])
        for f in list(cfg.frame_ids)[1:]])
    sources_p = outputs["sources_planes"]
    target_p = outputs["target_planes"]
    warped = outputs["warped_planes"]

    prec = (jax.lax.Precision.DEFAULT if cfg.compute_dtype == "bfloat16"
            else jax.lax.Precision.HIGHEST)

    def timed(name, fn_c, *fargs):
        """fn_c(carry, *fargs) -> scalar"""
        jfn, n = scan_fold(fn_c)
        if args.costs:
            # compile-only: XLA cost analysis (scan body counted once)
            ca = jfn.lower(*fargs).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            fl = float(ca.get("flops", 0) or 0)
            by = float(ca.get("bytes accessed", 0) or 0)
            # speed-of-light step time for the compiled program: the
            # binding side of the MXU/HBM roofline (Pallas kernel
            # internals are invisible to cost analysis — add their
            # analytic traffic by hand, see PERF.md roofline section)
            from bench import PEAK_HBM_GBPS, device_peak_tflops
            peak, kind = device_peak_tflops()
            bw = next((g for k, g in PEAK_HBM_GBPS.items()
                       if k in kind.lower()), None)
            rl = ""
            if peak and bw:
                rl_ms = max(fl / (peak * 1e12), by / (bw * 1e9)) * 1e3
                bound = "HBM" if by / (bw * 1e9) > fl / (peak * 1e12) \
                    else "MXU"
                rl = f"  roofline {rl_ms:7.2f} ms ({bound}-bound)"
            print(f"{name:12s} {fl/1e12:8.3f} TFLOP  {by/1e9:8.2f} GB{rl}")
            return 0.0
        st = _timeit_stats(lambda: jfn(*fargs), iters=1, warmup=2, trials=3)
        ms = st["median"] / n * 1e3
        print(f"{name:12s} {ms:8.2f} ms  (min {st['min']/n*1e3:.2f} / "
              f"max {st['max']/n*1e3:.2f})")
        return ms

    if "step" in stages:
        step = make_train_step(cfg, nets, tx)

        def multi_step(st0, data, r):
            keys = jax.random.split(r, SCAN_STEPS)

            def body(s, k):
                s, losses = step(s, data, k)
                return s, losses["loss"]

            s, losses = jax.lax.scan(body, st0, keys)
            return losses[-1]

        jstep = jax.jit(multi_step, compiler_options=XOPTS or None)
        stt = _timeit_stats(lambda: jstep(state, batch, rng),
                            iters=1, warmup=2, trials=3)
        print(f"{'step':12s} {stt['median']/SCAN_STEPS*1e3:8.2f} ms  "
              f"(min {stt['min']/SCAN_STEPS*1e3:.2f} / "
              f"max {stt['max']/SCAN_STEPS*1e3:.2f})  "
              f"[{B/(stt['median']/SCAN_STEPS):.1f} samples/s]")

    if "fwd_loss" in stages:
        timed("fwd_loss",
              lambda c, p, s, b, r: loss_fn(
                  jax.tree.map(lambda x: x + c * 1e-30, p), s, b, r)[0],
              state.params, state.batch_stats, batch, rng)

    if "grad" in stages:
        gfn = jax.value_and_grad(loss_fn, has_aux=True)

        def g(c, p, s, b, r):
            (l, _), grads = gfn(jax.tree.map(lambda x: x + c * 1e-30, p),
                                s, b, r)
            # full-tree reduction keeps EVERY weight-gradient op alive —
            # reducing a single leaf lets XLA dead-code-eliminate the
            # other wgrad convolutions and undercount the backward
            gs = sum(jnp.sum(x.astype(jnp.float32))
                     for x in jax.tree.leaves(grads))
            return l + gs * 1e-20

        timed("grad", g, state.params, state.batch_stats, batch, rng)

    if "update" in stages:
        import optax

        gfn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, _aux), grads0 = jax.jit(gfn)(state.params, state.batch_stats,
                                         batch, rng)

        def upd(c, gr, opt_state, params):
            g2 = jax.tree.map(lambda x: x + c * 1e-30, gr)
            updates, _ = tx.update(g2, opt_state, params)
            p2 = optax.apply_updates(params, updates)
            return sum(x.astype(jnp.float32).ravel()[0]
                       for x in jax.tree.leaves(p2))

        timed("update", upd, grads0, state.opt_state, state.params)

    def _net_reduce(out):
        # keep BOTH branches alive: disparities AND the pose stack (the
        # pose encoders are ~2/3 of the conv work; reducing only disp lets
        # XLA dead-code them)
        tot = sum(out[("disp", sc)].astype(jnp.float32).mean()
                  for sc in cfg.scales)
        for k, v in out.items():
            if isinstance(k, tuple) and k[0] == "cam_T_cam":
                tot = tot + v.astype(jnp.float32).sum() * 1e-6
        return tot

    if "net_fwd" in stages:
        def nf(c, v, b):
            bb = dict(b)
            bb["color_aug"] = b["color_aug"] + c * 1e-30
            out, _ = nets.forward(v, bb, train=True)
            return _net_reduce(out)

        timed("net_fwd", nf, variables, batch)

    if "net_grad" in stages:
        # conv nets fwd + FULL bwd (all dgrad + wgrad convs kept alive)
        def nl(p, s, b):
            v = combine_variables(p, s)
            out, _ = nets.forward(v, b, train=True)
            return _net_reduce(out)

        def ng(c, p, s, b):
            grads = jax.grad(nl)(jax.tree.map(lambda x: x + c * 1e-30, p),
                                 s, b)
            return sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree.leaves(grads)) * 1e-20

        timed("net_grad", ng, state.params, state.batch_stats, batch)

    if "loss_tail" in stages:
        # everything AFTER the conv forward: images_pred (incl. warp) +
        # compute_losses, differentiated to the disparity/pose outputs
        from fusiondepth_tpu.training.photometric import compute_losses

        keys0 = [("disp", s) for s in cfg.scales]
        vals0 = [outputs[k] for k in keys0]
        rest0 = {k: v for k, v in outputs.items()
                 if isinstance(k, tuple) and k[0] in
                 ("cam_T_cam", "axisangle", "translation")}

        def tl(vals, b, r):
            out = dict(rest0)
            for k, v in zip(keys0, vals):
                out[k] = v
            out = generate_images_pred(cfg, b, out, list(cfg.frame_ids))
            return compute_losses(cfg, b, out, r)["loss"]

        def tg(c, vals, b, r):
            vals = [v + c * 1e-30 for v in vals]
            g = jax.grad(lambda vs: tl(vs, b, r))(vals)
            return sum(jnp.sum(x.astype(jnp.float32)) for x in g) * 1e-10

        timed("loss_tail", tg, vals0, batch, rng)

    if "warp" in stages:
        def w(c, s, g):
            out = warp_planes(s + c * 1e-30, g, use_pallas=use_pallas,
                              precision=prec)
            return out.mean()

        timed("warp", w, sources_p, grids)

    if "warp_grad" in stages:
        def wg(c, s, g):
            gr = jax.grad(lambda gg: warp_planes(
                s, gg, use_pallas=use_pallas,
                precision=prec).mean())(g + c * 1e-30)
            return gr.ravel()[0]

        timed("warp_grad", wg, sources_p, grids)

    if "reproj_fwd" in stages:
        def rf(c, w_, t):
            return reprojection_loss_planes(w_ + c * 1e-30,
                                            t[None, None]).mean()

        timed("reproj_fwd", rf, warped, target_p)

    if "reproj_grad" in stages:
        def rg(c, w_, t):
            gr = jax.grad(lambda x: reprojection_loss_planes(
                x, t[None, None]).mean())(w_ + c * 1e-30)
            return gr.ravel()[0]

        timed("reproj_grad", rg, warped, target_p)

    if "automask" in stages:
        rmaps = reprojection_loss_planes(warped, target_p[None, None])
        imaps = reprojection_loss_planes(sources_p, target_p[None])

        def am(c, rm, im, r):
            tot = 0.0
            rr = r
            for si in range(len(cfg.scales)):
                rr, sub = jax.random.split(rr)
                ident = im + jax.random.normal(sub, im.shape) * 1e-5 + c * 1e-30
                comb = jnp.concatenate([ident, rm[:, si]], axis=0)
                tot = tot + comb.min(axis=0).mean()
            return tot

        timed("automask", am, rmaps, imaps, rng)

    if args.costs:
        # Pallas kernels are invisible to XLA cost analysis: print their
        # analytic (flops, bytes) + roofline bounds so the step totals can
        # be corrected by hand (PERF.md roofline section)
        import os

        from bench import PEAK_HBM_GBPS, device_peak_tflops

        peak, kind = device_peak_tflops()
        bw = next((g for k_, g in PEAK_HBM_GBPS.items()
                   if k_ in kind.lower()), None)
        n, k = len(cfg.frame_ids) - 1, len(cfg.scales)
        corr = []
        if cfg.pallas_warp and cfg.pallas_warp_backend == "banded":
            from fusiondepth_tpu.ops.pallas_warp import analytic_costs
            corr += [("pallas_warp_fwd",
                      *analytic_costs(n, k, B, 3, cfg.height, cfg.width)),
                     ("pallas_warp_bwd",
                      *analytic_costs(n, k, B, 3, cfg.height, cfg.width,
                                      bwd=True))]
        if cfg.pallas_reproj:
            from fusiondepth_tpu.ops.pallas_reproj import analytic_costs
            corr += [("pallas_reproj_fwd",
                      *analytic_costs(n, k, B, 3, cfg.height, cfg.width)),
                     ("pallas_reproj_bwd",
                      *analytic_costs(n, k, B, 3, cfg.height, cfg.width,
                                      bwd=True))]
        if os.environ.get("FUSIONDEPTH_PALLAS_POOL", "1") == "1":
            from fusiondepth_tpu.ops.pallas_pool import analytic_costs
            # stem pool input: (B, H/2, W/2, 64) after the stride-2 conv1
            shp = (B, cfg.height // 2, cfg.width // 2, 64)
            corr += [("pallas_pool_fwd", *analytic_costs(*shp)),
                     ("pallas_pool_bwd", *analytic_costs(*shp, bwd=True))]
        print("-- pallas analytic corrections (not in XLA rows above) --")
        for name, fl, by in corr:
            rl = ""
            if peak and bw:
                rl_ms = max(fl / (peak * 1e12), by / (bw * 1e9)) * 1e3
                bound = "HBM" if by / (bw * 1e9) > fl / (peak * 1e12) \
                    else "MXU"
                rl = f"  roofline {rl_ms:7.2f} ms ({bound}-bound)"
            print(f"{name:18s} {fl/1e12:8.3f} TFLOP  {by/1e9:8.2f} GB{rl}")


if __name__ == "__main__":
    main()
