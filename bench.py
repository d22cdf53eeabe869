"""Benchmark: self-supervised train-step throughput on the flagship config.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Default (driver) run mirrors BASELINE.json config 3: ResNet-18, 640x192,
batch 12, full photometric + SI loss train step (depth + beam + pose nets).
Secondary metrics go to stderr. `--config {1..5}` selects the other
BASELINE benchmark configs for manual runs:
  1: R18 single-frame forward (CPU ok)
  2: R50 640x192 inference throughput
  3: train step (default)
  4: refiner train step (stage 2)
  5: completion train step at 1216x352

vs_baseline compares against an A100 PyTorch stand-in: the reference never
published throughput (trainer.py:632-642 prints it live); ~350 samples/s
for monodepth2-class R18 640x192 batch-12 training is deliberately generous
to the baseline.

MEASUREMENT MODEL (this box reaches the TPU through a network tunnel):
`jax.block_until_ready` is a NO-OP on the axon backend — it returns in
~0.1 ms while execution is still in flight, so timing loops that "sync"
with it measure DISPATCH rate, not the hardware (round-1 numbers had this
hole). The only true sync is fetching a value. Every timed region here
therefore (a) folds many steps into ONE jitted lax.scan so a single scalar
fetch covers S real steps, and (b) subtracts the measured scalar round-trip
latency (~35 ms through the tunnel).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

A100_BASELINE_SAMPLES_PER_SEC = 350.0

WARMUP = 3
ITERS = 10
SCAN_STEPS = 20  # training steps folded into one jit per timed call

# --xopt key=value -> XLA compiler options for the benched jits. These are
# proto-backed options forwarded per-compile to the axon server-side TPU
# compiler (the LOCAL XLA_FLAGS parser aborts on TPU-only flag names, so
# the env var cannot carry them). bench_anatomy.py shares the mechanism.
XOPTS: dict = {}

# The completion model (config 5, 352x1216) needs a raised Mosaic
# scoped-VMEM limit: the stem maxpool backward kernel's stack allocation
# is 18.4 MB at Wo=304 against the 16 MB default (nearly BH-independent —
# row tiling cannot shrink it further; see ops/pallas_pool._bh_for). The
# option is measured perf-neutral on the flagship (PERF.md round-4/5 flag
# probes) and v5e has 128 MB of VMEM.
COMPLETION_XOPTS = {"xla_tpu_scoped_vmem_limit_kib": "32768"}

# bf16 peak TFLOP/s per chip, by device_kind substring (public specs)
PEAK_TFLOPS_BF16 = {
    "v2": 45.0,
    "v3": 123.0,
    "v4": 275.0,
    "v5 lite": 197.0,
    "v5e": 197.0,
    "v5p": 459.0,
    "v6 lite": 918.0,
    "v6e": 918.0,
}

# HBM bandwidth GB/s per chip (public specs) for the roofline bound
PEAK_HBM_GBPS = {
    "v2": 700.0,
    "v3": 900.0,
    "v4": 1228.0,
    "v5 lite": 819.0,
    "v5e": 819.0,
    "v5p": 2765.0,
    "v6 lite": 1640.0,
    "v6e": 1640.0,
}


def device_peak_tflops():
    """(peak bf16 TFLOP/s or None, device_kind string) for devices()[0]."""
    kind = jax.devices()[0].device_kind
    for key, peak in PEAK_TFLOPS_BF16.items():
        if key in kind.lower():
            return peak, kind
    return None, kind


def compiled_costs(jitted, *args):
    """(flops, bytes_accessed) per execution from XLA's compiled cost
    analysis (0 if the backend doesn't report them)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return (float(ca.get("flops", 0.0) or 0.0),
                float(ca.get("bytes accessed", 0.0) or 0.0))
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
        return 0.0, 0.0


def compiled_flops(jitted, *args):
    return compiled_costs(jitted, *args)[0]


def flops_fields(flops_per_step: float, dt: float, bytes_per_step: float = 0.0):
    """FLOPs-grounded throughput + roofline fields for the bench JSON.

    roofline_ms = max(flops/MXU_peak, bytes/HBM_bw): the compiled program's
    speed-of-light step time; roofline_frac = how close the measured step
    runs to it (1.0 = at the hardware bound).
    """
    peak, kind = device_peak_tflops()
    tflops = flops_per_step / dt / 1e12 if flops_per_step else 0.0
    out = {
        "device_kind": kind,
        "flops_per_step": round(flops_per_step, 0),
        "tflops": round(tflops, 2),
    }
    if peak:
        out["peak_tflops_bf16"] = peak
        # MFU of the SCHEDULED program: the folded convs run (F+2)/F the
        # reference's dense MACs by design (PERF.md), so this is not
        # dense-model MFU — it grounds "the MXU is busy", not "the model
        # is cheap". samples/s is the honest headline.
        out["mfu"] = round(tflops / peak, 4)
        out["mfu_note"] = "scheduled-program MFU; folded convs inflate MACs (F+2)/F vs the reference dense model"
    bw = None
    for key, gbps in PEAK_HBM_GBPS.items():
        if key in kind.lower():
            bw = gbps
            break
    if peak and bw and bytes_per_step:
        out["bytes_per_step"] = round(bytes_per_step, 0)
        compute_s = flops_per_step / (peak * 1e12)
        memory_s = bytes_per_step / (bw * 1e9)
        roofline_s = max(compute_s, memory_s)
        out["roofline_ms"] = round(roofline_s * 1e3, 2)
        # XLA cost-analysis bytes are fusion-blind (count every producer/
        # consumer pair, fused or not) — an UPPER bound on HBM traffic, so
        # roofline_frac OVERSTATES closeness to the hardware bound. The
        # memory-space-aware audit (scripts/inspect_hlo.py, PERF.md) is
        # the honest per-stage accounting.
        out["roofline_frac"] = round(roofline_s / dt, 3)
        out["roofline_bound"] = ("hbm" if memory_s > compute_s else "mxu")
        out["roofline_note"] = "bytes_per_step is XLA fusion-blind (upper bound); honest HBM audit in PERF.md"
    return out


_latency_cache = [None]


def tunnel_latency() -> float:
    """Median scalar round-trip through the tunnel (a true sync)."""
    if _latency_cache[0] is None:
        f = jax.jit(jnp.sin)
        x = jnp.float32(1.0)
        float(f(x))
        samples = []
        for _ in range(7):
            t0 = time.perf_counter()
            float(f(x))
            samples.append(time.perf_counter() - t0)
        samples.sort()
        _latency_cache[0] = samples[len(samples) // 2]
        print(f"tunnel scalar roundtrip: {_latency_cache[0] * 1e3:.1f} ms",
              file=sys.stderr)
    return _latency_cache[0]


def _timeit_stats(fn, iters=ITERS, warmup=WARMUP, trials=5):
    """Time fn per call with a TRUE sync: fn must return a scalar-ish
    device value which is fetched with float() (block_until_ready is a
    no-op on this backend — see module docstring). Reports MEDIAN over N
    trials with min/max dispersion (tunnel jitter); the measured scalar
    round-trip latency is subtracted per call.
    """
    for _ in range(warmup):
        float(jnp.asarray(fn()).ravel()[0])
    lat = tunnel_latency()
    samples = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            float(jnp.asarray(fn()).ravel()[0])
        dt = (time.perf_counter() - t0) / iters
        samples.append(max(dt - lat, 1e-9))
    samples.sort()
    return {
        "median": samples[len(samples) // 2],
        "min": samples[0],
        "max": samples[-1],
        "trials": trials,
    }


def _timeit(fn, iters=ITERS, warmup=WARMUP, trials=5):
    return _timeit_stats(fn, iters, warmup, trials)["median"]


def make_scan_step(cfg, nets, tx, n_inner: int):
    """S chained training steps inside ONE jit: a lax.scan over the step,
    returning the last step's loss. One scalar fetch then syncs S real
    device steps — the per-step cost is (call_time - latency) / S."""
    from fusiondepth_tpu.training.train_state import make_train_step

    step = make_train_step(cfg, nets, tx)

    def multi(state, batch, rng):
        keys = jax.random.split(rng, n_inner)

        def body(st, k):
            st, losses = step(st, batch, k)
            return st, losses["loss"]

        state, losses = jax.lax.scan(body, state, keys)
        return state, losses[-1]

    return multi


def bench_train(cfg_kwargs, metric, batch):
    from fusiondepth_tpu.config import Config
    from fusiondepth_tpu.data.synthetic import make_batch
    from fusiondepth_tpu.models.fusion import FusionNets
    from fusiondepth_tpu.training.train_state import (
        create_train_state,
        make_optimizer,
    )

    cfg_kwargs = dict(cfg_kwargs)
    if "batch_size" in cfg_kwargs:  # --set batch_size=N
        batch = cfg_kwargs.pop("batch_size")
        if metric.rsplit("_b", 1)[-1].isdigit():
            metric = metric.rsplit("_b", 1)[0] + f"_b{batch}"
    cfg = Config(batch_size=batch, **cfg_kwargs)
    nets = FusionNets(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=1000)
    state = create_train_state(cfg, nets, jax.random.PRNGKey(0), tx)
    data = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=batch))

    S = SCAN_STEPS
    multi = jax.jit(make_scan_step(cfg, nets, tx, S), donate_argnums=0,
                    compiler_options=XOPTS or None)
    # XLA's cost analysis counts a while-loop body ONCE, so the scan
    # program's flops == one training step's flops (verified: lowering the
    # single step and the S-step scan report the same count)
    flops, nbytes = compiled_costs(multi, state, data, jax.random.PRNGKey(1))

    holder = {"state": state, "rng": jax.random.PRNGKey(1)}

    def run():
        holder["rng"], k = jax.random.split(holder["rng"])
        holder["state"], last_loss = multi(holder["state"], data, k)
        return last_loss

    stats = _timeit_stats(run, iters=1, warmup=2, trials=5)
    dt = stats["median"] / S
    sps = batch / dt
    from fusiondepth_tpu.models.pretrained import APPLIED

    result = {
        "metric": metric, "value": round(sps, 2), "unit": "samples/s",
        "vs_baseline": round(sps / A100_BASELINE_SAMPLES_PER_SEC, 3),
        "scan_steps": S, "trials": stats["trials"],
        "step_ms": {k: round(stats[k] / S * 1e3, 2)
                    for k in ("median", "min", "max")},
        # which initialization actually ran (scripts/fetch_pretrained.py
        # provisions the torchvision checkpoints on offline hosts)
        "weights_init": ("pretrained" if APPLIED and all(APPLIED.values())
                         else "random")}
    if result["weights_init"] == "random":
        # throughput is init-independent; quality-loop evidence for the
        # pretrained path lives in tests/test_pretrained_init.py and
        # tests/test_overfit.py (this host is zero-egress: no torchvision
        # checkpoint can be downloaded — provision one with
        # scripts/fetch_pretrained.py --from <dir>)
        result["weights_note"] = ("zero-egress host, no ImageNet ckpt; "
                                  "provision: scripts/fetch_pretrained.py")
    result.update(flops_fields(flops, dt, nbytes))
    return cfg, nets, holder["state"], data, result


def bench_inference(cfg_kwargs, metric, batch=1):
    from fusiondepth_tpu.config import Config
    from fusiondepth_tpu.data.synthetic import make_batch
    from fusiondepth_tpu.models.fusion import FusionNets
    from fusiondepth_tpu.training.train_state import (
        create_train_state,
        make_optimizer,
        combine_variables,
    )

    cfg_kwargs = dict(cfg_kwargs)
    cfg_kwargs.pop("batch_size", None)  # --set batch_size targets training
    cfg = Config(batch_size=batch, **cfg_kwargs)
    nets = FusionNets(cfg)
    tx = make_optimizer(cfg, 1)
    state = create_train_state(cfg, nets, jax.random.PRNGKey(0), tx)
    variables = combine_variables(state.params, state.batch_stats)
    data = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=batch))

    S = 50  # forwards per jit; the carry feeds the input so XLA cannot
    # hoist the loop-invariant forward out of the scan

    def multi(v, b):
        def body(carry, _):
            bb = dict(b)
            bb["color_aug"] = b["color_aug"] + carry * jnp.float32(1e-30)
            disp = nets.forward_depth(v, bb, train=False)[0][("disp", 0)]
            return disp.mean().astype(jnp.float32), None

        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=S)
        return out

    infer = jax.jit(multi, compiler_options=XOPTS or None)
    dt = _timeit(lambda: infer(variables, data), iters=1) / S
    fps = batch / dt
    return {"metric": metric, "value": round(fps, 1), "unit": "fps",
            "vs_baseline": round(fps / 30.0, 2)}  # "real-time" = 30 fps


def bench_refiner(cfg_kwargs, batch=4):
    """Config-4 stage-2 refine train step, SAME measurement model as
    bench_train: S steps folded into one jitted lax.scan, ONE scalar
    fetch. The round-4 recorded 64.24 samples/s used a per-step
    float(loss) sync — on this tunnel that measures ~50 ms/step of
    dispatch+fetch latency around a 9.3 ms device step (the refiner
    anatomy pins the true step; PERF.md round 5)."""
    import optax

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

    cfg_kwargs = dict(cfg_kwargs)
    batch = cfg_kwargs.pop("batch_size", batch)
    cfg = Config(batch_size=batch, **dict(
        dict(clone_gdc=True, refine_2d=True), **cfg_kwargs))
    nets = RefinerNets(cfg)
    s1 = create_train_state(cfg, nets.stage1, jax.random.PRNGKey(cfg.seed),
                            make_optimizer(cfg, 1))
    frozen = combine_variables(s1.params, s1.batch_stats)
    refine_params = nets.init_refine(jax.random.PRNGKey(cfg.seed + 2),
                                     batch_size=batch)
    tx = optax.adam(cfg.learning_rate * (batch / 8.0))
    opt_state = tx.init(refine_params)
    loss_fn = make_refine_loss_fn(cfg, nets)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    data = make_batch(cfg, batch_size=batch)
    import numpy as np

    data["inf_gdc"] = np.full((batch, cfg.height, cfg.width, 1), 12.0,
                              np.float32)
    # device-resident once — re-uploading numpy each step would measure the
    # host tunnel, not the computation
    data = jax.tree.map(jnp.asarray, data)

    S = SCAN_STEPS

    def multi(rp, os_, fr, b, rng):
        keys = jax.random.split(rng, S)

        def body(carry, k):
            rp, os_ = carry
            (loss, _), g = grad_fn(rp, fr, b, k)
            up, os_ = tx.update(g, os_, rp)
            return (optax.apply_updates(rp, up), os_), loss

        carry, losses = jax.lax.scan(body, (rp, os_), keys)
        return carry, losses[-1]

    multi = jax.jit(multi, donate_argnums=(0, 1),
                    compiler_options=XOPTS or None)
    flops, nbytes = compiled_costs(multi, refine_params, opt_state,
                                   frozen, data, jax.random.PRNGKey(1))

    holder = {"carry": (refine_params, opt_state),
              "rng": jax.random.PRNGKey(1)}

    def run():
        holder["rng"], k = jax.random.split(holder["rng"])
        holder["carry"], last_loss = multi(*holder["carry"], frozen, data, k)
        return last_loss

    stats = _timeit_stats(run, iters=1, warmup=2, trials=5)
    dt = stats["median"] / S
    sps = batch / dt
    result = {"metric": f"refine_samples_per_sec_b{batch}",
              "value": round(sps, 2), "unit": "samples/s",
              "vs_baseline": round(sps / 100.0, 3), "scan_steps": S,
              "step_ms": {k: round(stats[k] / S * 1e3, 2)
                          for k in ("median", "min", "max")}}
    result.update(flops_fields(flops, dt, nbytes))
    return result


def bench_host_fed(cfg_kwargs, batch=4, n_frames=14, epochs=3):
    """END-TO-END training throughput from an on-disk synthetic KITTI tree:
    jpeg decode + LANCZOS resize + velodyne projection + 2channel load in
    DataLoader worker threads feeding the jitted train step. This is the
    number that includes the host input pipeline (the synthetic-batch
    configs measure the device alone)."""
    import tempfile

    from fusiondepth_tpu.config import Config
    from fusiondepth_tpu.data.fixtures import DRIVE, build_synthetic_kitti_tree
    from fusiondepth_tpu.data.kitti_dataset import KITTIRAWDataset
    from fusiondepth_tpu.data.loader import DataLoader
    from fusiondepth_tpu.training.trainer import Trainer

    cfg = Config(batch_size=batch, **cfg_kwargs)
    root = tempfile.mkdtemp(prefix="bench_kitti_")
    build_synthetic_kitti_tree(root, n_frames=n_frames, height=cfg.height,
                               width=cfg.width)
    lines = [f"{DRIVE} {i} l" for i in range(1, n_frames - 1)]
    ds = KITTIRAWDataset(root, lines, cfg.height, cfg.width, cfg.frame_ids,
                         is_train=True, cfg=cfg)
    cfg = cfg.replace(data_path=root)
    tr = Trainer(cfg, train_dataset=ds, val_dataset=None)

    from fusiondepth_tpu.data.prefetch import prefetch_to_device

    def epoch():
        """One pipelined epoch: uploads ride ahead of compute, NO per-step
        sync — the single end-of-epoch loss fetch drains the whole chain
        (every step depends on the previous state), so the measured time
        still covers all device work. Round-2 fetched float(loss) every
        step, paying the ~35 ms tunnel round-trip per step."""
        n = 0
        last = None
        loader = DataLoader(ds, batch, shuffle=True, drop_last=True,
                            num_workers=cfg.num_workers)
        for db in prefetch_to_device(loader, tr.put_batch, size=2):
            last = tr.run_step(db, on_device=True)
            n += batch
        float(last["loss"])  # ONE true sync per epoch
        return n

    epoch()  # warmup (compile)
    t0 = time.perf_counter()
    total = sum(epoch() for _ in range(epochs))
    dt = time.perf_counter() - t0
    sps = total / dt
    return {"metric": f"hostfed_train_samples_per_sec_r{cfg.num_layers}_"
                      f"{cfg.width}x{cfg.height}_b{batch}",
            "value": round(sps, 2), "unit": "samples/s",
            "vs_baseline": round(sps / A100_BASELINE_SAMPLES_PER_SEC, 3),
            "num_workers": cfg.num_workers}


# Config-3 flag ladder: candidate fast-path combinations, fastest-expected
# first. The driver's unattended run tries each rung (a rung whose kernels
# fail to compile on the real chip is skipped, not fatal) and reports the
# best measured throughput, so an unvalidated kernel can never cost the
# round its benchmark number. `pool` toggles the Pallas stem-maxpool via
# its env gate (ops/pooling.py). Round-3 sweep results (v5e, 2026-08-18,
# /tmp/tpu_drive + PERF.md): the strip-banded warp cut the step 95.4 ->
# 82.5 ms; the fold64 encoder cut it to 78.3 (b12) and batch 24 lifts
# samples/s another 8% (165.9, bytes/sample -22%); pallas_reproj is
# throughput-neutral in the full step (XLA overlaps the stacked SSIM+L1
# anyway) but carries less HBM; the gather warp backend (136 ms), paired
# encoders (106 ms) and the halo decoder conv measured SLOWER and were
# dropped from the ladder. Best-expected-first; the last rungs are
# fallbacks in case a kernel fails to compile.
TRAIN_LADDER = [
    ("r5_default_b24", dict(batch_size=24)),  # defaults, headline batch
    ("r5_default_b32", dict(batch_size=32)),  # batch scaling headline bid
    ("r5_default_b12", dict()),               # defaults, trend batch
    ("r5_reproj_b24", dict(batch_size=24, pallas_reproj=True)),
    ("r4_warp_bw384_b24", dict(batch_size=24, _warpbw="384")),  # r3 band
    ("r4_no_seam_b12", dict(folded_seam=False)),  # seam A/B fallback
    ("r4_no_fold64_b12", dict(fold64_encoder=False)),  # pre-fold fallback
    ("r2_no_pallas_pool_b12", dict(_pool="0")),
]

# The first LADDER_MIN_RUNGS rungs are ALWAYS attempted (the recorded
# artifact must carry the default config at b24 AND b12, the round-4
# narrow-band A/B, plus one fallback — VERDICT r3 weak #2); the budget
# only gates the optional tail rungs.
LADDER_MIN_RUNGS = 5
LADDER_BUDGET_S = float(__import__("os").environ.get(
    "BENCH_LADDER_BUDGET", 1500))

# Best recorded median step_ms per rung (PERF.md / BENCH_r03): the
# regression gate — a rung that measures >10% slower than its recorded best
# is flagged loudly in the JSON and on stderr so round-over-round perf can't
# silently slip while kernels churn (VERDICT r3 item 8).
BEST_KNOWN_STEP_MS = {
    "r5_default_b24": 118.82,   # BENCH_r04 r4_default_b24 (same config)
    "r5_default_b12": 64.28,    # PERF.md r4: fold_stem + seam + dyn256
}
REGRESSION_TOL = 1.10


def bench_train_ladder(base, explicit: bool, on_tpu: bool):
    """Time config-3 across TRAIN_LADDER and report the best rung.

    With --set overrides (`explicit`) or on CPU (compiles are minutes each
    there, and the Pallas rungs are gated off anyway) a single run of
    exactly the requested config is measured instead.
    """
    import os

    metric = "train_samples_per_sec_r18_640x192_b12"
    if explicit or not on_tpu:
        return bench_train(base, metric, batch=12)[-1]

    ladder = {}
    best = None
    regressions = {}
    t0 = time.perf_counter()
    for i, (name, flags) in enumerate(TRAIN_LADDER):
        over_budget = time.perf_counter() - t0 > LADDER_BUDGET_S
        if best is not None and i >= LADDER_MIN_RUNGS and over_budget:
            print(f"ladder budget hit; skipping {name}", file=sys.stderr)
            ladder[name] = {"skipped": "budget"}
            continue
        flags = dict(flags)
        os.environ["FUSIONDEPTH_PALLAS_POOL"] = flags.pop("_pool", "1")
        os.environ["FUSIONDEPTH_FOLD_HALO"] = flags.pop("_halo", "0")
        os.environ["FUSIONDEPTH_WARP_BW"] = flags.pop("_warpbw", "dyn256")
        os.environ["FUSIONDEPTH_PALLAS_FOLDCONV"] = flags.pop(
            "_foldconv", "0")
        try:
            r = bench_train(dict(base, **flags), metric, batch=12)[-1]
        except Exception as e:  # noqa: BLE001 - rung must not kill the run
            msg = f"{type(e).__name__}: {e}"
            print(f"ladder rung {name} failed: {msg[:300]}", file=sys.stderr)
            ladder[name] = {"error": msg[:160]}
            continue
        finally:
            os.environ.pop("FUSIONDEPTH_PALLAS_POOL", None)
            os.environ.pop("FUSIONDEPTH_FOLD_HALO", None)
            os.environ.pop("FUSIONDEPTH_WARP_BW", None)
            os.environ.pop("FUSIONDEPTH_PALLAS_FOLDCONV", None)
        ladder[name] = {"value": r["value"], "step_ms": r["step_ms"]}
        print(f"ladder rung {name}: {r['value']} samples/s", file=sys.stderr)
        known = BEST_KNOWN_STEP_MS.get(name)
        if known and r["step_ms"]["median"] > known * REGRESSION_TOL:
            regressions[name] = {
                "step_ms": r["step_ms"]["median"], "best_known_ms": known}
            print(f"REGRESSION: rung {name} step {r['step_ms']['median']} ms "
                  f"> {REGRESSION_TOL}x best-known {known} ms",
                  file=sys.stderr)
        if best is None or r["value"] > best[1]["value"]:
            best = (name, r)
    if best is None:
        raise RuntimeError(f"every ladder rung failed: {ladder}")
    result = best[1]
    result["config_flags"] = best[0]
    result["ladder"] = ladder
    if regressions:
        result["regressions"] = regressions
    return result


def _parse_set(items):
    """--set key=value overrides for the benched Config (value parsed as
    JSON when possible, else kept as string — so `--set pallas_reproj=true
    --set pallas_warp_backend=gather` both work)."""
    out = {}
    for item in items or []:
        key, _, raw = item.partition("=")
        try:
            out[key] = json.loads(raw)
        except ValueError:
            out[key] = raw
    return out


def _enable_compile_cache():
    """Persistent XLA compilation cache: ladder rungs recompile the same
    programs run to run, and every fresh compile costs minutes on this
    1-core host — cached rungs make the full 5-rung ladder fit the driver's
    budget. Best-effort (older jax / exotic backends may lack it)."""
    import os

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/root/repo/.jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # pragma: no cover - version-dependent
        print(f"compilation cache unavailable: {e}", file=sys.stderr)


def main():
    _enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=int, default=3,
                   choices=[1, 2, 3, 4, 5, 6])
    p.add_argument("--set", action="append", metavar="KEY=VALUE",
                   help="override a Config field on the benched config "
                        "(repeatable; value parsed as JSON when possible)")
    p.add_argument("--xopt", action="append", metavar="KEY=VALUE",
                   help="XLA compiler option for the benched jits, e.g. "
                        "--xopt xla_tpu_scoped_vmem_limit_kib=65536 "
                        "(reaches the axon server-side compiler)")
    args = p.parse_args()
    for item in args.xopt or []:
        k, _, v = item.partition("=")
        XOPTS[k] = v

    on_tpu = jax.devices()[0].platform != "cpu"
    dt = "bfloat16" if on_tpu else "float32"
    # pallas_warp: the banded-window Pallas reprojection kernel (8.6x the
    # gather path incl. backward on v5e; see ops/pallas_warp.py)
    base = dict(num_layers=18, height=192, width=640, compute_dtype=dt,
                pallas_warp=on_tpu)
    base.update(_parse_set(getattr(args, "set", None)))

    if args.config == 1:
        result = bench_inference(base, "forward_fps_r18_640x192_b1")
    elif args.config == 2:
        result = bench_inference(
            dict(base, num_layers=50), "inference_fps_r50_640x192_b1")
    elif args.config == 4:
        result = bench_refiner(base)
    elif args.config == 5:
        for k, v in COMPLETION_XOPTS.items():
            if k not in XOPTS:
                XOPTS[k] = v
                print(f"config 5: compiler option {k}={v} (pool-bwd kernel "
                      "stack needs >16 MB scoped VMEM at Wo=304)",
                      file=sys.stderr)
        # remat=False: the r5 bisect (PERF.md) found remat + the Pallas
        # pool-bwd kernel at Wo=304 SIGKILLs the server-side compiler
        # (resource-limited process OOM); b2 fits HBM without remat and
        # runs 7% faster. Memory fallback: --set remat=true with
        # FUSIONDEPTH_PALLAS_POOL=0 (both legs measured green).
        # Built FROM base so pallas_warp=on_tpu carries over — the r4/r5
        # bisect runs built this dict from scratch and silently benched
        # the XLA gather warp (405.7 vs 117.4 ms/step at b2, PERF.md).
        cfg5 = dict(base, num_layers=50, height=352, width=1216,
                    completion_num_layers=50, remat=False)
        cfg5.update(_parse_set(getattr(args, "set", None)))
        # batch=4: 20.10 samples/s vs 17.12 at b2 (PERF.md wave 8); b8
        # OOMs HBM without remat.
        result = bench_train(
            cfg5, "completion_samples_per_sec_r50_1216x352", batch=4)[-1]
        # config-5 baseline: A100 PyTorch full-res completion ~50 samples/s
        result["vs_baseline"] = round(
            result["value"] / 50.0, 3)
    elif args.config == 6:
        result = bench_host_fed(base)
    else:
        result = bench_train_ladder(base, explicit=bool(args.set),
                                    on_tpu=on_tpu)
        # secondary: single-image inference FPS (stderr only)
        sec = bench_inference(base, "inference_fps_640x192_b1")
        print(f"inference_fps_640x192_b1: {sec['value']}", file=sys.stderr)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
