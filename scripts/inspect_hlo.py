"""Dump the optimized HLO of the conv-net fwd+bwd and summarize where the
bytes/ops go: op-kind byte totals, the biggest single ops, and a
memory-space-aware HBM traffic audit (the fusion-aware byte account that
XLA's cost_analysis "bytes accessed" is not: it separates real HBM
reads/writes from the S(1) staging copies memory-space assignment emits,
and skips pure aliases like bitcast/get-tuple-element/*-done).

Usage: python scripts/inspect_hlo.py [--full path.txt]
       python scripts/inspect_hlo.py --from-file saved_hlo.txt
"""

import argparse
import re
import sys
from collections import defaultdict

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


DT_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
            "s8": 1, "u8": 1, "f64": 8, "s64": 8}

SHAPE_RE = re.compile(r"(f32|bf16|f16|s32|u32|s64|u8|s8|pred)\[([0-9,]*)\]")

# shape WITH an explicit layout, e.g. bf16[12,96,320,64]{1,3,2,0}
SHAPE_LAYOUT_RE = re.compile(
    r"(f32|bf16|f16|s32|u32|s64|u8|s8|pred)\[([0-9,]*)\]\{([0-9,]*)\}")

# shape + FULL layout incl. tiling/space, e.g.
#   bf16[24,48,80,128]{3,0,2,1:T(8,128)(2,1)S(1)}  /  u32[]{:S(2)}
SHAPE_FULL_RE = re.compile(
    r"(f32|bf16|f16|s32|u32|s64|u8|s8|pred)\[([0-9,]*)\]\{([^{}]*)\}")
SPACE_RE = re.compile(r"S\((\d+)\)")

# ops whose output aliases an operand (or is bookkeeping): no HBM traffic
ALIAS_KINDS = {"bitcast", "get-tuple-element", "parameter", "tuple",
               "constant", "after-all", "copy-done", "slice-done",
               "async-done", "all-reduce-done", "custom-call-done",
               "opt-barrier"}


def parse_out_elems(out_part):
    """Tuple elements of an op's output: [(bytes, space)]; space 0 = HBM."""
    elems = []
    for dt, dims, lay in SHAPE_FULL_RE.findall(out_part):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        m = SPACE_RE.search(lay)
        elems.append((n * DT_BYTES[dt], int(m.group(1)) if m else 0))
    return elems


def shape_bytes(text):
    total = 0
    for dt, dims in SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DT_BYTES[dt]
    return total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--full", default=None, help="also write full HLO here")
    p.add_argument("--what", default="net_grad",
                   choices=["net_grad", "step", "dec", "dec_grad"])
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="Config field overrides (same syntax as bench.py)")
    p.add_argument("--from-file", default=None,
                   help="analyze a previously dumped HLO text instead of "
                        "compiling (no device needed)")
    args = p.parse_args()

    if args.from_file:
        txt = open(args.from_file).read()
        summarize(txt, compiled=None)
        return

    from fusiondepth_tpu.config import Config
    from fusiondepth_tpu.data.synthetic import make_batch
    from fusiondepth_tpu.models.fusion import FusionNets
    from fusiondepth_tpu.training.train_state import (
        combine_variables,
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    on_tpu = jax.devices()[0].platform != "cpu"
    overrides = {}
    for item in args.set:
        key, _, raw = item.partition("=")
        try:
            import json

            overrides[key] = json.loads(raw)
        except ValueError:
            overrides[key] = raw
    cfg = Config(**{**dict(
        num_layers=18, height=192, width=640, batch_size=12,
        compute_dtype="bfloat16" if on_tpu else "float32",
        pallas_warp=on_tpu), **overrides})
    nets = FusionNets(cfg)
    tx = make_optimizer(cfg, 1000)
    state = create_train_state(cfg, nets, jax.random.PRNGKey(0), tx)
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=12))

    if args.what == "step":
        step = make_train_step(cfg, nets, tx)
        lowered = jax.jit(step).lower(state, batch, jax.random.PRNGKey(1))
    elif args.what in ("dec", "dec_grad"):
        from fusiondepth_tpu.models.depth_decoder import DepthDecoder

        B = cfg.batch_size
        dt = jnp.bfloat16 if on_tpu else jnp.float32
        feats = [jnp.zeros((B, 96, 320, 64), dt),
                 jnp.zeros((B, 48, 160, 64), dt),
                 jnp.zeros((B, 24, 80, 128), dt),
                 jnp.zeros((B, 12, 40, 256), dt),
                 jnp.zeros((B, 6, 20, 512), dt)]
        dec = DepthDecoder(dtype=dt)
        vd = dec.init(jax.random.PRNGKey(0), feats)

        def dfwd(v, fs):
            out = dec.apply(v, fs)
            return sum(t.astype(jnp.float32).mean() for t in out.values())

        if args.what == "dec":
            lowered = jax.jit(dfwd).lower(vd, feats)
        else:
            def dgrad(v, fs):
                gr = jax.grad(dfwd)(v, fs)
                return sum(jnp.sum(t.astype(jnp.float32))
                           for t in jax.tree.leaves(gr))

            lowered = jax.jit(dgrad).lower(vd, feats)
    else:
        def nl(p_, s_, b):
            v = combine_variables(p_, s_)
            out, _ = nets.forward(v, b, train=True)
            tot = sum(out[("disp", sc)].astype(jnp.float32).mean()
                      for sc in cfg.scales)
            for k2, v2 in out.items():
                if isinstance(k2, tuple) and k2[0] == "cam_T_cam":
                    tot = tot + v2.astype(jnp.float32).sum() * 1e-6
            return tot

        def ng(p_, s_, b):
            grads = jax.grad(nl)(p_, s_, b)
            return sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree.leaves(grads))

        lowered = jax.jit(ng).lower(state.params, state.batch_stats, batch)

    compiled = lowered.compile()
    txt = compiled.as_text()
    if args.full:
        open(args.full, "w").write(txt)
        print(f"full HLO -> {args.full} ({len(txt)} chars)", file=sys.stderr)
    summarize(txt, compiled)


def summarize(txt, compiled=None):
    by_kind_bytes = defaultdict(int)
    by_kind_count = defaultdict(int)
    by_src_bytes = defaultdict(int)   # JAX-level origin (HLO metadata)
    by_src_count = defaultdict(int)
    by_copy_bytes = defaultdict(int)  # layout transition of copy/transpose
    by_copy_count = defaultdict(int)
    ops = []
    # op kind = first lowercase identifier followed by "(" after the "=";
    # layout/tile markers (T(8,128), S(3)) are uppercase and skipped
    kind_re = re.compile(r"\s([a-z][a-z0-9_\-]*)\(")
    meta_re = re.compile(r'op_name="([^"]*)"')
    # only ENTRY-computation ops touch HBM; fusion bodies are VMEM-internal
    in_entry = False
    for line in txt.splitlines():
        if line.startswith("ENTRY"):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            in_entry = False
        line = line.strip()
        if not in_entry:
            continue
        if not line.startswith(("%", "ROOT ")) or " = " not in line:
            continue
        rhs = line.split(" = ", 1)[1]
        m = kind_re.search(rhs)
        if not m:
            continue
        kind = m.group(1)
        out_part = rhs[:m.start()]  # the (possibly tuple) output shape
        b_out = shape_bytes(out_part)
        by_kind_bytes[kind] += b_out
        by_kind_count[kind] += 1
        # attribute to the originating JAX op via HLO metadata: keep the
        # tail of the op_name path (the jaxpr eqn + its enclosing fn)
        mm = meta_re.search(line)
        src = "<no-metadata>"
        if mm:
            parts = mm.group(1).split("/")
            src = "/".join(parts[-2:]) if len(parts) > 1 else parts[-1]
        key = f"{kind:18s} {src}"
        by_src_bytes[key] += b_out
        by_src_count[key] += 1
        if kind in ("copy", "transpose", "bitcast", "copy-start"):
            # attribute the layout transition: first shape{layout} on the
            # line is the output, the next is the operand
            sl = SHAPE_LAYOUT_RE.findall(line)
            if len(sl) >= 2:
                (odt, odims, olay), (idt, idims, ilay) = sl[0], sl[1]
                tkey = (f"{odt}[{odims}] {{{ilay}}}->{{{olay}}}"
                        if odims == idims else
                        f"{idt}[{idims}]{{{ilay}}} -> {odt}[{odims}]"
                        f"{{{olay}}}")
            else:
                tkey = f"<no-operand-layout> {src}"
            by_copy_bytes[f"{kind:10s} {tkey}"] += b_out
            by_copy_count[f"{kind:10s} {tkey}"] += 1
        if b_out > 20e6:
            ops.append((b_out, kind, line[:240]))

    print("== output bytes by op kind (top 15):")
    for k in sorted(by_kind_bytes, key=by_kind_bytes.get, reverse=True)[:15]:
        print(f"  {k:24s} {by_kind_bytes[k]/1e9:8.2f} GB out  "
              f"x{by_kind_count[k]}")
    print("== output bytes by (kind, jax op) (top 30):")
    for k in sorted(by_src_bytes, key=by_src_bytes.get, reverse=True)[:30]:
        print(f"  {by_src_bytes[k]/1e9:8.2f} GB x{by_src_count[k]:<4d} {k}")
    print("== copy/transpose bytes by layout transition (top 20):")
    for k in sorted(by_copy_bytes, key=by_copy_bytes.get, reverse=True)[:20]:
        print(f"  {by_copy_bytes[k]/1e9:8.2f} GB x{by_copy_count[k]:<4d} {k}")
    print("== biggest single op outputs (top 25):")
    ops.sort(reverse=True)
    for b, k, line in ops[:25]:
        mm = meta_re.search(line)
        tag = ""
        if mm:
            parts = mm.group(1).split("/")
            tag = "  <- " + "/".join(parts[-3:])
        print(f"  {b/1e6:9.1f} MB {line.split(' metadata=')[0][:130]}{tag}")
    audit_hbm(txt)
    if compiled is not None:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        print(f"== cost_analysis: flops="
              f"{float(ca.get('flops', 0))/1e12:.3f}T "
              f"bytes={float(ca.get('bytes accessed', 0))/1e9:.2f}GB"
              " (fusion-blind; the audit above is the honest figure)")


def audit_hbm(txt, hbm_gbps=819.0):
    """Memory-space-aware HBM traffic audit over the ENTRY computation.

    Each entry op contributes:
      - writes: output tuple elements in memory space 0 (HBM); for async
        `*-start` wrappers the output tuple is ((aliased operands...),
        dest, context) so only the dest element counts, in ITS space;
      - reads: per operand, the full defining buffer's space-0 bytes
        (fusion operands that MSA prefetched into S(1) are excluded here
        and counted once at their copy/slice-start instead).
    Aliasing kinds (bitcast/get-tuple-element/*-done/...) are free.
    Approximations: an operand read through a `slice` inside a fusion is
    charged at full size; while/scan bodies (non-entry) are not walked —
    use on straight-line jits (net_grad, dec_grad).
    """
    name_re = re.compile(r"^(?:ROOT )?(%[\w.\-]+) = ")
    kind_re = re.compile(r"\s([a-z][a-z0-9_\-]*)\(")
    meta_re = re.compile(r'op_name="([^"]*)"')
    defs = {}            # %name -> list of (bytes, space)
    reads0 = writes0 = stage_w = 0
    by_src = defaultdict(int)
    by_kind = defaultdict(int)
    in_entry = False
    for line in txt.splitlines():
        if line.startswith("ENTRY"):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            in_entry = False
        if not in_entry:
            continue
        line = line.strip()
        nm = name_re.match(line)
        if nm is None or " = " not in line:
            continue
        name = nm.group(1)
        rhs = line.split(" = ", 1)[1]
        km = kind_re.search(rhs)
        if not km:
            continue
        kind = km.group(1)
        elems = parse_out_elems(rhs[:km.start()])
        defs[name] = elems
        if kind in ALIAS_KINDS:
            continue
        # operands: %names inside the first balanced paren group
        i = rhs.find("(", km.start())
        depth, j = 0, i
        while j < len(rhs):
            depth += rhs[j] == "("
            depth -= rhs[j] == ")"
            j += 1
            if depth == 0:
                break
        opnames = re.findall(r"%[\w.\-]+", rhs[i:j])
        r = w = 0
        if kind.endswith("-start") and len(elems) >= 2:
            dest_bytes, dest_space = elems[-2]
            src = defs.get(opnames[0] if opnames else "", [(0, 0)])
            src_space = src[0][1] if src else 0
            if src_space == 0:
                r += dest_bytes
            if dest_space == 0:
                w += dest_bytes
            else:
                stage_w += dest_bytes
        else:
            for b, sp in elems:
                if sp == 0:
                    w += b
                else:
                    stage_w += b
            for op in opnames:
                for b, sp in defs.get(op, ()):
                    if sp == 0:
                        r += b
        if r + w == 0:
            continue
        reads0 += r
        writes0 += w
        mm = meta_re.search(line)
        src_tag = "<no-metadata>"
        if mm:
            parts = mm.group(1).split("/")
            src_tag = "/".join(parts[-2:]) if len(parts) > 1 else parts[-1]
        by_src[f"{kind:14s} {src_tag}"] += r + w
        by_kind[kind] += r + w
    tot = reads0 + writes0
    print("== HBM traffic audit (memory-space-aware, aliases free):")
    print(f"  reads {reads0/1e9:.2f} GB + writes {writes0/1e9:.2f} GB = "
          f"{tot/1e9:.2f} GB -> {tot/hbm_gbps/1e6:.1f} ms at "
          f"{hbm_gbps:.0f} GB/s   (S(1)/S(2) staging writes: "
          f"{stage_w/1e9:.2f} GB, not HBM)")
    print("== HBM GB by op kind (top 10):")
    for k in sorted(by_kind, key=by_kind.get, reverse=True)[:10]:
        print(f"  {by_kind[k]/1e9:8.2f} GB  {k}")
    print("== HBM GB by (kind, jax op) (top 30):")
    for k in sorted(by_src, key=by_src.get, reverse=True)[:30]:
        print(f"  {by_src[k]/1e9:8.2f} GB  {k}")


if __name__ == "__main__":
    main()
