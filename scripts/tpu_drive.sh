#!/usr/bin/env bash
# TPU recovery playbook: one command collects every measurement queued
# behind a tunnel outage. Run when `python -c "import jax; jax.devices()"`
# stops hanging. Each stage appends to /tmp/tpu_drive.log and drops JSON
# lines into /tmp/tpu_drive/; stages are independent so a mid-drive outage
# loses only the stage in flight.
#
# Stages:
#   1. smoke        tunnel latency + tiny matmul true-sync
#   2. warp         ops probes: banded vs dynamic-gather warp backends
#   3. sweep        bench --config 3 across the round-3 flag combos
#   4. final        bench --config 3 with the winner (read the sweep first,
#                   set WINNER="--set k=v ..." below or via env)
set -u
OUT=/tmp/tpu_drive
mkdir -p "$OUT"
LOG=/tmp/tpu_drive.log
cd "$(dirname "$0")/.."

stage() { echo "=== $1 $(date -u +%H:%M:%S) ===" | tee -a "$LOG"; }

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  stage "$name"
  timeout "$t" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
  local rc=$?
  echo "rc=$rc" | tee -a "$LOG"
  tail -3 "$OUT/$name.out" | tee -a "$LOG"
}

case "${1:-all}" in
  smoke|all)
    run smoke 300 python - <<'EOF'
import time, jax, jax.numpy as jnp
t0 = time.time(); x = jnp.ones((1024, 1024), jnp.bfloat16)
v = float((x @ x).sum()); t1 = time.time()
print({"first_touch_s": round(t1 - t0, 2), "value": v,
       "devices": str(jax.devices())})
EOF
    [ "${1:-all}" = smoke ] && exit 0 ;;&
  warp|all)
    run warp_gather 900 python scripts/exp_gather.py
    run warp_fwd 900 python scripts/exp_warp_fwd.py
    [ "${1:-all}" = warp ] && exit 0 ;;&
  sweep|all)
    run sweep_base    1200 python bench.py
    run sweep_reproj  1200 python bench.py --set pallas_reproj=true
    run sweep_gatherw 1200 python bench.py --set pallas_warp_backend=gather
    run sweep_paired  1200 python bench.py --set paired_encoders=true
    run sweep_allon   1200 python bench.py --set pallas_reproj=true \
        --set paired_encoders=true
    run sweep_b24     1200 python bench.py --set pallas_reproj=true \
        --set batch_size=24
    [ "${1:-all}" = sweep ] && exit 0 ;;&
  mesh1|all)
    # meshed (GSPMD+shard_map+Mosaic) train step on the real chip —
    # the composition the CPU dryrun cannot exercise (Pallas off there)
    run mesh1        1200 python scripts/exp_mesh1.py
    run mesh1_reproj 1200 python scripts/exp_mesh1.py \
        --set pallas_reproj=true
    [ "${1:-all}" = mesh1 ] && exit 0 ;;&
  anatomy|all)
    # per-stage timing + roofline (VERDICT item 1's analysis evidence)
    run anatomy_base   1800 python scripts/bench_anatomy.py
    run anatomy_reproj 1800 python scripts/bench_anatomy.py \
        --set pallas_reproj=true
    run anatomy_costs  1800 python scripts/bench_anatomy.py --costs \
        --set pallas_reproj=true
    [ "${1:-all}" = anatomy ] && exit 0 ;;&
  final)
    # e.g. WINNER="--set pallas_reproj=true" scripts/tpu_drive.sh final
    BENCH_LADDER_BUDGET="${BENCH_LADDER_BUDGET:-3000}" \
      run final 3600 python bench.py ${WINNER:-}
    # regression gate (bench.py BEST_KNOWN_STEP_MS): fail loudly if a rung
    # measured >10% over its recorded best
    if grep -q '"regressions"' "$OUT/final.out"; then
      echo "PERF REGRESSION DETECTED — see $OUT/final.out" | tee -a "$LOG"
      exit 1
    fi
    ;;
esac
echo "drive done; results in $OUT" | tee -a "$LOG"
