#!/bin/bash
# One-shot capture of everything gated on TPU hardware (ROADMAP "Open"):
# run the moment the chip returns (watch for /tmp/tpu_alive). Each stage
# is bounded and logs to /tmp/tpu_suite/, so even a brief TPU window
# captures results in priority order.
set -u
OUT=/tmp/tpu_suite
mkdir -p "$OUT"
cd /root/repo

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name (timeout ${t}s) ==="
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  echo "    exit=$? -> $OUT/$name.log (tail:)"
  tail -3 "$OUT/$name.log" | sed 's/^/    /'
}

# 1. Headline bench sanity (cached shapes; first compile can be slow).
run bench 1200 python bench.py

# 2. Windowed very-large-N band decision (speed + budget + verdict).
run windowed_band_decide 3000 python probes/windowed_band_decide.py

# 3. Estimator-family timings at N=2048 (PFB / multitaper / SK / excise).
run estimator_timing 1800 python probes/estimator_timing.py 2048 1024

# 4. Config-3 (1M mode) isolated slope check.
run bench_1m 1800 python probes/bench_1m.py

echo "=== done; logs in $OUT ==="
