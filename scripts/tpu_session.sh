#!/bin/bash
# Round-3 TPU measurement battery — run the moment the tunneled device is back.
# Each phase writes to $OUT; phases are ordered cheapest-first so a flaky tunnel
# still yields the highest-value numbers early. Re-runnable; phases skip if
# their output already exists (delete $OUT to redo).
set -u
OUT=${OUT:-/tmp/r3_measurements}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

phase() {  # phase <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  if [ -s "$OUT/$name.out" ]; then echo "== $name: cached"; return 0; fi
  echo "== $name: running ($(date +%H:%M:%S))"
  timeout "$tmo" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  echo "== $name: rc=$? ($(date +%H:%M:%S))"
}

# 0. is the device actually reachable (fast fail)
timeout 120 python -c "import jax; print(jax.devices())" || { echo DEVICE_DOWN; exit 1; }

# 1. sort cost attribution (keys vs payloads) — decides raster_exact_tiebreak default
phase sorts 1800 python scripts/bench_sorts.py

# 2. step trace at 2M on a warm 8M tree — where the r3 ingest time goes now
phase trace 2400 python scripts/trace_step.py

# 3. render ablation (kernel vs sort vs prepass split after r3 rewrites)
phase render_ablate 2400 python scripts/ablate_render.py

# 3b. kernel tile/chunk re-sweep + fast-tiebreak A/B at 4M samples
phase raster_sweep 3600 python scripts/raster_tpu_check.py

# 4. step-size scaling: fixed windows amortize with bigger steps
phase step4m 3600 env BENCH_POINTS=16000000 BENCH_STEP=$((4<<20)) BENCH_FILE=0 python bench.py
phase step8m 3600 env BENCH_POINTS=16000000 BENCH_STEP=$((8<<20)) BENCH_FILE=0 python bench.py

# 5. the headline 64M bench (official shape)
phase bench64 7200 python bench.py

# 6. fast-tiebreak A/B at the bench frame (needs phase-1 verdict to interpret)
phase tiebreak 3600 env BENCH_POINTS=16000000 BENCH_FILE=0 RASTER_FAST_TIEBREAK=1 python bench.py

# 7. deep-scale run (VERDICT item 9): 256M points, deeper tree
phase bench256 10800 env BENCH_POINTS=256000000 BENCH_FILE=0 python bench.py

# 8. candidate-drop voxel-miss fraction at 16M (VERDICT item 7 first half)
phase drop_miss 3600 python scripts/measure_drop_miss.py

echo "battery complete -> $OUT"
