#!/bin/bash
# Round-4 real-TPU measurement campaign (sequential — compiles are
# single-core client-side work; each run's kernel lands in the AOT cache
# so the driver's end-of-round bench.py reloads in seconds).
cd /root/repo || exit 1
R=benchmarks/r04_runs
mkdir -p $R

run() {
  name=$1; shift
  echo "=== $name: $* $(date +%H:%M:%S)"
  env BENCH_NO_SUBPROCESS=1 "$@" timeout 5400 python bench.py \
      > "$R/$name.json" 2> "$R/$name.err"
  echo "--- rc=$? $(date +%H:%M:%S)"
  cat "$R/$name.json"
  tail -3 "$R/$name.err"
}

# 1. the round-4 headline ask: blocking input inside every race
run race_io BENCH_WORKLOAD=race-io BENCH_ROUNDS=16
# 2. the driver's default bench (adventure leaf=128) — must be warm
run adventure BENCH_ROUNDS=8
# 3. adventure at realistic value widths (VERDICT #2)
run adventure_real BENCH_WIDTH=512 BENCH_ELEM=128 BENCH_LIST_CAP=16 \
    BENCH_OUT=512 BENCH_TILE=128
# 4. ring 10% parks (fast path now)
run ring BENCH_WORKLOAD=ring BENCH_ROUNDS=8
# 5. divergent spine at leaf=4 (VERDICT #6; kernel already warm)
run spine_div BENCH_WORKLOAD=spine BENCH_LEAF=4 BENCH_DIVERGENCE=8
# 6. turbo interpolation bytes/sec workload
run interp BENCH_WORKLOAD=interp
# 7. the general engine's public fallback number
run general BENCH_ENGINE=general BENCH_INTERP=0
echo "=== campaign done $(date +%H:%M:%S)"
