#!/bin/bash
# Round-4 real-TPU measurement campaign (sequential — compiles are
# single-core client-side work; each run's kernel lands in the AOT cache
# so the driver's end-of-round bench.py reloads in seconds).
#
# Order: the driver's default bench first (its cache MUST be warm at
# end-of-round), then the cheap known numbers, then the two long cold
# compiles (race-io ≈ adventure-scale at leaf=128 ≈ 40-60 min on axon;
# adventure_real at width 512 is the biggest trace). A prior race-io
# attempt was killed at minute 37 INSIDE backend.compile_and_load — that
# was the cold compile still running, not a hang; give it 3 h.
cd /root/repo || exit 1
R=benchmarks/r04_runs
mkdir -p $R

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* $(date +%H:%M:%S)"
  env BENCH_NO_SUBPROCESS=1 "$@" timeout "$tmo" python bench.py \
      > "$R/$name.json" 2> "$R/$name.err"
  echo "--- rc=$? $(date +%H:%M:%S)"
  cat "$R/$name.json"
  tail -3 "$R/$name.err"
}

# 1. the driver's default bench (adventure leaf=128) — must be warm
run adventure 5400 BENCH_ROUNDS=8
# 2. ring 10% parks (fast path now)
run ring 5400 BENCH_WORKLOAD=ring BENCH_ROUNDS=8
# 3. divergent spine at leaf=4 (VERDICT #6)
run spine_div 5400 BENCH_WORKLOAD=spine BENCH_LEAF=4 BENCH_DIVERGENCE=8
# 4. turbo interpolation bytes/sec workload
run interp 5400 BENCH_WORKLOAD=interp
# 5. the general engine's public fallback number
run general 5400 BENCH_ENGINE=general BENCH_INTERP=0
# 6. the round-4 headline ask: blocking input inside every race
run race_io 10800 BENCH_WORKLOAD=race-io BENCH_ROUNDS=16
# 7. adventure at realistic value widths (VERDICT #2). leaf=32, not the
#    adventure default 128: trace size grows ~(w/128)^2 per shift via
#    _taa's chunked gathers, and leaf=128 was already a 42-min compile
#    at width 128 — leaf=32 costs ~18% throughput at w=128 for a ~7x
#    cheaper compile.
run adventure_real 10800 BENCH_WIDTH=512 BENCH_ELEM=128 BENCH_LIST_CAP=16 \
    BENCH_OUT=512 BENCH_TILE=128 BENCH_LEAF=32
echo "=== campaign done $(date +%H:%M:%S)"
