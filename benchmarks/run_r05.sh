#!/bin/bash
# Round-5 hardware campaign (sequential; one real chip, one CPU core).
# Ordering = VERDICT r4 priority: (1) warm + bank the official default
# bench key, (2) race-io x3 pipelined-shard runs, (3) hardware promotion
# proof, (4) chat-realistic widths (512-byte slots), (5) the real
# flagship at 10k+ instances.
#
# IMPORTANT: every kernel built here keys on the content of
# interpolation_engine_tpu/{vm,ops,compiler}/*.py — do NOT edit those
# packages after this script starts or the warm cache dies.
set -u
cd "$(dirname "$0")/.."
R=benchmarks/r05_runs
mkdir -p "$R"
log() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$R/campaign.log"; }

log "1/6 official default bench (adventure leaf=128, cold ~2550s)"
BENCH_COLD_GUARD=0 BENCH_NO_SUBPROCESS=1 timeout 5400 \
    python bench.py > "$R/bench_default.json" 2> "$R/bench_default.err"
log "bench_default rc=$? $(cat "$R/bench_default.json" 2>/dev/null)"

for i in 1 2 3; do
    log "2/6 race-io run $i (pipelined shards)"
    BENCH_WORKLOAD=race-io BENCH_NO_SUBPROCESS=1 timeout 3600 \
        python bench.py > "$R/race_io$i.json" 2> "$R/race_io$i.err"
    log "race_io$i rc=$? $(cat "$R/race_io$i.json" 2>/dev/null) $(grep 'race-io ring' "$R/race_io$i.err" | tail -1)"
done

log "3/6 hardware promotion proof (128 -> 512 sibling)"
timeout 3600 python benchmarks/hw_promotion.py \
    > "$R/promotion.out" 2> "$R/promotion.err"
log "promotion rc=$? $(tail -1 "$R/promotion.out" 2>/dev/null)"

log "4/6 chat-realistic widths (512B slots / 128B elems / 512B out)"
BENCH_WIDTH=512 BENCH_ELEM=128 BENCH_OUT=512 BENCH_TILE=128 BENCH_LEAF=16 \
    BENCH_INSTANCES=32768 BENCH_NO_SUBPROCESS=1 timeout 5400 \
    python bench.py > "$R/adventure_real.json" 2> "$R/adventure_real.err"
log "adventure_real rc=$? $(cat "$R/adventure_real.json" 2>/dev/null)"

log "5/6 real flagship at scale (text_adventure.json5 x 10240)"
IE_FLAGSHIP_N=10240 timeout 5400 python benchmarks/hw_flagship.py \
    > "$R/flagship.out" 2> "$R/flagship.err"
log "flagship rc=$? $(tail -1 "$R/flagship.out" 2>/dev/null)"

log "6/6 re-warm check: official key must answer warm now"
BENCH_NO_SUBPROCESS=1 timeout 1200 \
    python bench.py > "$R/bench_warm.json" 2> "$R/bench_warm.err"
log "bench_warm rc=$? $(cat "$R/bench_warm.json" 2>/dev/null)"
log "campaign done"
