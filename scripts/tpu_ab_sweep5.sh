#!/bin/bash
# Round-5 A/B sweep: sequential full-bench runs (compiles cached after the
# first). Each line: config name + the one JSON result.
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/sweep5.log}
: > "$LOG"

run() {
  name=$1; shift
  echo "=== $name ($(date -u +%H:%M:%S)) ===" >> "$LOG"
  timeout 2400 env "$@" python bench.py 2>&1 | grep -v WARNING | tail -1 >> "$LOG"
}

run defaults FRODO_BENCH_THREADED=0  # inline eval contract (threaded is the default)
run threaded FRODO_BENCH_THREADED=1
run track_only FRODO_BENCH_TRACK_ONLY=1 FRODO_BENCH_THREADED=0
run track_only_threaded FRODO_BENCH_TRACK_ONLY=1 FRODO_BENCH_THREADED=1
run realtime_bf16_heads FRODO_BENCH_HEAD_DTYPE=bfloat16 FRODO_BENCH_THREADED=0
run realtime_bf16_threaded FRODO_BENCH_HEAD_DTYPE=bfloat16 FRODO_BENCH_THREADED=1
echo "sweep5 done $(date -u)" >> "$LOG"
