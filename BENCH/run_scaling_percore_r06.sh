#!/bin/bash
# Round-6 per-core-heap scaling campaign (BENCH/BASELINE.md §2):
#
# The north rule compares a cluster of N executors to one of 4N — aggregate
# memory scales with the cluster. The round-5/6 single-JVM campaigns ran both
# legs inside one fixed-heap JVM, handing the 4N leg a QUARTER of the N leg's
# per-core heap; the round-6 profile pinned the resulting GC throttle as the
# dominant non-scaling term (fold job 2.2× at shared 8g; 0.75 -> 0.78+ the
# moment the heap grows). This protocol (lib_scaling_leg.sh) launches each
# leg as its OWN JVM with -Xmx proportional to cores (4g/core — constant
# heap-per-core, i.e. real executor sizing), brackets the 4N leg with two N
# legs to cancel linear VM drift, and runs a same-protocol pure-CPU
# (no-shuffle) control pair first. TRUNCATES OUT (fresh campaign file).
#
# Usage: run_scaling_percore_r06.sh [pairs] [out.jsonl]
set -u
cd /root/repo
PAIRS="${1:-5}"
OUT="${2:-/root/repo/BENCH/scaling_r06_percore.jsonl}"
N=2
N4=8
GB_PER_CORE=4
source "$(dirname "$0")/lib_scaling_leg.sh"
: > "$OUT"

for i in $(seq 1 "$PAIRS"); do
  pair "$i" narrow SPARK_GRAFT_MODE=narrow
  pair "$i" disk
done
echo "PERCORE CAMPAIGN DONE $(date +%s)" >> "$OUT"
