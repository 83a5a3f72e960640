#!/bin/bash
# Round-6 second N-vs-4N shape: 1 core vs 4 cores (same bracketed per-core-
# heap protocol as run_scaling_ab_r06.sh). Rationale: the 2→8 pair's raw
# ratio is capped by single-socket DRAM contention at 8 threads (task-CPU
# inflates ~35-40%, see BENCH/BASELINE.md §Round 6); at 4 threads the
# socket is only mildly saturated, so the 1→4 pair shows what the engine's
# raw N/(4·4N) reads when the hardware can actually supply 4N cores'
# bandwidth — alongside, not instead of, the 2→8 pair.
#
# Usage: run_scaling_n1n4_r06.sh [iterations] [out.jsonl]
set -u
cd /root/repo
ITERS="${1:-3}"
OUT="${2:-/root/repo/BENCH/scaling_r06_n1n4.jsonl}"
N=1
N4=4
GB_PER_CORE=4
source "$(dirname "$0")/lib_scaling_leg.sh"

for i in $(seq 1 "$ITERS"); do
  pair "$i" narrow  SPARK_GRAFT_MODE=narrow
  pair "$i" aligned
done
echo "N1N4 CAMPAIGN DONE $(date +%s)" >> "$OUT"
