#!/bin/bash
# Round-6 aligned-vs-legacy scaling A/B (BENCH/BASELINE.md §2): same boot,
# same per-core-heap protocol (see lib_scaling_leg.sh), alternating the
# single-shuffle aligned-commit path with the legacy per-commit-shuffle
# path so host drift hits both arms equally. A pure-CPU (no-shuffle)
# control pair leads every iteration — the boot's scaling ceiling,
# measured beside the data. Appends to OUT (accumulating campaign file).
#
# Usage: run_scaling_ab_r06.sh [iterations] [out.jsonl]
set -u
cd /root/repo
ITERS="${1:-3}"
OUT="${2:-/root/repo/BENCH/scaling_r06_ab.jsonl}"
N=2
N4=8
GB_PER_CORE=4
source "$(dirname "$0")/lib_scaling_leg.sh"

for i in $(seq 1 "$ITERS"); do
  pair "$i" narrow  SPARK_GRAFT_MODE=narrow
  pair "$i" aligned
  pair "$i" legacy  SPARK_GRAFT_ALIGNED=0
done
echo "AB CAMPAIGN DONE $(date +%s)" >> "$OUT"
