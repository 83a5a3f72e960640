#!/bin/bash
# Round-6 quiet-window supplement: aligned-arm-only bracketed pairs (the
# shipping engine), each led by a pure-CPU control pair — run in a
# low-load window to grow the unflagged-pair sample behind the campaign
# median (BENCH/BASELINE.md §"Round 6"). Protocol identical to
# run_scaling_ab_r06.sh minus the legacy arm (already characterized).
#
# Usage: run_scaling_quiet_r06.sh [iterations] [out.jsonl]
set -u
cd /root/repo
ITERS="${1:-6}"
OUT="${2:-/root/repo/BENCH/scaling_r06_quiet.jsonl}"
N=2
N4=8
GB_PER_CORE=4
source "$(dirname "$0")/lib_scaling_leg.sh"

for i in $(seq 1 "$ITERS"); do
  pair "$i" narrow  SPARK_GRAFT_MODE=narrow
  pair "$i" aligned
done
echo "QUIET CAMPAIGN DONE $(date +%s)" >> "$OUT"
