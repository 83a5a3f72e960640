#!/bin/bash
# Round-6 apply 2->8 scaling campaign (VERDICT r5 item 1): bracketed pairs
# (N,4N,N), single north-scale-shaped epoch, EARLY in the boot, with a
# same-campaign pure-CPU control before every pair and tmpfs A/B legs.
# Emits one merged JSON line per run into scaling_r06_campaign.jsonl.
set -u
cd /root/repo
OUT=/root/repo/BENCH/scaling_r06_campaign.jsonl
: > "$OUT"
mkdir -p /dev/shm/scaleAB

run() { # run <pair> <kind> [extra env...]
  local pair="$1" kind="$2"; shift 2
  env "$@" SPARK_GRAFT_N=2 SPARK_GRAFT_CDC_CONV=2000000 SPARK_GRAFT_EPOCHS=1 \
    sbt -batch "runMain graft.ScalingBench" 2>/dev/null \
    | grep '"metric"' \
    | sed "s/^{/{\"pair\":$pair,\"kind\":\"$kind\",\"t\":$(date +%s),/" >> "$OUT"
}

for i in 1 2 3 4 5; do
  run "$i" narrow SPARK_GRAFT_MODE=narrow
  run "$i" disk   SPARK_GRAFT_BRACKET=1
done
# tmpfs A/B beside the disk pairs (same boot, same protocol)
for i in 6 7; do
  run "$i" narrow SPARK_GRAFT_MODE=narrow
  run "$i" tmpfs  SPARK_GRAFT_BRACKET=1 SPARK_GRAFT_WH_BASE=/dev/shm/scaleAB
done
echo "CAMPAIGN DONE $(date +%s)" >> "$OUT"
