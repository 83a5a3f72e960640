#!/bin/bash
# Round-6 per-core-heap scaling campaign (BENCH/BASELINE.md §2):
#
# The north rule compares a cluster of N executors to one of 4N — aggregate
# memory scales with the cluster. The round-5/6 single-JVM campaigns ran both
# legs inside one fixed-heap JVM, handing the 4N leg a QUARTER of the N leg's
# per-core heap; the round-6 profile pinned the resulting GC throttle as the
# dominant non-scaling term (fold job 2.2× at shared 8g; 0.75 -> 0.78+ the
# moment the heap grows). This protocol launches each leg as its OWN JVM with
# -Xmx proportional to cores (4g/core — constant heap-per-core, i.e. real
# executor sizing), brackets the 4N leg with two N legs to cancel linear VM
# drift, and runs a same-protocol pure-CPU (no-shuffle) control pair first.
#
# Usage: run_scaling_percore_r06.sh [pairs] [out.jsonl]
set -u
cd /root/repo
PAIRS="${1:-5}"
OUT="${2:-/root/repo/BENCH/scaling_r06_percore.jsonl}"
N=2
N4=8
GB_PER_CORE=4
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
: > "$OUT"

leg() { # leg <cpus> [extra env...] -> prints the scaling_leg JSON line
  local cpus="$1"; shift
  env "$@" SPARK_GRAFT_LEG="$cpus" SPARK_GRAFT_N=$N \
      SPARK_GRAFT_CDC_CONV=2000000 SPARK_GRAFT_EPOCHS=1 \
    java $ADD_OPENS -Xmx$((cpus * GB_PER_CORE))g \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "$CP" graft.ScalingBench 2>/dev/null \
    | grep '"metric":"scaling_leg"'
}

pair() { # pair <idx> <kind> [extra env...] -> one combined JSON line
  local idx="$1" kind="$2"; shift 2
  local a b c
  a=$(leg $N  "$@") || return 1
  b=$(leg $N4 "$@") || return 1
  c=$(leg $N  "$@") || return 1
  printf '%s\n%s\n%s\n' "$a" "$b" "$c" | jq -s -c \
    --argjson pair "$idx" --arg kind "$kind" --argjson t "$(date +%s)" '
    { pair: $pair, kind: $kind, t: $t, metric: "scaling_leg_pair",
      events: .[0].events, n: .[0].cpus, n4: .[1].cpus,
      heap_mb_n: .[0].heap_mb, heap_mb_4n: .[1].heap_mb,
      classify_sec_n: (((.[0].classify_sec + .[2].classify_sec) / 2) * 1000 | round / 1000),
      classify_sec_4n: .[1].classify_sec,
      classify_eff: ((((.[0].classify_sec + .[2].classify_sec) / 2) / (4 * .[1].classify_sec)) * 1000 | round / 1000),
      apply_sec_n: (((.[0].apply_sec + .[2].apply_sec) / 2) * 1000 | round / 1000),
      apply_sec_4n: .[1].apply_sec,
      apply_eff: ((((.[0].apply_sec + .[2].apply_sec) / 2) / (4 * .[1].apply_sec)) * 1000 | round / 1000) }' \
    >> "$OUT"
}

for i in $(seq 1 "$PAIRS"); do
  pair "$i" narrow SPARK_GRAFT_MODE=narrow
  pair "$i" disk
done
echo "PERCORE CAMPAIGN DONE $(date +%s)" >> "$OUT"
