#!/bin/bash
# Round-6 aligned-vs-legacy scaling A/B (BENCH/BASELINE.md §2): same boot,
# same per-core-heap protocol as run_scaling_percore_r06.sh (one JVM per
# leg, -Xmx ∝ cores, bracketed N,4N,N), alternating the single-shuffle
# aligned-commit path with the legacy per-commit-shuffle path so host drift
# hits both arms equally. A pure-CPU (no-shuffle) control pair leads every
# iteration — the boot's scaling ceiling, measured beside the data.
#
# Usage: run_scaling_ab_r06.sh [iterations] [out.jsonl]
set -u
cd /root/repo
ITERS="${1:-3}"
OUT="${2:-/root/repo/BENCH/scaling_r06_ab.jsonl}"
N=2
N4=8
GB_PER_CORE=4
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"

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

for i in $(seq 1 "$ITERS"); do
  pair "$i" narrow  SPARK_GRAFT_MODE=narrow
  pair "$i" aligned
  pair "$i" legacy  SPARK_GRAFT_ALIGNED=0
done
echo "AB CAMPAIGN DONE $(date +%s)" >> "$OUT"
