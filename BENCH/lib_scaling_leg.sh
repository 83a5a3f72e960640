# Shared per-core-heap scaling-leg launcher (sourced by the round-6
# campaign scripts). One JVM per leg with -Xmx ∝ cores (constant
# heap-per-core = real executor sizing — the north rule compares clusters,
# whose aggregate memory scales with size), plus the bracketed-pair
# combiner (N, 4N, N with averaged N legs — cancels linear host drift).
#
# Expects: N, N4, GB_PER_CORE, OUT set by the sourcing script.
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

pair() { # pair <idx> <kind> [extra env...] -> one combined JSON line >> OUT
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
      # narrow (no-apply) legs return the -1 sentinel: emit null, never a
      # fabricated ratio (-1/(4*-1) would read as a plausible 0.25)
      apply_sec_n: (if .[0].apply_sec > 0 and .[2].apply_sec > 0
        then (((.[0].apply_sec + .[2].apply_sec) / 2) * 1000 | round / 1000) else null end),
      apply_sec_4n: (if .[1].apply_sec > 0 then .[1].apply_sec else null end),
      apply_eff: (if .[0].apply_sec > 0 and .[1].apply_sec > 0 and .[2].apply_sec > 0
        then ((((.[0].apply_sec + .[2].apply_sec) / 2) / (4 * .[1].apply_sec)) * 1000 | round / 1000) else null end),
      apply_cpu_sec_n: (if .[0].apply_cpu_sec > 0 and .[2].apply_cpu_sec > 0
        then (((.[0].apply_cpu_sec + .[2].apply_cpu_sec) / 2) * 1000 | round / 1000) else null end),
      apply_cpu_sec_4n: (if .[1].apply_cpu_sec > 0 then .[1].apply_cpu_sec else null end),
      # CPU-normalized: what the wall ratio would read if the 4N leg paid the
      # N leg'\''s task-CPU (the sandbox'\''s single-socket memory contention
      # inflates per-task CPU with thread count; a real 4N cluster brings 4N
      # sockets). eff_adj = T_N * CPU_4N / (4 * T_4N * CPU_N).
      apply_eff_cpu_adj: (if .[1].apply_cpu_sec > 0 and ((.[0].apply_cpu_sec + .[2].apply_cpu_sec) / 2) > 0
        then ((((.[0].apply_sec + .[2].apply_sec) / 2) * .[1].apply_cpu_sec
              / (4 * .[1].apply_sec * ((.[0].apply_cpu_sec + .[2].apply_cpu_sec) / 2))) * 1000 | round / 1000)
        else null end) }' \
    >> "$OUT"
}
