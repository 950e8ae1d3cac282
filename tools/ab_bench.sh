#!/usr/bin/env bash
# Interleaved same-window A/B of ONE pipeline metric between TWO
# builds — the documented cross-round comparison instrument on this
# VM (SCALE.md "The hammingdup −25%: engine exonerated", round 12):
# this host drifts in EPOCH (a sub-1%-steal window does not reproduce
# an old stamp's number for EITHER build), so the only decision-grade
# delta is A/B pairs taken inside the same window, steal-stamped.
#
# Usage: tools/ab_bench.sh <metric> <cpfileA> <cpfileB> [pairs]
#   cpfileA/B: files holding each build's `sbt "export
#   Runtime/fullClasspath"` output (one line). Label A = the OLD
#   build, B = the NEW one. Default 4 pairs, order B,A per pair.
# Env: SPARK_GRAFT_CPUS (32) and the usual SPARK_GRAFT_BENCH_* knobs
#   (applied to BOTH sides identically).
set -uo pipefail
cd "$(dirname "$0")/.."

METRIC=${1:?metric}; CPA=${2:?classpath file A}; CPB=${3:?classpath file B}
PAIRS=${4:-4}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}

OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

ticks() { awk '/^cpu /{s=0;for(f=2;f<=NF;f++)s+=$f; print s, $9}' /proc/stat; }

run_side() { # $1 = label, $2 = classpath
  read -r t0 s0 <<<"$(ticks)"
  V=$(java $OPENS -Xmx16g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$(cat "$2")" graft.Bench \
    --only "$METRIC" 2>/dev/null | grep -o '"value":[0-9.eE+-]*' | tail -1 | cut -d: -f2)
  if ! [[ "${V:-}" =~ ^[0-9]+\.?[0-9]*([eE][+-]?[0-9]+)?$ ]]; then V=failed; fi
  read -r t1 s1 <<<"$(ticks)"
  ST=$(awk -v a="$t0" -v b="$s0" -v c="$t1" -v d="$s1" \
    'BEGIN{dt=c-a; printf "%.2f", (dt>0)?100*(d-b)/dt:0}')
  echo "  $1: $V steal=${ST}%"
}

echo "A/B on $METRIC: ${PAIRS} interleaved pairs (B=new first each pair)"
for i in $(seq 1 "$PAIRS"); do
  echo "pair $i:"
  run_side B "$CPB"
  run_side A "$CPA"
done
echo "read the pairs WITHIN each window; clean pairs (both sides <=1%"
echo "steal) are the evidence — cross-pair drift is host epoch."
