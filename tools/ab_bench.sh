#!/bin/bash
# Interleaved same-box A/B bench: alternate a query subset between two
# compiled trees (classes dirs), N rounds each, emitting one contract
# line per run. Usage:
#   tools/ab_bench.sh <classesA> <classesB> <queries> <rounds> [outfile]
# Each run is an independent JVM (graft.Bench, SPARK_GRAFT_BENCH_ONLY
# subset, second scale point disabled for speed); interleaving A/B/A/B…
# makes box-load drift hit both sides equally (the SCALING.md "guard
# kernel" protocol).
set -u
A=$1; B=$2; QUERIES=$3; ROUNDS=$4; OUT=${5:-/tmp/ab_bench.out}
OPENS="java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar"
ADDOPENS=""
for p in $OPENS; do ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"; done
: > "$OUT"
for i in $(seq 1 "$ROUNDS"); do
  for side in A B; do
    CP=$([ "$side" = A ] && echo "$A" || echo "$B")
    echo "== round $i side $side ==" >> "$OUT"
    SPARK_GRAFT_BENCH_ONLY="$QUERIES" SPARK_GRAFT_SF_DIR2="" \
    SPARK_GRAFT_BENCH_FULL="" \
    SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
    SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    java $ADDOPENS -Xmx${SPARK_DRIVER_MEM:-24g} -XX:ReservedCodeCacheSize=1g \
      -XX:-DontCompileHugeMethods -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC \
      -cp "$CP:/opt/spark/jars/*" graft.Bench 2>/tmp/ab_bench_err.$$ \
      | grep '"metric":"total"' >> "$OUT"
    # a crashed/OOM'd JVM emits no contract line — mark the side FAILED
    # instead of silently skewing the table with a missing row (r16
    # ADVICE #2): check the exit status AND that a line actually landed
    rc=${PIPESTATUS[0]}
    if [ "$rc" -ne 0 ] || ! tail -1 "$OUT" | grep -q '"metric":"total"'; then
      echo "FAILED round $i side $side rc=$rc (stderr tail: $(tail -2 /tmp/ab_bench_err.$$ | tr '\n' ' '))" >> "$OUT"
    fi
    rm -f /tmp/ab_bench_err.$$
  done
done
echo "done: $OUT"
