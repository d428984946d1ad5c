#!/bin/bash
# Re-runnable 10x scale probe (the one that produced SCALING.md's measured
# table): builds a x10 corpus from an sf dir by copying each parquet file
# ten times into a directory-per-table layout (Spark reads a directory of
# parquet parts as one table), then runs graft.Bench against it with the
# original dir as the second scale point, so the emitted JSON's
# `scale_ratio` block is the measured 10x ratio per query.
#
# Usage: tools/scale_probe.sh [SF_DIR] [OUT_DIR]
#   SF_DIR  source scale dir   (default /root/testdata/sf0.1)
#   OUT_DIR x10 corpus target  (default /tmp/graft_sfx10)
set -euo pipefail
SF_DIR=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/graft_sfx10}

if [ ! -d "$OUT" ]; then
  mkdir -p "$OUT"
  for f in "$SF_DIR"/*.parquet; do
    t=$(basename "$f" .parquet)
    mkdir -p "$OUT/$t.parquet"
    for i in $(seq 0 9); do cp "$f" "$OUT/$t.parquet/part-$i.parquet"; done
  done
  echo "[scale_probe] built x10 corpus at $OUT" >&2
fi

cd "$(dirname "$0")/.."
SPARK_GRAFT_SF_DIR="$OUT" SPARK_GRAFT_SF_DIR2="$SF_DIR" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  exec tools/run_main.sh graft.Bench
