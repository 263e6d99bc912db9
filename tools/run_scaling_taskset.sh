#!/usr/bin/env bash
# Affinity-pinned variant of run_scaling.sh.
#
# Motivation: in local[N] mode the JVM task threads are capped at N but
# pandas-UDF Python workers are EXTRA processes — a "2-core" leg can
# borrow idle host cores during UDF stages (and an 8-core leg can
# oversubscribe under external load), biasing the N→4N ratio in both
# directions. `taskset` bounds the WHOLE process tree (JVM + Python
# workers + parquet IO threads) to exactly N logical CPUs — the closest
# sandbox stand-in for "an executor with N cores".
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
ITERS="${ITERS:-2}"
OUT="${OUT:-BENCH/scaling_taskset_15M.jsonl}"
export SPARK_GRAFT_BENCH_DIR="${SPARK_GRAFT_BENCH_DIR:-/dev/shm/cts-bench}"
export SPARK_GRAFT_LOCAL_DIR="${SPARK_GRAFT_LOCAL_DIR:-/dev/shm/cts-shuffle}"
: > "$OUT"
declare -A MASK=( [2]="0-1" [8]="0-7" [32]="0-31" )
for I in $(seq 1 "$ITERS"); do
  for CPUS in ${LEVELS:-2 8}; do  # no inner quotes: must word-split
    echo "=== taskset cpus=$CPUS mask=${MASK[$CPUS]} iter=$I $(date -u +%H:%M:%S) loadavg=$(cut -d' ' -f1-3 /proc/loadavg) ===" >&2
    SPARK_GRAFT_SF_DIR="$SF_DIR" taskset -c "${MASK[$CPUS]}" \
      python bench.py --cpus "$CPUS" --skip-queries 2>/dev/null \
      | tail -1 >> "$OUT"
    rm -rf "$SPARK_GRAFT_BENCH_DIR"/* 2>/dev/null || true
  done
done
python tools/scaling_summary.py "$OUT"
