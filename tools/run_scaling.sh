#!/usr/bin/env bash
# Evidence for the north rule's N→4N scaling-efficiency criterion, run as
# the same maintenance job at two parallelism levels on the SAME input
# (local[8] vs local[32] — the sandbox stand-in for N vs 4N executors).
# Writes JSON lines to BENCH_SCALING.jsonl; summarize into BASELINE.md §ours.
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
OUT="BENCH_SCALING.jsonl"
: > "$OUT"
for CPUS in 8 32; do
  echo "=== cpus=$CPUS sf_dir=$SF_DIR ===" >&2
  SPARK_GRAFT_SF_DIR="$SF_DIR" python bench.py --cpus "$CPUS" --skip-queries \
    | tail -1 >> "$OUT"
done
python - <<'EOF'
import json
rows = [json.loads(l) for l in open("BENCH_SCALING.jsonl")]
by = {r["cpus"]: r for r in rows}
a, b = by[8], by[32]
phases = ["append_s", "compact_s", "cluster_s", "merge_s", "scan_s"]
print(f"{'phase':16} {'local[8]':>10} {'local[32]':>10} {'speedup':>8} {'eff':>6}")
for p in phases:
    sp = a[p] / b[p]
    print(f"{p:16} {a[p]:>10.1f} {b[p]:>10.1f} {sp:>8.2f} {sp/4:>6.2f}")
tot_a = sum(a[p] for p in phases)
tot_b = sum(b[p] for p in phases)
print(f"{'TOTAL':16} {tot_a:>10.1f} {tot_b:>10.1f} {tot_a/tot_b:>8.2f} {tot_a/tot_b/4:>6.2f}")
EOF
