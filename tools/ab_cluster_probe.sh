#!/usr/bin/env bash
# A/B probe: cluster_s at HEAD vs round-3 code (8d59b9c) on identical
# inputs (300k rows, local[8], tmpfs), interleaved A,B,A,B so host drift
# samples both alike. Diagnoses whether the round-4 cluster_s rise is a
# code regression or tenant noise.
#
# Recreate the B tree first: git worktree add .ab-r3 8d59b9c
set -euo pipefail
cd "$(dirname "$0")/.."
export SPARK_GRAFT_BENCH_ROWS="${ROWS:-300000}"
export SPARK_GRAFT_BENCH_DIR=/dev/shm/cts-ab
export SPARK_GRAFT_LOCAL_DIR=/dev/shm/cts-shuffle
export SPARK_GRAFT_BENCH_REPEATS=1
OUT="BENCH/ab_cluster_probe.jsonl"
: > "$OUT"
for I in $(seq 1 "${ITERS:-2}"); do
  for TREE in . .ab-r3; do
    echo "=== tree=$TREE iter=$I $(date -u +%H:%M:%S) loadavg=$(cut -d' ' -f1 /proc/loadavg) ===" >&2
    ( cd "$TREE" && python bench.py --cpus 8 --skip-queries 2>/dev/null | tail -1 \
        | python -c "import json,sys; r=json.load(sys.stdin); r['tree']='$TREE'; print(json.dumps(r))" ) >> "$OUT"
    rm -rf /dev/shm/cts-ab/* 2>/dev/null || true
  done
done
python - <<'EOF'
import json
rows = [json.loads(l) for l in open("BENCH/ab_cluster_probe.jsonl")]
for r in rows:
    print(r["tree"], {k: r[k] for k in ("append_s","compact_s","cluster_s","merge_s","scan_s")})
EOF
