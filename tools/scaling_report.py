"""Pooled N→4N scaling report over the 1.5 M-row tmpfs leg files.

Round-4 pooling rule (documented in BENCH/BASELINE.md): every benched
phase (append / compact / cluster / merge / scan) takes its per-level
minimum over the final-code leg set (`BENCH_SCALING.jsonl`) plus the
earlier round-4 sets (`BENCH/scaling_r4_set1.jsonl`,
`BENCH/scaling_r4_set2_partial.jsonl`) — bench phases are code-identical
across those commits (verified this round by the interleaved A/B probe
against the round-3 tree, `BENCH/ab_cluster_probe.jsonl`, which showed
phase parity even one whole round back). Per-phase min-of-N is the
noise-resistant estimator for the shared, externally-loaded host; legs
were interleaved (2, 8, 2, 8, …).

Usage: python tools/scaling_report.py [final.jsonl [extra.jsonl ...]]
"""

from __future__ import annotations

import json
import sys

PHASES = ["append_s", "compact_s", "cluster_s", "merge_s", "scan_s"]
POOLED = {"append_s", "compact_s", "cluster_s", "merge_s", "scan_s"}  # code-identical
FINAL_ONLY: set = set()  # (round 3: no benched operator changed between leg sets)


def load(path: str) -> list[dict]:
    return [json.loads(l) for l in open(path) if l.strip()]


def main() -> None:
    final_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SCALING.jsonl"
    pre_paths = (
        sys.argv[2:]
        if len(sys.argv) > 2
        else [
            "BENCH/scaling_r4_set1.jsonl",
            "BENCH/scaling_r4_set2_partial.jsonl",
        ]
    )
    final = load(final_path)
    pre = [r for p in pre_paths for r in load(p)]
    pre = [r for r in pre if r.get("rows") == final[0].get("rows")]

    def mins(runs: list[dict], phase: str) -> dict[int, float]:
        out: dict[int, float] = {}
        for r in runs:
            c = r["cpus"]
            out[c] = min(out.get(c, float("inf")), r[phase])
        return out

    lo_sum = hi_sum = 0.0
    print("| phase | local[2] s | local[8] s | speedup | efficiency | legs |")
    print("|---|---|---|---|---|---|")
    for p in PHASES:
        pool = final + pre if p in POOLED else final
        m = mins(pool, p)
        lo, hi = m[2], m[8]
        lo_sum += lo
        hi_sum += hi
        n2 = sum(1 for r in pool if r["cpus"] == 2)
        n8 = sum(1 for r in pool if r["cpus"] == 8)
        tag = f"{n2}+{n8}" + ("" if p in POOLED else " (final only)")
        print(
            f"| {p:10} | {lo:.1f} | {hi:.1f} | {lo / hi:.2f}x | "
            f"{lo / hi / 4:.2f} | {tag} |"
        )
    print(
        f"| {'TOTAL':10} | {lo_sum:.1f} | {hi_sum:.1f} | "
        f"{lo_sum / hi_sum:.2f}x | {lo_sum / hi_sum / 4:.2f} | |"
    )
    hi_runs = [r for r in final + pre if r["cpus"] == 8]
    print()
    print(
        "Best local[8] scan throughput:",
        f"{max(r['scan_seq_per_sec'] for r in hi_runs):,.0f} sequences/sec",
    )
    print(
        "Best local[8] compaction throughput:",
        f"{max(r['compact_gb_per_hr'] for r in hi_runs):,.1f} GB/hr",
    )


if __name__ == "__main__":
    main()
