"""Summarize BENCH_SCALING.jsonl into the N→4N efficiency table."""

from __future__ import annotations

import json

PHASES = ["append_s", "compact_s", "cluster_s", "merge_s", "scan_s"]


def load(path: str = "BENCH_SCALING.jsonl"):
    rows = [json.loads(l) for l in open(path) if l.strip()]
    by: dict[int, list[dict]] = {}
    for r in rows:
        by.setdefault(r["cpus"], []).append(r)
    return by


def summarize(by=None) -> str:
    by = by or load()
    phases = list(PHASES)
    if all(all("scan_fast_s" in r for r in runs) for runs in by.values()):
        phases.append("scan_fast_s")
    mins = {
        c: {p: min(r[p] for r in runs) for p in phases} for c, runs in by.items()
    }
    if len(mins) < 2:
        (c,) = mins
        out = [f"single level local[{c}] — per-phase minima only:"]
        out += [f"| {p:14} | {mins[c][p]:.1f} |" for p in phases]
        return "\n".join(out)
    lo, hi = sorted(mins)
    a, b = mins[lo], mins[hi]
    ratio = hi / lo  # observed cpu ratio, NOT a hard-coded 4
    lines = [
        (f"| {'phase':14} | local[{lo}] s | local[{hi}] s | speedup | efficiency |"),
        "|---|---|---|---|---|",
    ]
    for p in phases:
        sp = a[p] / b[p]
        lines.append(
            f"| {p:14} | {a[p]:.1f} | {b[p]:.1f} | {sp:.2f}x | {sp / ratio:.2f} |"
        )
    # TOTAL stays over the 5 canonical phases (scan_fast_s is an alternate
    # scan implementation, not an additional suite phase — counting both
    # would double-weight the scan).
    ta, tb = sum(a[p] for p in PHASES), sum(b[p] for p in PHASES)
    lines.append(
        f"| {'TOTAL':14} | {ta:.1f} | {tb:.1f} | {ta / tb:.2f}x | {ta / tb / ratio:.2f} |"
    )
    hi_runs = by[hi]
    best = max(r["scan_seq_per_sec"] for r in hi_runs)
    gbhr = max(r["compact_gb_per_hr"] for r in hi_runs)
    lines.append("")
    lines.append(f"Best local[{hi}] scan throughput: {best:,.0f} sequences/sec")
    lines.append(f"Best local[{hi}] compaction throughput: {gbhr:,.1f} GB/hr")
    return "\n".join(lines)


if __name__ == "__main__":
    import sys

    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SCALING.jsonl"
    print(summarize(load(path)))
