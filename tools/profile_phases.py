#!/usr/bin/env python
"""Attribute bench-phase wall time to stages vs driver gaps.

Runs the same maintenance phases as bench.py at --cpus over
SPARK_GRAFT_BENCH_ROWS rows, then pulls per-stage metrics from the Spark UI
REST API. For each phase prints:

  wall            phase wall-clock
  stage_wall      sum of (submission->completion) across its stages
  task_time/p     sum of executorRunTime / cpus  (perfectly-parallel floor)
  driver_gap      wall - stage_wall              (pure driver/serial time)
  sched_gap       stage_wall - task_time/p       (stragglers / low slots)

A big driver_gap is a fixed cost that caps N->4N scaling efficiency.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stages_snapshot(ui: str) -> dict[int, dict]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    out = {}
    for s in json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    ):
        out[(s["stageId"], s["attemptId"])] = s
    return out


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--rows", type=int, default=int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "3000000")))
    args = ap.parse_args()
    cpus = args.cpus

    os.environ["SPARK_GRAFT_BENCH_ROWS"] = str(args.rows)
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/cts-shuffle")
    from circus_train_spark.session import get_spark

    spark = get_spark(
        "profile",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    ui = "http://localhost:4049"

    # prewarm python workers like bench.py does
    spark.range(cpus * 4, numPartitions=cpus).groupBy("id").applyInPandas(
        lambda pdf: pdf, schema="id long"
    ).count()

    # monkey-patch time.monotonic boundaries: simplest is to re-run phases here
    from circus_train_spark.meta.catalog import TokenTable
    from circus_train_spark.operators.cluster import cluster
    from circus_train_spark.operators.compact import compact
    from circus_train_spark.operators.merge import merge_into
    from circus_train_spark.sources.generator import generate_changes, generate_tokens
    import shutil
    import tempfile

    bench_dir = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/dev/shm/cts-bench")
    os.makedirs(bench_dir, exist_ok=True)
    root = tempfile.mkdtemp(prefix="cts-prof-", dir=bench_dir)
    table = TokenTable.create(spark, os.path.join(root, "tbl"))
    df = generate_tokens(spark, args.rows, seed=42, partitions=64)
    target = 64 * 1024 * 1024

    phases = []

    def run_phase(name, fn):
        before = stages_snapshot(ui)
        t0 = time.monotonic()
        fn()
        wall = time.monotonic() - t0
        time.sleep(1.0)
        after = stages_snapshot(ui)
        new = [s for k, s in after.items() if k not in before]
        stage_wall = 0.0
        task_ms = 0
        detail = []
        for s in sorted(new, key=lambda s: s["stageId"]):
            try:
                sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
                comp = s.get("completionTime")
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%fGMT"
                dur = (
                    datetime.strptime(comp, fmt) - datetime.strptime(sub, fmt)
                ).total_seconds()
            except Exception:
                dur = 0.0
            stage_wall += dur
            task_ms += s.get("executorRunTime", 0)
            detail.append(
                (s["stageId"], s["name"].split("\n")[0][:60], round(dur, 2),
                 round(s.get("executorRunTime", 0) / 1000.0, 1), s.get("numTasks"))
            )
        phases.append(
            dict(
                phase=name,
                wall=round(wall, 2),
                stage_wall=round(stage_wall, 2),
                task_over_p=round(task_ms / 1000.0 / cpus, 2),
                driver_gap=round(wall - stage_wall, 2),
                sched_gap=round(stage_wall - task_ms / 1000.0 / cpus, 2),
                n_stages=len(new),
            )
        )
        print(json.dumps(phases[-1]))
        for d in detail:
            print("    stage", d)

    run_phase("append", lambda: table.append(df, num_files=256))
    run_phase("compact", lambda: compact(table, target_file_bytes=target, max_concurrency=cpus, verify=False))
    run_phase("cluster", lambda: cluster(table, target_file_bytes=target, verify=False))
    changes = generate_changes(spark, args.rows, seed=42)
    run_phase("merge", lambda: merge_into(table, changes, verify=False))
    run_phase("scan_full", lambda: table.table_digest(fast=False))
    run_phase("scan_fast", lambda: table.table_digest(fast=True))

    table.drop()
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"summary": phases}))
    spark.stop()


if __name__ == "__main__":
    main()
