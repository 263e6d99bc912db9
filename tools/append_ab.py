#!/usr/bin/env python
"""One-phase A/B probe: time the bench append at --cpus in a fresh JVM.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/append_ab.py --cpus 8 --rows 3000000
Prints one JSON line {cpus, rows, driver_mem, java_opts, append_s, cpu_task_s}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--rows", type=int, default=3000000)
    args = ap.parse_args()
    cpus = args.cpus

    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/cts-shuffle")
    from circus_train_spark.session import get_spark

    extra = {"spark.ui.enabled": "true", "spark.ui.port": "4048"}
    jopts = os.environ.get("SPARK_GRAFT_JAVA_OPTS")
    if jopts:
        extra["spark.driver.extraJavaOptions"] = jopts
    spark = get_spark(
        "append-ab", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8),
        extra_conf=extra,
    )
    from circus_train_spark.meta.catalog import TokenTable
    from circus_train_spark.sources.generator import generate_tokens

    spark.range(cpus * 4, numPartitions=cpus).groupBy("id").applyInPandas(
        lambda pdf: pdf, schema="id long"
    ).count()

    bench_dir = "/dev/shm/cts-bench"
    os.makedirs(bench_dir, exist_ok=True)
    root = tempfile.mkdtemp(prefix="cts-ab-", dir=bench_dir)
    table = TokenTable.create(spark, os.path.join(root, "tbl"))
    df = generate_tokens(spark, args.rows, seed=42, partitions=64)

    t0 = time.monotonic()
    table.append(df, num_files=256)
    wall = time.monotonic() - t0

    apps = json.load(urllib.request.urlopen("http://localhost:4048/api/v1/applications"))
    stages = json.load(
        urllib.request.urlopen(
            f"http://localhost:4048/api/v1/applications/{apps[0]['id']}/stages?status=complete"
        )
    )
    cpu_task_s = sum(s.get("executorRunTime", 0) for s in stages) / 1000.0
    gc_s = sum(s.get("jvmGcTime", 0) for s in stages) / 1000.0

    table.drop()
    shutil.rmtree(root, ignore_errors=True)
    print(
        json.dumps(
            dict(
                cpus=cpus,
                rows=args.rows,
                driver_mem=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
                java_opts=jopts or "",
                append_s=round(wall, 2),
                cpu_task_s=round(cpu_task_s, 1),
                gc_task_s=round(gc_s, 1),
            )
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
