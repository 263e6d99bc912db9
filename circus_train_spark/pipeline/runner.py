"""Config-driven job runner — the Locomotive driver-loop analogue.

Circus Train's entry point binds a YAML config to a list of table
replications and runs them **sequentially**, isolating per-table failures
(one bad table doesn't abort the run) and accumulating metrics
(``core/Locomotive.java:97-133``). This module re-expresses that loop for
maintenance jobs: a JSON config lists jobs; each runs in order; failures are
caught, recorded, and the loop continues; the result is one report with a
completion code per job (``CompletionCode`` semantics: SUCCESS=1,
FAILURE=-1, as in the reference's metrics).

Config shape::

    {"jobs": [
        {"op": "compact",  "table": "/path/t", "target_mb": 512},
        {"op": "cluster",  "table": "/path/t", "curve": "zorder"},
        {"op": "expire",   "table": "/path/t", "keep_last": 2,
         "grace_ms": 259200000},
        {"op": "replicate","source": "/path/t", "replica": "/path/r",
         "mode": "incremental",
         "partition_filter":
             "partition >= '#{#nowUtc().minusDays(3).toString(\\"yyyy-MM-dd\\")}'"},
        {"op": "delete",   "table": "/path/t", "where": "n_tok < 16",
         "mode": "auto"},
        {"op": "update",   "table": "/path/t", "where": "source='web'",
         "set": {"source": "upper(source)"}},
        {"op": "tag",      "table": "/path/t", "name": "pre-maintenance"},
        {"op": "rollback", "table": "/path/t", "snapshot": 42}
    ]}

Filter strings pass through the SpEL-equivalent constant folding
(``functions/expressions.py``) exactly once, before planning.
"""

from __future__ import annotations

import dataclasses
import json
import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from circus_train_spark.functions.expressions import resolve_expressions
from circus_train_spark.meta.catalog import TokenTable
from circus_train_spark.meta.metrics import FAILURE, SUCCESS


@dataclass
class JobReport:
    op: str
    completion_code: int
    duration_s: float
    result: dict | None = None
    error: str | None = None


@dataclass
class RunReport:
    jobs: list[JobReport] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return all(j.completion_code == SUCCESS for j in self.jobs)

    def as_dict(self) -> dict:
        return {"ok": self.ok, "jobs": [dataclasses.asdict(j) for j in self.jobs]}


def _run_one(spark: SparkSession, job: dict) -> dict:
    op = job["op"]
    if op == "compact":
        from circus_train_spark.operators.compact import compact

        t = TokenTable.load(spark, job["table"])
        res = compact(
            t,
            target_file_bytes=job.get("target_mb", 512) * 1024 * 1024,
            partitions=job.get("partitions"),
            small_file_threshold=job.get("small_file_threshold"),
            verify=job.get("verify", True),
        )
    elif op == "cluster":
        from circus_train_spark.operators.cluster import cluster

        t = TokenTable.load(spark, job["table"])
        res = cluster(
            t,
            target_file_bytes=job.get("target_mb", 512) * 1024 * 1024,
            partitions=job.get("partitions"),
            curve=job.get("curve", "zorder"),
            verify=job.get("verify", True),
        )
    elif op == "expire":
        from circus_train_spark.operators.expire import expire_snapshots

        t = TokenTable.load(spark, job["table"])
        res = expire_snapshots(
            t,
            keep_last=job.get("keep_last", 2),
            older_than_ms=job.get("older_than_ms"),
            grace_period_ms=job.get("grace_ms", 0),
        )
    elif op == "rewrite_manifests":
        from circus_train_spark.operators.manifest_rewrite import rewrite_manifests

        t = TokenTable.load(spark, job["table"])
        res = rewrite_manifests(t, target_manifests=job.get("target", 1))
    elif op == "housekeeping":
        from circus_train_spark.operators.housekeeping import (
            DEFAULT_GRACE_MS,
            run_housekeeping,
        )

        t = TokenTable.load(spark, job["table"])
        res = run_housekeeping(t, grace_period_ms=job.get("grace_ms", DEFAULT_GRACE_MS))
    elif op == "remove_orphans":
        from circus_train_spark.operators.housekeeping import (
            DEFAULT_GRACE_MS,
            remove_orphan_files,
        )

        t = TokenTable.load(spark, job["table"])
        res = remove_orphan_files(
            t, grace_period_ms=job.get("grace_ms", DEFAULT_GRACE_MS)
        )
    elif op == "merge":
        from circus_train_spark.operators.merge import merge_into

        t = TokenTable.load(spark, job["table"])
        res = merge_into(
            t,
            spark.read.parquet(job["changes"]),
            verify=job.get("verify", True),
        )
    elif op == "replicate":
        from circus_train_spark.operators.replicate import replicate

        src = TokenTable.load(spark, job["source"])
        try:
            rep = TokenTable.load(spark, job["replica"])
        except FileNotFoundError:
            rep = TokenTable.create(spark, job["replica"])
        pf = job.get("partition_filter")
        res = replicate(
            src,
            rep,
            mode=job.get("mode", "incremental"),
            partition_filter=resolve_expressions(pf) if pf else None,
            partition_limit=job.get("partition_limit"),
            propagate_deletes=job.get("propagate_deletes", False),
            table_mappings=job.get("table_mappings"),
        )
    elif op == "create_view":
        t = TokenTable.load(spark, job["table"])
        snap = t.create_view(job["name"], job["sql"])
        res = {"view": job["name"], "snapshot": snap.snapshot_id}
    elif op == "drop_view":
        t = TokenTable.load(spark, job["table"])
        snap = t.drop_view(job["name"])
        res = {"dropped": job["name"], "snapshot": snap.snapshot_id}
    elif op == "delete":
        from circus_train_spark.operators.delete import delete_where

        t = TokenTable.load(spark, job["table"])
        res = delete_where(
            t,
            job["where"],
            mode=job.get("mode", "auto"),
            verify=job.get("verify", True),
        )
    elif op == "update":
        from circus_train_spark.operators.delete import update_where

        t = TokenTable.load(spark, job["table"])
        res = update_where(
            t, job["where"], job["set"], mode=job.get("mode", "cow")
        )
    elif op == "rollback":
        from circus_train_spark.operators.rollback import rollback

        t = TokenTable.load(spark, job["table"])
        snap = rollback(t, job["snapshot"])
        res = {"restored": job["snapshot"], "new_snapshot": snap.snapshot_id}
    elif op == "tag":
        t = TokenTable.load(spark, job["table"])
        sid = t.create_tag(job["name"], job.get("snapshot"))
        res = {"tag": job["name"], "snapshot": sid}
    elif op == "validate":
        from circus_train_spark.operators.validate import validate

        t = TokenTable.load(spark, job["table"])
        res = validate(t)
        if not res.ok:
            raise AssertionError("; ".join(res.issues[:5]))
    else:
        raise ValueError(f"unknown op: {op!r}")
    return dataclasses.asdict(res) if dataclasses.is_dataclass(res) else dict(res)


def run_config(spark: SparkSession, config: dict) -> RunReport:
    """Run every job in order; a failing job is recorded (completion code
    -1, like the reference's per-table catch in ``Locomotive.run``) and the
    loop continues with the next one."""
    report = RunReport()
    for job in config.get("jobs", []):
        t0 = time.monotonic()
        try:
            result = _run_one(spark, job)
            report.jobs.append(
                JobReport(
                    op=job["op"],
                    completion_code=SUCCESS,
                    duration_s=round(time.monotonic() - t0, 3),
                    result=result,
                )
            )
        except Exception as e:  # noqa: BLE001 — per-job failure isolation
            report.jobs.append(
                JobReport(
                    op=job.get("op", "?"),
                    completion_code=FAILURE,
                    duration_s=round(time.monotonic() - t0, 3),
                    error=f"{type(e).__name__}: {e}",
                )
            )
    return report


def run_config_file(spark: SparkSession, path: str) -> RunReport:
    with open(path) as f:
        return run_config(spark, json.load(f))
