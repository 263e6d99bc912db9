"""Source-vs-replica table diff — the engine's incremental-computation core.

Re-expresses Circus Train's Hive Diff (left-outer join of source partitions
onto replica partitions by name, classifying *new* / *changed* via metadata
and checksum comparison — ``circus-train-comparator/.../hive/
HiveDifferences.java:206-261``) plus the destructive replica's
deleted-partition anti-join (``core/replica/DestructiveReplica.java:83-127``)
as ONE full-outer join over per-partition content digests.

Key property: the diff is **manifest-only** — per-file ``xor_digest`` values
(bit-xor of per-row xxhash64, written at file-creation time) fold into an
order-insensitive per-partition digest, so comparing two tables of any size
reads zero data bytes. This mirrors the reference's design of comparing
stored path checksums instead of re-reading data
(``PathToPathMetadata.java:43-69``, checksums stamped at replication time by
``AddCheckSumReplicaTableFactory.java:47-61``).

At scale: the join is partition-count sized (thousands of rows), broadcast
by Catalyst automatically; manifests themselves are read distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from circus_train_spark.meta.catalog import TokenTable

STATUS_NEW = "new"  # present at source, absent at replica
STATUS_DELETED = "deleted"  # absent at source, present at replica
STATUS_CHANGED = "changed"  # both present, content digest differs
STATUS_UNCHANGED = "unchanged"


def partition_digests(
    table: TokenTable, snapshot_id: int | None = None
) -> DataFrame:
    """(partition, n_rows, n_bytes, digest) per partition, manifest-only.

    xor-of-file-digests == xor of all row hashes in the partition —
    order-insensitive and invariant under compaction/clustering rewrites.
    """
    return (
        table.manifest_df(snapshot_id)
        .groupBy("partition")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("file_size").alias("n_bytes"),
            F.expr("bit_xor(xor_digest)").alias("digest"),
        )
    )


def table_diff(
    source: TokenTable,
    replica: TokenTable,
    source_snapshot_id: int | None = None,
    replica_snapshot_id: int | None = None,
) -> DataFrame:
    """Full-outer diff → (partition, status, src_rows, rep_rows).

    The reference's short-circuit comparator semantics (first difference
    decides — ``comparator/.../AbstractComparator.java:46-50``) fall out of
    the ``F.when`` chain; its full-diff mode is this entire DataFrame.
    """
    src = partition_digests(source, source_snapshot_id).alias("s")
    rep = partition_digests(replica, replica_snapshot_id).alias("r")
    j = src.join(rep, F.col("s.partition") == F.col("r.partition"), "full_outer")
    status = (
        F.when(F.col("r.partition").isNull(), STATUS_NEW)
        .when(F.col("s.partition").isNull(), STATUS_DELETED)
        .when(
            (F.col("s.digest") != F.col("r.digest"))
            | (F.col("s.n_rows") != F.col("r.n_rows")),
            STATUS_CHANGED,
        )
        .otherwise(STATUS_UNCHANGED)
    )
    return j.select(
        F.coalesce(F.col("s.partition"), F.col("r.partition")).alias("partition"),
        status.alias("status"),
        F.col("s.n_rows").alias("src_rows"),
        F.col("r.n_rows").alias("rep_rows"),
    )


def changed_partitions(diff: DataFrame) -> list[str]:
    """Partitions needing replication (the generated 'partition predicate' —
    reference: ``DiffGeneratedPartitionPredicate.java:65-93``)."""
    rows = diff.filter(F.col("status").isin(STATUS_NEW, STATUS_CHANGED)).collect()
    return sorted(r["partition"] for r in rows)


def deleted_partitions(diff: DataFrame) -> list[str]:
    rows = diff.filter(F.col("status") == STATUS_DELETED).collect()
    return sorted(r["partition"] for r in rows)


def render_comparison(source: TokenTable, replica: TokenTable) -> tuple[str, int]:
    """Human-readable difference report — the comparison tool's output
    surface (``circus-train-comparison-tool/.../TableComparator.java:39-71``
    renders each difference with its path/context; the empty-diff case says
    so explicitly). Returns (report text, number of differences)."""
    rows = table_diff(source, replica).orderBy("partition").collect()
    diffs = [r for r in rows if r["status"] != STATUS_UNCHANGED]
    lines = [
        f"Comparing source '{source.root}' (snapshot {source.current_snapshot().snapshot_id})",
        f"with replica  '{replica.root}' (snapshot {replica.current_snapshot().snapshot_id})",
        "",
    ]
    if not diffs:
        lines.append("Tables are identical: no differences found "
                     f"({len(rows)} partitions compared).")
        return "\n".join(lines), 0
    for r in diffs:
        if r["status"] == STATUS_NEW:
            detail = f"only at source ({r['src_rows']} rows)"
        elif r["status"] == STATUS_DELETED:
            detail = f"only at replica ({r['rep_rows']} rows)"
        else:
            detail = (
                f"content differs (source {r['src_rows']} rows, "
                f"replica {r['rep_rows']} rows)"
            )
        lines.append(f"  partition={r['partition']}: {r['status'].upper()} — {detail}")
    lines.append("")
    lines.append(
        f"{len(diffs)} difference(s) across {len(rows)} compared partition(s)."
    )
    return "\n".join(lines), len(diffs)
