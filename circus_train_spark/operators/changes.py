"""Row-level change feed between two snapshots (CDC read).

The reference computes change sets at partition altitude (Hive Diff's
new/changed classification, ``circus-train-comparator/.../hive/
HiveDifferences.java:206-261``); a lakehouse table can do better: because
data files are immutable and manifests name exactly which files each
snapshot references, the churn between two snapshots is confined to the
**symmetric difference of their file sets**.

Plan (manifest-pruned, the scale story):

1. driver-side set arithmetic over the two manifests → ``added_files``
   (in B, not A) and ``removed_files`` (in A, not B). Files common to both
   snapshots hold byte-identical rows and are never read.
2. rows(added) ANTI-JOIN rows(removed) on the row content hash → inserts;
   the reverse anti-join → deletes. An UPDATE surfaces as delete+insert of
   the same ``doc_id`` (the MERGE operator's copy-on-write rewrites carry
   untouched rows into new files; those carried rows appear on both sides
   and cancel in the anti-joins).

Only churned files are scanned and only an 8-byte hash shuffles — a 100 TB
table with a 100 GB merge reads ~the merge's touched bytes, not the table.
Semantics are content-level (multiset-of-rows diff), exact while ``doc_id``
is unique per snapshot, which MERGE enforces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from circus_train_spark.functions.digest import row_hash
from circus_train_spark.meta.catalog import TokenTable

CHANGE_COL = "_change"
INSERT = "insert"
DELETE = "delete"


def table_changes(
    table: TokenTable,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """Rows inserted/deleted between two snapshots, tagged ``_change``.

    ``to_snapshot_id`` defaults to the current head. Both snapshots must be
    retained (expiry may have deleted older descriptors/files).
    """
    to_snapshot_id = (
        to_snapshot_id
        if to_snapshot_id is not None
        else table.current_snapshot().snapshot_id
    )
    a_files = set(table.file_paths(from_snapshot_id))
    b_files = set(table.file_paths(to_snapshot_id))
    added = sorted(b_files - a_files)
    removed = sorted(a_files - b_files)

    schema = table.data_schema(to_snapshot_id)
    cols = [f.name for f in schema.fields]
    empty = table.spark.createDataFrame([], schema).select(
        *cols, F.lit("").alias(CHANGE_COL)
    )
    if not added and not removed:
        return empty

    def _scan(paths: list[str]) -> DataFrame:
        return table.scan(files=paths).withColumn("_h", row_hash())

    if added and removed:
        new_rows = _scan(added)
        old_rows = _scan(removed)
        inserts = new_rows.join(old_rows.select("_h"), "_h", "left_anti")
        deletes = old_rows.join(new_rows.select("_h"), "_h", "left_anti")
        out = inserts.withColumn(CHANGE_COL, F.lit(INSERT)).unionByName(
            deletes.withColumn(CHANGE_COL, F.lit(DELETE))
        )
    elif added:  # pure append
        out = _scan(added).withColumn(CHANGE_COL, F.lit(INSERT))
    else:  # pure delete/expire of data
        out = _scan(removed).withColumn(CHANGE_COL, F.lit(DELETE))
    return out.select(*cols, CHANGE_COL)
