"""Z-order / Hilbert clustering: one-shuffle range-partitioned rewrite.

Plan:
1. read the live files of the chosen partitions (snapshot-pinned scan);
2. compute the clustering key with the numpy bit-interleave pandas UDF
   (``functions/zorder.py``): morton3(fold(xxhash64(doc_id)), scale(n_tok),
   dict_code(source)) — the dictionary code is computed driver-side from the
   manifest's partition values (low cardinality by contract);
3. ``repartitionByRange(n_out, source, zkey, _salt)`` — **source-major**
   composite range so almost every output task holds exactly one partition
   value (single-source data files), zkey ordering inside, and a
   deterministic salt (pmod(xxhash64(doc_id), n)) as the final range column
   so hot (source, zkey) duplicates split across tasks instead of skewing
   one: the north rule's "salted keys on skewed source values". Spark's
   range partitioner *samples* the key distribution, so the ~50%-hot source
   gets proportionally many output ranges — skew is balanced by construction;
4. ``sortWithinPartitions(zkey)`` + write → files sorted by zkey;
5. per-file min/max **zkey** stats (recomputed from row content — the key is
   deterministic) go into the manifest for stats-based file skipping;
6. single atomic commit replacing the partition's files; scan equality
   verified by order-insensitive digest.

Everything is one shuffle (the range exchange, sized by data volume); the
sort is within output tasks only. At 100 TB: n_out ≈ bytes/target, the range
sampler is O(n_out) driver memory, and no task sees more than ~target bytes.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass

from pyspark.sql import functions as F

from circus_train_spark.ids import new_event_id
from circus_train_spark.meta import schema as S
from circus_train_spark.meta.catalog import TokenTable
from circus_train_spark.meta.lineage import STATUS_DONE, LineageRecord
from circus_train_spark.functions.zorder import salt_column, with_zkey

OP = "cluster"


@dataclass
class ClusterResult:
    snapshot_id: int | None
    files_in: int
    files_out: int
    bytes_in: int
    rows: int
    curve: str
    duration_s: float


def cluster(
    table: TokenTable,
    target_file_bytes: int = 512 * 1024 * 1024,
    partitions: list[str] | None = None,
    curve: str = "zorder",
    n_salts: int = 16,
    verify: bool = True,
    run_id: str | None = None,
) -> ClusterResult:
    t0 = time.monotonic()
    event_id = run_id or new_event_id()
    base = table.current_snapshot()

    entries = table.manifest_entries(base.snapshot_id)
    if partitions is not None:
        keep = set(partitions)
        entries = [e for e in entries if e["partition"] in keep]
    if not entries:
        return ClusterResult(None, 0, 0, 0, 0, curve, 0.0)

    in_files = [e["file_path"] for e in entries]
    bytes_in = sum(e["file_size"] for e in entries)
    rows_in = sum(e["n_rows"] for e in entries)
    # driver-side planning constants from manifest stats — no data scan
    source_codes = {
        s: i
        for i, s in enumerate(sorted({e["partition"] for e in entries if e["partition"]}))
    }
    n_tok_min = min(e["min_n_tok"] for e in entries if e["min_n_tok"] is not None)
    n_tok_max = max(e["max_n_tok"] for e in entries if e["max_n_tok"] is not None)

    if verify:
        digest_before = table.table_digest(base.snapshot_id)

    df = table.scan(files=in_files)
    zdf = with_zkey(df, source_codes, n_tok_min, n_tok_max, curve=curve)
    n_out = max(1, math.ceil(bytes_in / target_file_bytes))
    from circus_train_spark.functions.digest import row_hash

    out = (
        zdf.withColumn("_salt", salt_column(n_salts))
        .repartitionByRange(n_out, F.col("source"), F.col("zkey"), F.col("_salt"))
        .sortWithinPartitions("zkey")
        # persist zkey + row hash as hidden columns: the manifest stats pass
        # below reads ONLY narrow columns — token arrays are never re-decoded
        # and the zkey pandas UDF never re-runs
        .select("doc_id", "tokens", "n_tok", "source", S.ZKEY_COL)
        .withColumn(S.ROW_HASH_COL, row_hash())
        .withColumn(S.WRITE_PART_COL, F.col("source"))
    )
    out_dir = f"{table.data_dir}/{event_id}/clustered"
    out.write.mode("overwrite").option("compression", S.TOKEN_PARQUET_CODEC).partitionBy(
        S.WRITE_PART_COL
    ).parquet(out_dir)

    added = table.collect_entries_for_dir(out_dir, zkey=True)

    table.lineage.append(
        LineageRecord(
            run_id=event_id,
            operation=OP,
            group_id=event_id,
            partition=",".join(sorted(source_codes)) if partitions else None,
            files_in=in_files,
            files_out=[e["file_path"] for e in added],
            rows=rows_in,
            bytes_in=bytes_in,
            bytes_out=sum(e["file_size"] for e in added),
            status=STATUS_DONE,
            duration_s=time.monotonic() - t0,
        )
    )
    snap = table.commit(
        operation=OP,
        added=added,
        removed_paths=set(in_files),
        summary={"curve": curve, "n_out": n_out, "n_salts": n_salts},
        expected_parent_id=base.snapshot_id,
        event_id=event_id,
    )
    if verify:
        digest_after = table.table_digest(snap.snapshot_id)
        if digest_after != digest_before:
            raise AssertionError(
                f"scan-equality violated by clustering: {digest_before} -> {digest_after}"
            )
    return ClusterResult(
        snapshot_id=snap.snapshot_id,
        files_in=len(in_files),
        files_out=len(added),
        bytes_in=bytes_in,
        rows=rows_in,
        curve=curve,
        duration_s=time.monotonic() - t0,
    )


