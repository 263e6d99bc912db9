"""Small-file compaction: FFD bin-packed, shuffle-free, resumable.

Plan: manifest scan → candidate small files (predicate + limit over the
manifest DataFrame, the analogue of the reference's partition-predicate
metastore scan ``core/HiveEndpoint.java:147-174``) → driver-side FFD
bin-packing into target-size groups (``binpack.py``) → per-group rewrite →
single atomic snapshot commit.

Execution model (scale rationale):
- **no shuffle**: a bin-pack rewrite is read-concat-write; each group is one
  Spark job `read.parquet(group files).coalesce(1).write` whose single task
  streams the group (≤ target size, default 512 MB) through memory. Groups
  run concurrently from a driver thread pool under FAIR scheduling, so a
  1000-executor cluster keeps every slot busy with independent single-task
  jobs — the same work-unit shape as the reference's map-per-file copy jobs
  (``CopyMapper.java:112-150``), with Spark's scheduler replacing the MR
  input-format split planner.
- **resume**: group ids are content-deterministic; each finished group
  appends a lineage record. A rerun after a crash re-plans the identical
  groups, skips the completed ones (outputs verified present), rewrites the
  rest, and commits exactly once (reference analogue: per-table failure
  isolation ``core/Locomotive.java:107-126``).
- the commit removes exactly the input files and adds the group outputs;
  scan equality is checked via the order-insensitive table digest unless
  disabled.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import functions as F

from circus_train_spark.ids import new_event_id
from circus_train_spark.meta import schema as S
from circus_train_spark.meta.catalog import TokenTable
from circus_train_spark.meta.lineage import STATUS_DONE, LineageRecord
from circus_train_spark.operators.binpack import FileGroup, plan_compaction_groups

OP = "compact"


@dataclass
class CompactionResult:
    snapshot_id: int | None
    groups_planned: int
    groups_rewritten: int
    groups_skipped: int
    files_in: int
    files_out: int
    bytes_in: int
    rows: int
    duration_s: float


import pyspark.sql.types as T


def _rewrite_schema(table: TokenTable) -> T.StructType:
    """Rewrite schema: the table's CURRENT data columns (schema evolution
    carries added/widened columns through the rewrite) + the persisted
    hidden columns (row hash, clustering key) copied verbatim so output
    stats derive from the input manifest entries with zero post-write
    scanning."""
    return T.StructType(
        table.data_schema().fields
        + [
            T.StructField(S.ZKEY_COL, T.LongType(), True),
            T.StructField(S.ROW_HASH_COL, T.LongType(), True),
        ]
    )


def _derive_group_entry(group: FileGroup, in_entries: list[dict], out_path: str) -> dict:
    """A bin-pack rewrite is row-preserving, so every manifest stat of the
    output file is a pure fold of the inputs' stats (xor digests compose);
    only the physical size comes from the filesystem."""
    xor = 0
    for e in in_entries:
        xor ^= e["xor_digest"] or 0

    def _mm(key, fn):
        vals = [e[key] for e in in_entries if e[key] is not None]
        return fn(vals) if vals else None

    def _mm_strict(key, fn):
        # zkey bounds: any input without zkey stats may hold null-zkey rows,
        # so the folded bounds would NOT cover them — emit None (conservative
        # keep-file convention, mirrors file_paths._hits null handling)
        vals = [e[key] for e in in_entries]
        return fn(vals) if vals and all(v is not None for v in vals) else None

    return {
        "file_path": out_path,
        "partition": group.partition,
        "file_size": os.path.getsize(out_path),
        "n_rows": sum(e["n_rows"] for e in in_entries),
        "min_doc_id": _mm("min_doc_id", min),
        "max_doc_id": _mm("max_doc_id", max),
        "min_n_tok": _mm("min_n_tok", min),
        "max_n_tok": _mm("max_n_tok", max),
        "min_zkey": _mm_strict("min_zkey", min),
        "max_zkey": _mm_strict("max_zkey", max),
        "xor_digest": xor,
        "added_snapshot_id": -1,
    }


def _rewrite_group(
    table: TokenTable,
    group: FileGroup,
    entry_by_path: dict[str, dict],
    event_id: str,
    snapshot_id: int | None = None,
) -> tuple[FileGroup, list[dict], float]:
    """Read the group's files and write them back as one file. Runs in a
    driver worker thread; the heavy lifting is one single-task Spark job.

    Files targeted by pending merge-on-read delete files (equality OR
    positional) have their deleted keys anti-joined away during the rewrite
    via the catalog's per-entry-scoped group reader (that is what *purges*
    the delete files); untargeted group members are read verbatim so a
    re-inserted key is never suppressed."""
    t0 = time.monotonic()
    out_dir = os.path.join(table.data_dir, event_id, f"g-{group.group_id}")
    schema = _rewrite_schema(table)
    split = table._delete_groups(list(group.files), snapshot_id)
    targeted = split is not None
    if targeted:
        clean, dgroups = split
        parts = [
            table._read_group(schema, ps, eq, pos) for ps, eq, pos in dgroups
        ]
        if clean:
            parts.append(table.spark.read.schema(schema).parquet(*clean))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
    else:
        df = table.spark.read.schema(schema).parquet(*group.files)
    df = df.withColumn(S.WRITE_PART_COL, F.col("source"))
    from circus_train_spark.meta.writers import WriteRequest, writer_for

    writer_for(out_dir).write(
        WriteRequest(
            df=df,
            dest_dir=out_dir,
            partition_cols=[S.WRITE_PART_COL],
            single_file=True,
            codec=S.TOKEN_PARQUET_CODEC,
            mode="overwrite",
        )
    )
    out_files = table._walk_parquet(out_dir)
    in_entries = [entry_by_path[p] for p in group.files]
    if (
        len(out_files) == 1
        and not targeted  # delete application changes rows: stats must be measured
        and all(e["xor_digest"] is not None for e in in_entries)
    ):
        entries = [_derive_group_entry(group, in_entries, out_files[0])]
    else:  # multi-partition group, foreign inputs, or applied deletes
        entries = table.collect_entries_for_files(out_files, zkey=True)
    return group, entries, time.monotonic() - t0


def compact(
    table: TokenTable,
    target_file_bytes: int = 512 * 1024 * 1024,
    small_file_threshold: int | None = None,
    partitions: list[str] | None = None,
    max_groups: int | None = None,
    max_concurrency: int = 8,
    verify: bool = True,
    run_id: str | None = None,
) -> CompactionResult:
    t_start = time.monotonic()
    event_id = run_id or new_event_id()
    base = table.current_snapshot()

    entries = table.manifest_entries(base.snapshot_id)
    if partitions is not None:
        keep = set(partitions)
        entries = [e for e in entries if e["partition"] in keep]
    # pending merge-on-read deletes: their target files are forced into the
    # plan (regardless of size) so this compaction physically applies and
    # purges the delete files
    del_entries = table.delete_entries(base.snapshot_id)
    delete_targets: set[str] = set()
    for de in del_entries:
        delete_targets.update(de["targets"])
    groups = plan_compaction_groups(
        entries,
        target_file_bytes,
        small_file_threshold=small_file_threshold,
        force_files=delete_targets or None,
    )
    if max_groups is not None:
        groups = groups[:max_groups]
    if not groups:
        return CompactionResult(None, 0, 0, 0, 0, 0, 0, 0, 0.0)

    if verify:
        digest_before = table.table_digest(base.snapshot_id)

    # resume: skip groups already completed by a previous (crashed) run
    done = table.lineage.completed_groups(OP)
    todo = [g for g in groups if g.group_id not in done]
    skipped = [g for g in groups if g.group_id in done]

    all_added: list[dict] = []
    removed: set[str] = set()
    for g in skipped:
        rec = done[g.group_id]
        # reuse prior outputs: recompute entries from the surviving files
        all_added.extend(table.collect_entries_for_files(rec.files_out))
        removed.update(g.files)

    entry_by_path = {e["file_path"]: e for e in entries}
    rows_total = 0
    with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
        futures = [
            pool.submit(
                _rewrite_group,
                table,
                g,
                entry_by_path,
                event_id,
                base.snapshot_id,
            )
            for g in todo
        ]
        for fut in futures:
            g, entries_out, dur = fut.result()
            all_added.extend(entries_out)
            removed.update(g.files)
            rows = sum(e["n_rows"] for e in entries_out)
            rows_total += rows
            table.lineage.append(
                LineageRecord(
                    run_id=event_id,
                    operation=OP,
                    group_id=g.group_id,
                    partition=g.partition,
                    files_in=g.files,
                    files_out=[e["file_path"] for e in entries_out],
                    rows=rows,
                    bytes_in=g.total_bytes,
                    bytes_out=sum(e["file_size"] for e in entries_out),
                    status=STATUS_DONE,
                    duration_s=dur,
                )
            )

    snap = table.commit(
        operation=OP,
        added=all_added,
        removed_paths=removed,
        summary={
            "groups": len(groups),
            "target_file_bytes": target_file_bytes,
        },
        expected_parent_id=base.snapshot_id,
        event_id=event_id,
    )

    if verify:
        digest_after = table.table_digest(snap.snapshot_id)
        if digest_after != digest_before:
            raise AssertionError(
                f"scan-equality violated by compaction: {digest_before} -> {digest_after}"
            )

    return CompactionResult(
        snapshot_id=snap.snapshot_id,
        groups_planned=len(groups),
        groups_rewritten=len(todo),
        groups_skipped=len(skipped),
        files_in=len(removed),
        files_out=len(all_added),
        bytes_in=sum(g.total_bytes for g in groups),
        rows=rows_total,
        duration_s=time.monotonic() - t_start,
    )
