"""Orphan-file cleanup + grace-period deferred deletion.

Reference semantics: replaced locations are scheduled, then deleted only
after a grace period (HousekeepingCleanupLocationManager.java:56-92,
HousekeepingRunner.java:56-75, default P3D)."""

import os
import time

from circus_train_spark.meta.catalog import TokenTable
from circus_train_spark.operators.expire import expire_snapshots
from circus_train_spark.operators.housekeeping import (
    pending_deletions,
    remove_orphan_files,
    run_housekeeping,
)


def _age(path: str, seconds: float) -> None:
    old = time.time() - seconds
    os.utime(path, (old, old))


def test_orphan_cleanup_removes_crashed_write_only(spark, tmp_path, tokens_df):
    t = TokenTable.create(spark, str(tmp_path / "tbl"))
    t.append(tokens_df.limit(500), num_files=2)

    # simulate a crashed run: data files written, no commit ever happened
    orphan_entries = t.write_data_files(
        tokens_df.limit(100), "crashed-run", num_files=1
    )
    orphan_paths = [e["file_path"] for e in orphan_entries]
    assert all(os.path.exists(p) for p in orphan_paths)

    digest_before = t.table_digest()
    # young orphans survive (a writer may still be about to commit them)
    res_young = remove_orphan_files(t, grace_period_ms=3600 * 1000)
    assert res_young.files_deleted == 0
    assert res_young.files_skipped_young >= len(orphan_paths)
    assert all(os.path.exists(p) for p in orphan_paths)

    # age the orphans past the grace period -> removed; live files survive
    for p in orphan_paths:
        _age(p, 7200)
    res = remove_orphan_files(t, grace_period_ms=3600 * 1000)
    assert res.files_deleted == len(orphan_paths)
    assert not any(os.path.exists(p) for p in orphan_paths)
    assert t.table_digest() == digest_before


def test_orphan_cleanup_keeps_pinned_snapshot_files(spark, tmp_path, tokens_df):
    from circus_train_spark.operators.compact import compact

    t = TokenTable.create(spark, str(tmp_path / "tbl2"))
    t.append(tokens_df.limit(600), num_files=4)
    pinned = t.current_snapshot().snapshot_id
    compact(t, target_file_bytes=512 * 1024 * 1024, small_file_threshold=None)
    # files of the PREVIOUS snapshot are still referenced by its descriptor
    for p in [e["file_path"] for e in t.manifest_entries(pinned)]:
        _age(p, 7200)
    res = remove_orphan_files(t, grace_period_ms=3600 * 1000)
    assert res.files_deleted == 0
    # pinned reader still scans the old snapshot byte-identically
    assert t.scan(pinned).count() == 600


def test_expire_with_grace_defers_then_housekeeping_deletes(
    spark, tmp_path, tokens_df
):
    from circus_train_spark.operators.compact import compact

    t = TokenTable.create(spark, str(tmp_path / "tbl3"))
    t.append(tokens_df.limit(600), num_files=4)
    before = [e["file_path"] for e in t.manifest_entries()]
    compact(t, target_file_bytes=512 * 1024 * 1024, small_file_threshold=None)
    live = {e["file_path"] for e in t.manifest_entries()}
    # files replaced by compaction (single-file partitions stay live)
    old_files = [p for p in before if p not in live]
    assert old_files

    res = expire_snapshots(t, keep_last=1, grace_period_ms=3600 * 1000)
    assert res.data_files_deleted > 0  # counted as expired...
    assert all(os.path.exists(p) for p in old_files)  # ...but still on disk
    queued = {e["path"] for e in pending_deletions(t)}
    assert set(old_files) <= queued

    # orphan cleanup must NOT bypass the queue's grace clock
    for p in old_files:
        _age(p, 7200)
    ro = remove_orphan_files(t, grace_period_ms=3600 * 1000)
    assert ro.files_skipped_scheduled >= len(old_files)
    assert all(os.path.exists(p) for p in old_files)

    # within grace: nothing deleted
    hk1 = run_housekeeping(t, grace_period_ms=3600 * 1000)
    assert hk1.files_deleted == 0 and hk1.files_pending >= len(old_files)
    # past grace (advance the clock): queued paths physically removed
    hk2 = run_housekeeping(
        t,
        grace_period_ms=3600 * 1000,
        now_ms=int(time.time() * 1000) + 2 * 3600 * 1000,
    )
    assert hk2.files_deleted >= len(old_files)
    assert not any(os.path.exists(p) for p in old_files)
    assert pending_deletions(t) == []
    # current snapshot unaffected
    assert t.scan().count() == 600
