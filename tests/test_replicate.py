"""Table diff + replication (the reference's core pipeline, Spark-first)."""

import pytest
from pyspark.sql import functions as F

from circus_train_spark.meta.catalog import TokenTable
from circus_train_spark.operators.diff import (
    STATUS_CHANGED,
    STATUS_DELETED,
    STATUS_NEW,
    STATUS_UNCHANGED,
    changed_partitions,
    table_diff,
)
from circus_train_spark.operators.replicate import replicate


@pytest.fixture()
def pair(spark, tmp_path, tokens_df):
    """source table with all rows; replica missing one partition, one
    partition stale (half the rows), rest replicated verbatim."""
    src = TokenTable.create(spark, str(tmp_path / "src"))
    src.append(tokens_df, num_files=4)
    rep = TokenTable.create(spark, str(tmp_path / "rep"))
    rep_df = tokens_df.filter(F.col("source") != "wiki").filter(
        (F.col("source") != "books") | (F.xxhash64("doc_id") % 2 == 0)
    )
    rep.append(rep_df, num_files=4)
    return src, rep


def test_diff_statuses(pair):
    src, rep = pair
    d = {r["partition"]: r["status"] for r in table_diff(src, rep).collect()}
    assert d["wiki"] == STATUS_NEW
    assert d["books"] == STATUS_CHANGED
    assert d["web"] == STATUS_UNCHANGED
    assert changed_partitions(table_diff(src, rep)) == ["books", "wiki"]


def test_diff_detects_deleted(spark, tmp_path, tokens_df, pair):
    src, rep = pair
    extra = tokens_df.limit(50).withColumn("source", F.lit("ghost"))
    rep.append(extra, num_files=1)
    d = {r["partition"]: r["status"] for r in table_diff(src, rep).collect()}
    assert d["ghost"] == STATUS_DELETED


def test_incremental_replication_converges(pair):
    src, rep = pair
    res = replicate(src, rep, mode="incremental")
    assert sorted(res.partitions_replicated) == ["books", "wiki"]
    assert src.table_digest() == rep.table_digest()
    # second run: nothing to do
    res2 = replicate(src, rep, mode="incremental")
    assert res2.partitions_replicated == []
    assert res2.snapshot_id is None


def test_incremental_propagates_deletes(spark, tokens_df, pair):
    src, rep = pair
    rep.append(tokens_df.limit(50).withColumn("source", F.lit("ghost")), num_files=1)
    res = replicate(src, rep, mode="incremental", propagate_deletes=True)
    assert res.partitions_dropped == ["ghost"]
    assert src.table_digest() == rep.table_digest()


def test_full_replication_with_filter_and_limit(spark, tmp_path, tokens_df):
    src = TokenTable.create(spark, str(tmp_path / "s2"))
    src.append(tokens_df, num_files=4)
    rep = TokenTable.create(spark, str(tmp_path / "r2"))
    res = replicate(
        src,
        rep,
        mode="full",
        partition_filter="partition IN ('web', 'wiki', 'books')",
        partition_limit=2,
    )
    # newest-first ordering of ('web','wiki','books') → wiki, web
    assert sorted(res.partitions_replicated) == ["web", "wiki"]
    assert set(
        r["partition"]
        for r in rep.manifest_df().select("partition").distinct().collect()
    ) == {"web", "wiki"}
    src_sub = src.scan(partitions=["web", "wiki"])
    from circus_train_spark.functions.digest import table_digest

    assert table_digest(src_sub) == rep.table_digest()


def test_metadata_replication_copies_no_data(pair):
    src, rep = pair
    files_before = set(rep._walk_parquet(rep.data_dir))
    res = replicate(src, rep, mode="metadata")
    # no new data files materialized under the replica root
    assert set(rep._walk_parquet(rep.data_dir)) == files_before
    assert res.files_copied > 0
    # replica now SCANS the source's files for the rebound partitions
    assert src.table_digest() == rep.table_digest()


def test_replication_resume_skips_done_partitions(pair):
    src, rep = pair
    first = replicate(src, rep, mode="incremental", run_id="run-x")
    assert first.partitions_replicated == ["books", "wiki"]
    # simulate a crashed rerun of the same logical job: lineage says done
    res = replicate(src, rep, mode="full", partition_filter="partition = 'books'")
    assert res.partitions_replicated == []
    assert res.partitions_skipped == ["books"]
    assert src.table_digest() == rep.table_digest()


def test_resume_adopts_crashed_write_alongside_new_partition(pair):
    """Crash between data write and commit, with BOTH a recovered partition
    and a new one in the healing run: the adopted entries must survive into
    the commit (regression: `added` reassignment dropped them, losing the
    recovered partition's data while still removing its old files)."""
    src, rep = pair

    real_commit = rep.commit
    rep.commit = lambda **kw: (_ for _ in ()).throw(RuntimeError("injected crash"))
    try:
        replicate(src, rep, mode="full", partition_filter="partition = 'books'")
    except RuntimeError:
        pass
    finally:
        rep.commit = real_commit

    # healing run covers the crashed partition (adopted from lineage) AND a
    # genuinely new one ('wiki' is absent at the replica)
    res = replicate(src, rep, mode="incremental")
    assert "books" in res.partitions_skipped
    assert "wiki" in res.partitions_replicated
    assert src.table_digest() == rep.table_digest()
