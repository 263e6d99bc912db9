"""Row-level DELETE / UPDATE by predicate (copy-on-write, three-way split).

Reference analogue: destructive replication drops replica partitions via
metadata before any data I/O (core/replica/DestructiveReplica.java:83-127).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from circus_train_spark.functions.digest import table_digest
from circus_train_spark.meta.catalog import TokenTable
from circus_train_spark.operators.delete import delete_where, update_where


@pytest.fixture()
def table(spark, tmp_path, tokens_df):
    t = TokenTable.create(spark, str(tmp_path / "tbl"))
    t.append(tokens_df, num_files=8)
    return t


def test_delete_where_matches_filter_semantics(table, tokens_df):
    pred = "n_tok > 100 AND source <> 'web'"
    expected = table_digest(tokens_df.filter(f"NOT ({pred}) OR ({pred}) IS NULL"))
    res = delete_where(table, pred)
    assert table_digest(table.scan()) == expected
    assert res.rows_deleted == tokens_df.filter(pred).count()
    assert table.current_snapshot().operation == "delete"


def test_delete_full_file_is_metadata_only(table, tokens_df):
    # files are written single-source, so a whole-source predicate drops
    # those files without any rewrite
    before = {e["file_path"] for e in table.manifest_entries()}
    res = delete_where(table, "source = 'books'")
    assert res.files_dropped > 0
    assert res.files_rewritten == 0
    after = {e["file_path"] for e in table.manifest_entries()}
    assert after < before  # strictly fewer files, none added
    assert table.scan().filter("source = 'books'").count() == 0


def test_delete_untouched_files_not_rewritten(table):
    before = {e["file_path"] for e in table.manifest_entries()}
    res = delete_where(table, "source = 'patents' AND n_tok % 2 = 0")
    after = {e["file_path"] for e in table.manifest_entries()}
    # only the patents files were touched; everything else is byte-identical
    assert before & after  # untouched files carried forward
    assert res.files_untouched > 0


def test_delete_no_match_is_noop(table):
    head = table.current_snapshot().snapshot_id
    res = delete_where(table, "n_tok < 0")
    assert res.rows_deleted == 0
    assert table.current_snapshot().snapshot_id == head  # no commit


def test_delete_manifest_range_prune(spark, tmp_path, tokens_df):
    # two appends with disjoint n_tok ranges → disjoint per-file stats; the
    # range hint keeps the low-range files out of the classify job entirely
    t = TokenTable.create(spark, str(tmp_path / "tbl2"))
    t.append(tokens_df.filter("n_tok <= 100"), num_files=2)
    t.append(tokens_df.filter("n_tok > 100"), num_files=2)
    res = delete_where(t, "n_tok > 100", n_tok_range=(101, 1 << 30))
    assert res.files_pruned >= 2
    assert t.scan().filter("n_tok > 100").count() == 0
    assert t.scan().count() == tokens_df.filter("n_tok <= 100").count()


def test_update_where(table, tokens_df):
    res = update_where(
        table, "source = 'wiki'", {"source": "'wiki_clean'"}
    )
    assert res.rows_updated == tokens_df.filter("source = 'wiki'").count()
    assert table.scan().filter("source = 'wiki'").count() == 0
    expected = table_digest(
        tokens_df.withColumn(
            "source",
            F.when(F.col("source") == "wiki", F.lit("wiki_clean")).otherwise(
                F.col("source")
            ),
        )
    )
    assert table_digest(table.scan()) == expected


def test_update_expression_references_old_row(table, tokens_df):
    update_where(table, "source = 'legal'", {"n_tok": "n_tok + 1000"})
    got = table.scan().filter("source = 'legal'").agg(F.sum("n_tok")).collect()[0][0]
    want = (
        tokens_df.filter("source = 'legal'")
        .agg(F.sum(F.col("n_tok") + 1000))
        .collect()[0][0]
    )
    assert got == want


def test_update_rejects_key_and_unknown_columns(table):
    with pytest.raises(ValueError):
        update_where(table, "true", {"doc_id": "'x'"})
    with pytest.raises(ValueError):
        update_where(table, "true", {"nope": "1"})
