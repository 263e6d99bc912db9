"""Schema evolution: add/remove columns, widen added columns — resolved at
scan time (reference matrix: SCHEMA_EVOLUTION.md:10-36; replica alteration:
AlterTableService.java:47-67)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from circus_train_spark.meta import schema as S
from circus_train_spark.meta.catalog import TokenTable


def _evolved(*extra_fields):
    return T.StructType(list(S.DATA_SCHEMA.fields) + list(extra_fields))


def test_add_column_scan_reconciles_and_digest_stable(spark, tmp_path, tokens_df):
    t = TokenTable.create(spark, str(tmp_path / "tbl"))
    t.append(tokens_df.limit(300), num_files=2)
    digest_before = t.table_digest()

    t.alter_schema(_evolved(T.StructField("lang", T.StringType(), True)))
    # old files: lang -> null; core digest unchanged by the metadata-only op
    df = t.scan()
    assert "lang" in df.columns
    assert df.filter(F.col("lang").isNotNull()).count() == 0
    assert t.table_digest() == digest_before

    # new appends carry the column
    newrows = tokens_df.limit(500).subtract(tokens_df.limit(300)).withColumn(
        "lang", F.lit("en")
    )
    t.append(newrows, num_files=1)
    df = t.scan()
    assert df.count() == 500
    assert df.filter(F.col("lang") == "en").count() == 200
    assert df.filter(F.col("lang").isNull()).count() == 300


def test_maintenance_carries_added_columns(spark, tmp_path, tokens_df):
    from circus_train_spark.operators.cluster import cluster
    from circus_train_spark.operators.compact import compact

    t = TokenTable.create(spark, str(tmp_path / "tbl2"))
    t.append(tokens_df.limit(200), num_files=2)
    t.alter_schema(_evolved(T.StructField("lang", T.StringType(), True)))
    t.append(
        tokens_df.limit(400).subtract(tokens_df.limit(200)).withColumn(
            "lang", F.lit("de")
        ),
        num_files=2,
    )
    compact(t, target_file_bytes=512 * 1024 * 1024, small_file_threshold=None)
    cluster(t, target_file_bytes=512 * 1024 * 1024)
    df = t.scan()
    assert df.count() == 400
    assert df.filter(F.col("lang") == "de").count() == 200
    assert df.filter(F.col("lang").isNull()).count() == 200


def test_widen_added_column_and_remove_column(spark, tmp_path, tokens_df):
    t = TokenTable.create(spark, str(tmp_path / "tbl3"))
    t.alter_schema(_evolved(T.StructField("score", T.FloatType(), True)))
    t.append(
        tokens_df.limit(100).withColumn("score", F.lit(1.5).cast("float")),
        num_files=1,
    )
    # float -> double promotion: old float files widened by the reader
    t.alter_schema(_evolved(T.StructField("score", T.DoubleType(), True)))
    df = t.scan()
    assert dict(df.dtypes)["score"] == "double"
    assert df.filter(F.col("score") == 1.5).count() == 100
    # remove the column: files still carry it, the reader prunes it
    t.alter_schema(_evolved())
    assert "score" not in t.scan().columns
    assert t.scan().count() == 100


def test_illegal_evolutions_rejected(spark, tmp_path):
    t = TokenTable.create(spark, str(tmp_path / "tbl4"))
    # dropping a core column
    with pytest.raises(ValueError, match="core column"):
        t.alter_schema(T.StructType(S.DATA_SCHEMA.fields[:-1]))
    # changing a core column's type
    bad = [
        f if f.name != "n_tok" else T.StructField("n_tok", T.LongType(), False)
        for f in S.DATA_SCHEMA.fields
    ]
    with pytest.raises(ValueError, match="core column"):
        t.alter_schema(T.StructType(bad))
    # non-nullable new column
    with pytest.raises(ValueError, match="nullable"):
        t.alter_schema(_evolved(T.StructField("x", T.IntegerType(), False)))
    # demotion on an added column
    t.alter_schema(_evolved(T.StructField("y", T.LongType(), True)))
    with pytest.raises(ValueError, match="illegal type change"):
        t.alter_schema(_evolved(T.StructField("y", T.IntegerType(), True)))


def test_schema_survives_snapshot_expiry(spark, tmp_path, tokens_df):
    from circus_train_spark.operators.expire import expire_snapshots

    t = TokenTable.create(spark, str(tmp_path / "tbl5"))
    t.alter_schema(_evolved(T.StructField("lang", T.StringType(), True)))
    for i in range(3):
        t.append(
            tokens_df.limit(50 * (i + 1))
            .subtract(tokens_df.limit(50 * i))
            .withColumn("lang", F.lit("en")),
            num_files=1,
        )
    expire_snapshots(t, keep_last=1)
    # the alter snapshot is gone; the schema was carried forward in summaries
    assert "lang" in [f.name for f in t.data_schema().fields]
    assert t.scan().filter(F.col("lang") == "en").count() == 150


def test_schema_survives_manifest_rewrite_then_expiry(spark, tmp_path, tokens_df):
    """Regression: rewrite_manifests commits outside TokenTable.commit and
    must still carry the versioned schema forward — otherwise expiring its
    ancestors strands an evolved table on the core schema."""
    from pyspark.sql import functions as F
    from circus_train_spark.operators.expire import expire_snapshots
    from circus_train_spark.operators.manifest_rewrite import rewrite_manifests

    t = TokenTable.create(spark, str(tmp_path / "tbl6"))
    t.alter_schema(_evolved(T.StructField("lang", T.StringType(), True)))
    for i in range(3):
        t.append(
            tokens_df.limit(40 * (i + 1))
            .subtract(tokens_df.limit(40 * i))
            .withColumn("lang", F.lit("fr")),
            num_files=1,
        )
    res = rewrite_manifests(t, target_manifests=1)
    assert res.snapshot_id is not None
    expire_snapshots(t, keep_last=1)
    assert "lang" in [f.name for f in t.data_schema().fields]
    assert t.scan().filter(F.col("lang") == "fr").count() == 120
