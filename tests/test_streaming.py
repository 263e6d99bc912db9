"""Streaming ingest: exactly-once micro-batch appends."""

from pyspark.sql import functions as F

from circus_train_spark.meta import schema as S
from circus_train_spark.meta.catalog import TokenTable
from circus_train_spark.streaming.ingest import ingest_stream


def _start(spark, src_dir, table, ckpt):
    stream = (
        spark.readStream.schema(S.DATA_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )
    return ingest_stream(table, stream, ckpt, num_files=1)


def test_stream_ingest_exactly_once(spark, tmp_path, tokens_df):
    src_dir = str(tmp_path / "incoming")
    tokens_df.limit(1200).repartition(6).write.mode("overwrite").parquet(src_dir)
    t = TokenTable.create(spark, str(tmp_path / "tbl"))
    ckpt = str(tmp_path / "ckpt")

    q = _start(spark, src_dir, t, ckpt)
    q.awaitTermination(120)
    assert t.scan().count() == 1200
    n_snaps = len(t.log.all_snapshot_ids())
    assert n_snaps > 2  # several micro-batches → several commits

    # restart over the same checkpoint: nothing new → no duplicate rows
    q2 = _start(spark, src_dir, t, ckpt)
    q2.awaitTermination(120)
    assert t.scan().count() == 1200

    # new files arrive → only the delta is ingested
    tokens_df.limit(1500).subtract(tokens_df.limit(1200)).write.mode("append").parquet(
        src_dir
    )
    q3 = _start(spark, src_dir, t, ckpt)
    q3.awaitTermination(120)
    assert t.scan().count() == 1500
    assert t.scan().select("doc_id").distinct().count() == 1500


def test_stream_ingest_atomic_marker_survives_lineage_crash(spark, tmp_path, tokens_df):
    """Exactly-once has no commit→marker window: the batch id lives in the
    snapshot summary (same atomic commit as the data). A crash after commit
    but before the lineage append must NOT replay the batch on restart."""
    src_dir = str(tmp_path / "incoming2")
    tokens_df.limit(1200).repartition(6).write.mode("overwrite").parquet(src_dir)
    t = TokenTable.create(spark, str(tmp_path / "tbl2"))
    ckpt = str(tmp_path / "ckpt2")

    real_append = t.lineage.append

    def crash_after_commit(rec):
        raise RuntimeError("injected crash between commit and lineage append")

    t.lineage.append = crash_after_commit
    q = _start(spark, src_dir, t, ckpt)
    try:
        q.awaitTermination(120)
    except Exception:
        pass
    finally:
        t.lineage.append = real_append
    # the first batch committed a snapshot but recorded no lineage
    assert len(t.log.all_snapshot_ids()) >= 2
    assert not t.lineage.records("stream_ingest")

    q2 = _start(spark, src_dir, t, ckpt)
    q2.awaitTermination(120)
    assert t.scan().count() == 1200
    assert t.scan().select("doc_id").distinct().count() == 1200


def test_stream_ingest_survives_schema_evolution(spark, tmp_path, tokens_df):
    """A running stream's source schema is fixed at start; an alter_schema
    adding a column must not fail subsequent micro-batches — missing evolved
    columns are null-filled with their declared type (ADVICE r2)."""
    from pyspark.sql import types as T

    src_dir = str(tmp_path / "incoming3")
    tokens_df.limit(600).repartition(3).write.mode("overwrite").parquet(src_dir)
    t = TokenTable.create(spark, str(tmp_path / "tbl3"))
    # evolve BEFORE the batches land: the stream reads the old (core) schema
    t.alter_schema(
        T.StructType(
            list(S.DATA_SCHEMA.fields) + [T.StructField("lang", T.StringType(), True)]
        )
    )
    q = _start(spark, src_dir, t, str(tmp_path / "ckpt3"))
    q.awaitTermination(120)
    out = t.scan()
    assert out.count() == 600
    assert "lang" in out.columns
    assert out.filter(out.lang.isNotNull()).count() == 0


def test_stream_ingest_dedup_within_watermark(spark, tmp_path, tokens_df):
    """At-least-once upstream: the same doc_ids delivered again in LATER
    files (new micro-batches, so the exactly-once batch marker cannot
    catch them) must be suppressed by dropDuplicatesWithinWatermark
    state."""
    src_dir = str(tmp_path / "incoming_dup")
    first = tokens_df.limit(400)
    first.coalesce(2).write.mode("overwrite").parquet(src_dir)
    # redeliver 300 of the same rows plus 100 new ones, as separate files
    dup = first.limit(300)
    fresh = tokens_df.limit(500).subtract(first)
    dup.unionByName(fresh).coalesce(2).write.mode("append").parquet(src_dir)

    t = TokenTable.create(spark, str(tmp_path / "tbl_dup"))
    stream = (
        spark.readStream.schema(S.DATA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = ingest_stream(
        t, stream, str(tmp_path / "ckpt_dup"), num_files=1, dedup_keys=("doc_id",)
    )
    q.awaitTermination(120)
    assert t.scan().count() == 500
    assert t.scan().select("doc_id").distinct().count() == 500


def test_stream_upsert_replaces_and_inserts(spark, tmp_path, tokens_df):
    """mode='upsert': later micro-batches REPLACE matching doc_ids via
    MERGE INTO, with the exactly-once marker in the same commit."""
    src = str(tmp_path / "incoming_up")
    wave1 = tokens_df.limit(300)
    wave1.coalesce(2).write.mode("overwrite").parquet(src)

    t = TokenTable.create(spark, str(tmp_path / "tbl_up"))

    def _stream():
        return (
            spark.readStream.schema(S.DATA_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    ckpt = str(tmp_path / "ckpt_up")
    q = ingest_stream(t, _stream(), ckpt, mode="upsert")
    q.awaitTermination(120)
    assert t.scan().count() == 300

    # wave 2: replace 100 rows with mutated content + 50 brand-new ids
    replaced = (
        wave1.limit(100)
        .withColumn("source", F.lit("upd"))
        .withColumn("tokens", F.expr("transform(tokens, x -> x + 1)"))
    )
    fresh = tokens_df.limit(350).subtract(wave1).limit(50)
    replaced.unionByName(fresh).coalesce(1).write.mode("append").parquet(src)
    q2 = ingest_stream(t, _stream(), ckpt, mode="upsert")
    q2.awaitTermination(120)

    out = t.scan()
    assert out.count() == 350
    assert out.select("doc_id").distinct().count() == 350
    assert out.filter(F.col("source") == "upd").count() == 100

    # replay with no new files: no new snapshot, content unchanged
    before = t.current_snapshot().snapshot_id
    q3 = ingest_stream(t, _stream(), ckpt, mode="upsert")
    q3.awaitTermination(120)
    assert t.current_snapshot().snapshot_id == before
