"""Watermarked windowed aggregation over a file stream.

Structured-Streaming counterpart of the batch hourly rollup: files under a
directory are treated as an unbounded arriving stream
(``spark.readStream``), aggregated into event-time windows with a
watermark bounding the state the engine retains for late data, and sunk
incrementally. With ``availableNow`` the same query drains everything
currently on disk and stops — which is how the batch oracle can verify
the streaming path end-to-end (the final complete-mode table must equal
the batch groupBy).

Scale notes: windowed aggregation state is partitioned by (window, keys)
across executors; the watermark evicts windows older than
``watermark_delay`` so state is O(active windows), not O(stream length).
Per micro-batch work is the same hash-aggregate Catalyst plan as the
batch query.

Reference analogue: none — circus-train is batch replication; this is
part of the engine's streaming surface (SURVEY §2.9).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_counts_stream(
    spark: SparkSession,
    src_dir: str,
    *,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_expr=None,
    window: str = "1 hour",
    slide: str | None = None,
    watermark_delay: str = "2 hours",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain ``src_dir`` as a file stream; return the final windowed counts.

    Runs a complete-mode memory-sink query with ``availableNow`` (drain
    and stop). Returns a DataFrame of
    ``(*key_cols, window_start, n, value_sum)``.

    ``slide`` switches to sliding (overlapping) windows: each event lands
    in ``window/slide`` windows, so state grows by that factor — the
    watermark still bounds it to the active horizon. ``slide=None`` is
    tumbling (each event in exactly one window).
    """
    batch_schema = spark.read.parquet(src_dir).schema
    reader = spark.readStream.schema(batch_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(src_dir):
        # FileStreamSource only accepts a directory base. For a
        # single-file parquet table, expose the file through a fresh
        # directory of symlinks (metadata-only, no data copy).
        link_dir = tempfile.mkdtemp(prefix="cts-stream-src-")
        os.symlink(os.path.abspath(src_dir), os.path.join(link_dir, os.path.basename(src_dir)))
        src_dir = link_dir
    stream = reader.parquet(src_dir)

    value = value_expr if value_expr is not None else F.lit(0).cast("long")
    # Watermarks require a zoned TIMESTAMP; parquet files written with
    # TIMESTAMP_NTZ (the testdata tables) carry the same wall-clock under
    # the engine's fixed UTC session timezone, so the cast is lossless.
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    agg = (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(
            *key_cols,
            (
                F.window(ts_col, window, slide)
                if slide
                else F.window(ts_col, window)
            ).alias("_w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value).alias("value_sum"),
        )
        .select(
            *key_cols,
            F.col("_w.start").alias("window_start"),
            "n",
            "value_sum",
        )
    )

    sink_name = "windowed_" + uuid.uuid4().hex[:12]
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="cts-stream-ckpt-")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink_name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_name)
