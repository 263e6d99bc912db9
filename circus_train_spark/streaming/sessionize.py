"""Gap-based sessionization: batch (window algebra) and streaming
(``applyInPandasWithState``) with identical session semantics.

A *session* is a maximal run of a key's events in which consecutive
event-time gaps never exceed ``gap``. The batch form is pure Catalyst —
a ``lag`` window to mark session starts and a running ``sum`` to number
them, then a hash aggregate — so it is SQL-replayable (the driver's
DuckDB oracle runs the same window query). The streaming form keeps one
open session per key in Structured Streaming state, closes sessions
in-stream the moment a gap is observed, and uses an **event-time
timeout** to flush a session once the watermark passes its end + gap —
the standard custom-stateful-operator pattern Spark's built-in windows
cannot express (session windows keyed by *data-driven* gaps with
arbitrary per-session payload).

Scale notes (batch): one shuffle on the session key; the window is a
linear scan per key partition (no global sort). Per-key event counts
bound partition work; the follow-up aggregate reuses the same
partitioning so Catalyst collapses it into the window stage's exchange.
Scale notes (streaming): state is O(open sessions) = O(distinct live
keys), eight longs per key; the watermark evicts idle keys via timeout,
so state does not grow with stream length. Events cross the wire once,
partitioned by key.

Reference analogue: none — circus-train is batch replication; this
extends the engine's streaming surface (SURVEY §2.9) with the
``applyInPandasWithState`` custom-operator pattern.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sessionize_batch(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_minutes: int = 30,
    value_expr=None,
) -> DataFrame:
    """Batch sessionization: ``(key, session_start, session_end, n_events,
    value_sum)`` — one row per session.

    Session numbering is order-insensitive for tied timestamps (a zero
    gap never starts a session), so no tiebreak column is needed and the
    result is deterministic under any shuffle layout.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    value = value_expr if value_expr is not None else F.lit(0).cast("long")
    w = Window.partitionBy(key_col).orderBy(ts_col)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(ts_us).over(w)
    is_new = F.when(
        prev_us.isNull() | (ts_us - prev_us > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    numbered = events.withColumn(
        "_sess", F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("_v", value)
    return (
        numbered.groupBy(key_col, "_sess")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_v").alias("value_sum"),
        )
        .drop("_sess")
    )


_OUT_FIELDS = [
    ("session_start", T.TimestampType()),
    ("session_end", T.TimestampType()),
    ("n_events", T.LongType()),
    ("value_sum", T.DoubleType()),
]

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("vsum", T.DoubleType()),
    ]
)


def _session_fn(gap_us: int, key_col: str):
    """Build the per-key stateful function.

    State = the one open session ``(start_us, last_us, n, vsum)``. Events
    inside a micro-batch are sorted by event time; a gap > ``gap_us``
    closes the open session (emitted immediately) and opens a new one.
    The surviving open session arms an event-time timeout at
    ``last + gap`` so the watermark flushes it once no extension can
    arrive. Late events older than the open session's last timestamp
    merely extend it (never reorder history) — lateness beyond the
    watermark is dropped by the engine before reaching here.
    """

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state,  # pyspark.sql.streaming.state.GroupState
    ) -> Iterator[pd.DataFrame]:
        def emit(sess):
            start_us, last_us, n, vsum = sess
            return pd.DataFrame(
                {
                    key_col: [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "value_sum": [vsum],
                }
            )

        if state.hasTimedOut:
            if state.exists:
                sess = tuple(state.get)
                state.remove()
                yield emit(sess)
            return

        rows = [p for p in pdfs if len(p)]
        if not rows:
            return
        batch = pd.concat(rows, ignore_index=True).sort_values("ts")
        ts_us = pd.Series(
            batch["ts"].values.astype("datetime64[us]").astype("int64")
        )
        vals = batch["_v"].astype("float64")

        open_sess = list(state.get) if state.exists else None
        for t_us, v in zip(ts_us.tolist(), vals.tolist()):
            if open_sess is None:
                open_sess = [t_us, t_us, 1, v]
            elif t_us - open_sess[1] > gap_us:
                yield emit(tuple(open_sess))
                open_sess = [t_us, t_us, 1, v]
            else:
                open_sess[1] = max(open_sess[1], t_us)
                open_sess[2] += 1
                open_sess[3] += v
        state.update(tuple(open_sess))
        # Flush when the watermark proves no extension can arrive. The
        # timeout must sit strictly beyond the current watermark or the
        # engine rejects it.
        timeout_ms = open_sess[1] // 1000 + gap_us // 1000 + 1
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(timeout_ms, wm + 1))

    return fn


def sessionize_stream(
    spark: SparkSession,
    src_dir: str,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_minutes: int = 30,
    value_expr=None,
    watermark_delay: str = "2 hours",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain ``src_dir`` as a file stream through stateful sessionization;
    return the table of sessions CLOSED in-stream (a gap observed, or the
    watermark timed the session out). Sessions still open at end-of-stream
    remain unemitted — by construction they could still be extended.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    batch_schema = spark.read.parquet(src_dir).schema
    reader = spark.readStream.schema(batch_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(src_dir):
        link_dir = tempfile.mkdtemp(prefix="cts-sess-src-")
        os.symlink(
            os.path.abspath(src_dir), os.path.join(link_dir, os.path.basename(src_dir))
        )
        src_dir = link_dir
    stream = reader.parquet(src_dir)

    value = value_expr if value_expr is not None else F.lit(0).cast("double")
    key_type = dict(zip(batch_schema.names, [f.dataType for f in batch_schema]))[
        key_col
    ]
    out_schema = T.StructType(
        [T.StructField(key_col, key_type)]
        + [T.StructField(n, t) for n, t in _OUT_FIELDS]
    )
    stream = (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withColumn("_v", value.cast("double"))
        .withWatermark(ts_col, watermark_delay)
        .select(key_col, ts_col, "_v")
    )
    sessions = stream.groupBy(key_col).applyInPandasWithState(
        _session_fn(gap_minutes * 60 * 1_000_000, key_col),
        out_schema,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )

    sink_name = "sessions_" + uuid.uuid4().hex[:12]
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="cts-sess-ckpt-")
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink_name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_name)
