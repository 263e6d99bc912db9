"""Gap sessionization: batch window algebra vs applyInPandasWithState.

The streaming sessionizer holds one open session per key in state,
closes a session in-stream when a gap is observed, and flushes via
event-time timeout once the watermark passes session_end + gap. Parity
harness: every user's real events are followed by a far-future "flush"
event (> gap + watermark delay after everything real), so the watermark
of the final (no-data) micro-batch is guaranteed to time out every real
session; the flush events' own sessions stay open and are never
emitted. Streaming closed-sessions == batch sessions over real events.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from circus_train_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)

T0 = dt.datetime(2024, 3, 1, 8, 0, 0)


def _mk_events(spark, rows):
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(minutes=m), v) for u, m, v in rows], schema
    )


EVENTS = [
    # user 1: two sessions — gap of 45 min splits (gap_minutes=30)
    (1, 0, 1.0),
    (1, 10, 2.0),
    (1, 20, 3.0),
    (1, 65, 4.0),
    (1, 70, 5.0),
    # user 2: one session, events exactly 30 min apart (gap is NOT >30)
    (2, 0, 10.0),
    (2, 30, 10.0),
    (2, 60, 10.0),
    # user 3: three single-event sessions
    (3, 0, 7.0),
    (3, 100, 7.0),
    (3, 200, 7.0),
]


def test_sessionize_batch_sessions(spark):
    out = sessionize_batch(
        _mk_events(spark, EVENTS), gap_minutes=30, value_expr=F.col("value")
    )
    rows = {
        (r.user_id, r.session_start.minute + 60 * r.session_start.hour): r
        for r in out.collect()
    }
    assert len(rows) == 6
    s1a = rows[(1, 8 * 60)]
    assert (s1a.n_events, s1a.value_sum) == (3, 6.0)
    assert s1a.session_end == T0 + dt.timedelta(minutes=20)
    s1b = rows[(1, 9 * 60 + 5)]
    assert (s1b.n_events, s1b.value_sum) == (2, 9.0)
    s2 = rows[(2, 8 * 60)]
    assert (s2.n_events, s2.value_sum) == (3, 30.0)
    assert s2.session_end == T0 + dt.timedelta(minutes=60)
    assert all(rows[(3, m)].n_events == 1 for m in (8 * 60, 9 * 60 + 40, 11 * 60 + 20))


def test_sessionize_stream_matches_batch(spark, tmp_path):
    real = _mk_events(spark, EVENTS)
    # flush sentinels: far enough out that watermark (max_ts - delay)
    # exceeds every real session_end + gap
    flush = _mk_events(spark, [(u, 4000, 0.0) for u in (1, 2, 3)])
    src = str(tmp_path / "sess_src")
    real.unionByName(flush).repartition(3).write.parquet(src)

    got = sessionize_stream(
        spark,
        src,
        gap_minutes=30,
        value_expr=F.col("value"),
        watermark_delay="10 minutes",
        checkpoint_dir=str(tmp_path / "sess_ckpt"),
    )
    want = sessionize_batch(real, gap_minutes=30, value_expr=F.col("value"))
    to_set = lambda df: {
        (r.user_id, r.session_start, r.session_end, r.n_events, float(r.value_sum))
        for r in df.collect()
    }
    assert to_set(got) == to_set(want)
    assert len(to_set(got)) == 6  # flush sessions stay open → never emitted


def test_sessionize_stream_multi_batch_state_carryover(spark, tmp_path):
    """A session spanning micro-batches must be stitched by state, not
    emitted per-batch: drain one file per trigger, files arriving in time
    order (the operator's contract is watermark-bounded disorder — a file
    stream delivers oldest-modification first, so sequential writes give a
    deterministic time-ordered arrival)."""
    import time

    src = str(tmp_path / "sess_src_mb")
    real = _mk_events(spark, EVENTS)
    windows = [
        [r for r in EVENTS if r[1] <= 30],
        [r for r in EVENTS if 30 < r[1] <= 100],
        [r for r in EVENTS if 100 < r[1]],
        [(u, 4000, 0.0) for u in (1, 2, 3)],  # flush sentinels, last file
    ]
    for chunk in windows:
        _mk_events(spark, chunk).coalesce(1).write.mode("append").parquet(src)
        time.sleep(0.05)  # distinct mtimes → deterministic file order

    got = sessionize_stream(
        spark,
        src,
        gap_minutes=30,
        value_expr=F.col("value"),
        watermark_delay="10 minutes",
        checkpoint_dir=str(tmp_path / "sess_ckpt_mb"),
        max_files_per_trigger=1,
    )
    want = sessionize_batch(real, gap_minutes=30, value_expr=F.col("value"))
    to_set = lambda df: {
        (r.user_id, r.session_start, r.session_end, r.n_events, float(r.value_sum))
        for r in df.collect()
    }
    assert to_set(got) == to_set(want)
