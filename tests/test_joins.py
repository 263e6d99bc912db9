"""As-of and range joins: semantics, directions, tolerance, plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from circus_train_spark.operators.joins import asof_join, range_join

T0 = dt.datetime(2024, 5, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _df(spark, cols, rows):
    fields = {
        "k": T.LongType(),
        "ts": T.TimestampType(),
        "start": T.TimestampType(),
        "end": T.TimestampType(),
        "v": T.DoubleType(),
        "tag": T.StringType(),
    }
    return spark.createDataFrame(
        rows, T.StructType([T.StructField(c, fields[c]) for c in cols])
    )


def test_asof_backward_basic(spark):
    left = _df(spark, ["k", "ts"], [(1, _ts(5)), (1, _ts(10)), (1, _ts(2)), (2, _ts(5))])
    right = _df(
        spark,
        ["k", "ts", "v"],
        [(1, _ts(3), 30.0), (1, _ts(10), 100.0), (3, _ts(0), 9.0)],
    )
    out = asof_join(left, right, on=["k"], value_cols=["v"])
    got = {(r.k, r.ts.minute): (r.v_r, r.ts_r.minute if r.ts_r else None) for r in out.collect()}
    assert got == {
        (1, 5): (30.0, 3),  # nearest at-or-before
        (1, 10): (100.0, 10),  # tie is inclusive
        (1, 2): (None, None),  # nothing before
        (2, 5): (None, None),  # key absent on right
    }
    assert out.count() == 4  # exactly one output row per left row


def test_asof_forward_and_tolerance(spark):
    left = _df(spark, ["k", "ts"], [(1, _ts(5)), (1, _ts(50))])
    right = _df(spark, ["k", "ts", "v"], [(1, _ts(8), 1.0), (1, _ts(120), 2.0)])
    fwd = asof_join(left, right, on=["k"], value_cols=["v"], direction="forward")
    got = {r.ts.minute: r.v_r for r in fwd.collect()}
    assert got == {5: 1.0, 50: 2.0}

    tol = asof_join(
        left,
        right,
        on=["k"],
        value_cols=["v"],
        direction="forward",
        tolerance_us=10 * 60 * 1_000_000,
    )
    got = {r.ts.minute: r.v_r for r in tol.collect()}
    assert got == {5: 1.0, 50: None}  # 70-min gap exceeds 10-min tolerance


def test_asof_plan_has_no_join_node(spark):
    left = _df(spark, ["k", "ts"], [(1, _ts(5))])
    right = _df(spark, ["k", "ts", "v"], [(1, _ts(3), 1.0)])
    plan = asof_join(left, right, on=["k"], value_cols=["v"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # tagged union + window, not a join
    assert "CartesianProduct" not in plan


def test_range_join_inner_and_multimatch(spark):
    events = _df(spark, ["k", "ts"], [(1, _ts(10)), (1, _ts(300)), (2, _ts(10))])
    ivals = _df(
        spark,
        ["k", "start", "end", "tag"],
        [
            (1, _ts(0), _ts(30), "a"),  # contains ts=10
            (1, _ts(5), _ts(15), "b"),  # overlaps: ts=10 matches BOTH
            (1, _ts(100), _ts(500), "c"),  # long interval spans many buckets
            (2, _ts(20), _ts(30), "d"),  # misses k=2's event
        ],
    )
    out = range_join(
        events,
        ivals,
        on=["k"],
        start_col="start",
        end_col="end",
        bucket_us=10 * 60 * 1_000_000,  # 10-min buckets
    )
    got = sorted((r.k, r.ts.minute + 60 * r.ts.hour, r.tag) for r in out.collect())
    assert got == [(1, 10, "a"), (1, 10, "b"), (1, 300, "c")]


def test_range_join_left_keeps_unmatched(spark):
    events = _df(spark, ["k", "ts"], [(1, _ts(10)), (2, _ts(10))])
    ivals = _df(spark, ["k", "start", "end", "tag"], [(1, _ts(0), _ts(30), "a")])
    out = range_join(
        events, ivals, on=["k"], start_col="start", end_col="end", how="left"
    )
    got = {r.k: r.tag for r in out.collect()}
    assert got == {1: "a", 2: None}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_range_join_boundary_inclusive(spark):
    events = _df(spark, ["k", "ts"], [(1, _ts(0)), (1, _ts(30))])
    ivals = _df(spark, ["k", "start", "end", "tag"], [(1, _ts(0), _ts(30), "a")])
    out = range_join(events, ivals, on=["k"], start_col="start", end_col="end")
    assert out.count() == 2  # both boundary events inside


def test_salted_join_equals_plain_join(spark):
    from circus_train_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "d"), (3, "e")], "k long, lv string"
    )
    right = spark.createDataFrame(
        [(1, "X"), (1, "Y"), (2, "Z")], "k long, rv string"
    )
    got = sorted(
        tuple(r) for r in salted_join(left, right, on=["k"], n_salts=4).collect()
    )
    want = sorted(tuple(r) for r in left.join(right, ["k"], "inner").collect())
    assert got == want  # multiplicity preserved: 1 matches X and Y per left row

    got_l = sorted(
        tuple(r)
        for r in salted_join(left, right, on=["k"], n_salts=4, how="left").collect()
    )
    want_l = sorted(tuple(r) for r in left.join(right, ["k"], "left").collect())
    assert got_l == want_l  # k=3 survives with null rv


def test_salted_join_spreads_hot_key(spark):
    from pyspark.sql import functions as F

    from circus_train_spark.operators.joins import salted_join

    hot = spark.range(0, 1000).select(
        F.lit(7).alias("k"), F.col("id").alias("lv")
    )
    right = spark.createDataFrame([(7, "hot")], "k long, rv string")
    j = salted_join(hot, right, on=["k"], n_salts=8)
    assert j.count() == 1000
    # the salt column is internal only
    assert "__salt" not in j.columns
