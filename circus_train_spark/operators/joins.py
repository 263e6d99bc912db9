"""As-of and range (interval) joins — temporal joins Spark's optimizer
would otherwise plan as theta joins.

``asof_join`` matches each left row to the nearest right row at-or-before
(backward) or at-or-after (forward) its timestamp, per key, optionally
within a tolerance. Implementation is the tagged-union trick: both sides
union into one stream keyed by (key, ts, side) and a single running
``last(payload, ignorenulls=True)`` window carries the most recent right
payload onto each left row. That is ONE shuffle on the key and a linear
per-partition scan — no join node at all, so no theta-join blowup and no
per-key sort beyond the window's. At 100 TB the shuffle carries the left
rows plus a struct of the requested right columns; skewed keys behave
like any window (one key = one task's linear scan).

``range_join`` matches left rows to right intervals containing them
(``start <= ts <= end``, per key). Naive Spark plans this as
BroadcastNestedLoop/cartesian; here each interval explodes to the
fixed-width time buckets it covers and the join becomes an equi-join on
(key, bucket) with an exact containment filter. Each (left row, interval)
match is produced exactly once — a left row has one bucket, and an
interval appears once per bucket — so no post-dedup. Bucket width trades
explode fan-out (long intervals) against bucket population (short
buckets); size it near the median interval length.

Reference analogue: none — circus-train has no temporal joins; SURVEY
§2.3 notes theta/range/as-of joins must be built Spark-natively.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    ts_col: str = "ts",
    right_ts_col: str | None = None,
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row, plus the matched right row's
    ``value_cols`` (renamed ``<col><suffix>``) and its timestamp
    (``<right_ts_col><suffix>``); nulls when no right row qualifies.

    Matching is inclusive (a right row AT the left timestamp matches in
    both directions). The right side must be unique per ``(on, ts)`` —
    with duplicates the carried payload is whichever the shuffle ordered
    last; pre-aggregate to make it deterministic.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    rts = right_ts_col or ts_col
    value_cols = [c for c in (value_cols or right.columns) if c not in (*on, rts)]

    payload = F.struct(
        F.col(rts).alias("__rts"), *[F.col(c) for c in value_cols]
    )
    r_tag = right.select(
        *on,
        F.unix_micros(F.col(rts).cast("timestamp")).alias("__t"),
        payload.alias("__p"),
        F.lit(0).alias("__side"),
    )
    p_type = r_tag.schema["__p"].dataType
    l_tag = left.withColumn(
        "__t", F.unix_micros(F.col(ts_col).cast("timestamp"))
    ).withColumn("__p", F.lit(None).cast(p_type)).withColumn("__side", F.lit(1))

    both = l_tag.unionByName(r_tag, allowMissingColumns=True)
    order = [F.col("__t"), F.col("__side")]
    if direction == "forward":
        order = [F.col("__t").desc(), F.col("__side")]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = both.withColumn("__m", F.last("__p", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )

    m_ts = F.unix_micros(F.col("__m.__rts").cast("timestamp"))
    in_reach: Column = F.col("__m").isNotNull()
    if tolerance_us is not None:
        gap = (F.col("__t") - m_ts) if direction == "backward" else (m_ts - F.col("__t"))
        in_reach = in_reach & (gap <= F.lit(tolerance_us))

    out_cols = [matched[c] for c in left.columns]
    out_cols.append(
        F.when(in_reach, F.col("__m.__rts")).alias(f"{rts}{suffix}")
    )
    for c in value_cols:
        out_cols.append(F.when(in_reach, F.col(f"__m.{c}")).alias(f"{c}{suffix}"))
    return matched.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_us: int = 3_600_000_000,
    how: str = "inner",
) -> DataFrame:
    """Join left rows to right intervals with
    ``start_col <= ts_col <= end_col`` per key, as a bucketed equi-join.

    ``how`` is ``inner`` or ``left`` (unmatched left rows kept with null
    right columns — implemented as the inner form plus an anti-joined
    remainder so the hot path stays an equi-join).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    b = int(bucket_us)
    r2 = (
        right.withColumn("__s_us", F.unix_micros(F.col(start_col).cast("timestamp")))
        .withColumn("__e_us", F.unix_micros(F.col(end_col).cast("timestamp")))
        .withColumn(
            "__b", F.explode(F.expr(f"sequence(__s_us div {b}, __e_us div {b})"))
        )
    )
    l2 = left.withColumn(
        "__us", F.unix_micros(F.col(ts_col).cast("timestamp"))
    ).withColumn("__b", F.expr(f"__us div {b}"))
    joined = l2.join(r2, [*on, "__b"], "inner").filter(
        (F.col("__us") >= F.col("__s_us")) & (F.col("__us") <= F.col("__e_us"))
    )
    right_out = [c for c in right.columns if c not in on]
    inner = joined.select(*[l2[c] for c in left.columns], *[r2[c] for c in right_out])
    if how == "inner":
        return inner
    missed = left.join(
        inner.select(*left.columns).distinct(), list(left.columns), "left_anti"
    )
    for c, f in zip(right_out, [f.dataType for f in right.schema if f.name in right_out]):
        missed = missed.withColumn(c, F.lit(None).cast(f))
    return inner.unionByName(missed)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-defeating equi-join: identical results to ``left.join(right,
    on, how)`` but a hot key's left rows spread over ``n_salts`` reducer
    partitions instead of one straggler task.

    The left (large/skewed) side gets a deterministic salt — a hash of the
    whole row mod ``n_salts`` — and the right side replicates once per
    salt, so every left row still meets every matching right row exactly
    once, on the (key..., salt) composite. Costs ``n_salts``x the RIGHT
    side's shuffle bytes; use when the right side is too big to broadcast
    but far smaller than the skewed left (the classic web-corpus shape:
    per-domain docs joined to per-domain metadata with a megasite domain).
    AQE's skew-join handles sort-merge stragglers after the fact; salting
    fixes the partition layout by construction and also covers the
    groupBy-style shapes AQE's splitter cannot touch.

    ``how``: ``inner`` or ``left`` (both preserve multiplicity; the salt
    never changes match cardinality because it is a function of the left
    row and merely partitions each key's stream).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if not (1 <= n_salts <= 4096):
        raise ValueError(f"n_salts out of range: {n_salts}")
    on = list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l2 = left.withColumn("__salt", salt.cast("long"))
    r2 = right.withColumn(
        "__salt", F.explode(F.expr(f"sequence(0, {n_salts - 1})"))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    return l2.join(r2, [*on, "__salt"], how).drop("__salt")
