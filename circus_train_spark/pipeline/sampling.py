"""Deterministic sampling / data-mixture construction.

Training corpora are built as *weighted mixtures* over sources (e.g. wiki
x2.5, web x0.3). Spark's ``df.sample`` is seed-dependent per partitioning
and not reproducible across re-layouts, so these operators sample by a
**content-keyed arithmetic hash**: a row is kept iff

    (key * 2654435761) % 10_000  <  rate * 10_000

— pure column algebra (whole-stage-codegen, zero shuffle, no RNG state),
stable under compaction/clustering/repartitioning, and cheap to reproduce
in any engine (the DuckDB oracle runs the identical arithmetic). Knuth's
multiplicative hash decorrelates the keep-set from key locality; the salt
shifts the hash so independent samples of the same table don't nest.

Scale: a pushed-down filter over a numeric column — at 100 TB this is a
scan-local predicate evaluated inside the parquet reader's codegen stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KNUTH = 2654435761
_BUCKETS = 10_000


def sample_bucket(key: Column, salt: int = 0) -> Column:
    """Deterministic bucket in [0, 10000) from a numeric key column."""
    return F.pmod((key + F.lit(salt)) * F.lit(_KNUTH), F.lit(_BUCKETS))


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: int = 0
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by content key (reproducible)."""
    keep = int(round(rate * _BUCKETS))
    return df.filter(sample_bucket(F.col(key_col), salt) < keep)


def sample_mixture(
    df: DataFrame,
    rate_by_source: dict[str, float],
    key_col: str = "doc_id",
    source_col: str = "source",
    default_rate: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Per-source mixture sampling: each source keeps its own rate.

    Rates <= 1 downsample; unlisted sources keep ``default_rate``. The
    threshold is a small CASE expression (sources are low-cardinality), so
    the whole mixture is one scan-local predicate.
    """
    thresh: Column = F.lit(int(round(default_rate * _BUCKETS)))
    for s, r in sorted(rate_by_source.items()):
        thresh = F.when(
            F.col(source_col) == s, F.lit(int(round(r * _BUCKETS)))
        ).otherwise(thresh)
    return df.filter(sample_bucket(F.col(key_col), salt) < thresh)


def temperature_rates(
    counts: dict[str, int], alpha: float = 0.5
) -> dict[str, float]:
    """Max-volume temperature mixture rates: kept rows distribute over
    sources ∝ ``n_s**alpha`` (alpha<1 flattens toward rare sources — the
    standard multilingual/multi-source rebalancing exponent), at the
    largest total volume feasible without oversampling any source.

    Solving ``k_s = C * n_s**alpha / Z`` with ``max C`` s.t. ``k_s <= n_s``
    makes the normalizer cancel::

        rate_s = (n_min / n_s) ** (1 - alpha)

    — the rarest source keeps rate 1.0 and heavier sources shed mass
    smoothly. alpha=1 is proportional (no resampling); alpha=0 equalizes
    all sources to the rarest's count.
    """
    if not counts:
        return {}
    if not (0.0 <= alpha <= 1.0):
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    import math

    n_min = min(counts.values())
    if alpha == 0.5:  # sqrt is IEEE-correctly-rounded: exact cross-engine
        return {s: math.sqrt(n_min / n) for s, n in counts.items()}
    return {s: (n_min / n) ** (1.0 - alpha) for s, n in counts.items()}


def temperature_mixture(
    df: DataFrame,
    alpha: float = 0.5,
    key_col: str = "doc_id",
    source_col: str = "source",
    salt: int = 0,
) -> DataFrame:
    """Sample ``df`` so the kept mixture follows ``n_s**alpha`` source
    weighting (see ``temperature_rates``). One tiny groupBy-count over the
    source column (map-side combined, |sources| rows to the driver) derives
    the rates; the sampling itself stays the scan-local content-keyed
    predicate — reproducible across re-layouts, zero data shuffle.
    """
    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return sample_mixture(
        df,
        temperature_rates(counts, alpha),
        key_col=key_col,
        source_col=source_col,
        salt=salt,
    )


def epoch_shuffle(
    df: DataFrame,
    seed: int,
    n_shards: int,
    id_col: str = "doc_id",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic training-order assignment for one epoch: every row
    gets a ``(shard, pos)`` — the shard it streams from and its position
    within that shard — derived purely from ``md5(id:seed)``. Reproducible
    at any parallelism, partitioning, or file layout (no RNG state, no
    ``rand()``); a new seed is a statistically independent new order.
    md5 rather than xxhash64 so any engine can replay the exact order
    (the DuckDB oracle runs the identical arithmetic).

    Scale: one scan-local hash, then exactly one shuffle — rows hash-
    partition by shard and sort by (hash, id) inside each, which is the
    minimum work any global-order materialization pays. ``n_shards``
    bounds per-reducer volume (shards ≈ bytes / shard-target), and the
    within-shard sort spills; nothing is driver-sized.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed))))
    shard = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards
    out = df.withColumn("_es_h", h).withColumn(shard_col, shard)
    w = Window.partitionBy(shard_col).orderBy("_es_h", id_col)
    return out.withColumn(
        pos_col, (F.row_number().over(w) - 1).cast("long")
    ).drop("_es_h")


def curriculum_sample(
    df: DataFrame,
    score_col: str,
    rates: list[float],
    key_col: str = "doc_id",
    salt: int = 0,
    bucket_col: str = "bucket",
    approx: bool = False,
) -> DataFrame:
    """Quality-curriculum mixture: split the corpus into ``len(rates)``
    quantile buckets of ``score_col`` (bucket 0 = lowest scores) and keep
    each bucket at its rate via the same content-keyed arithmetic hash as
    ``deterministic_sample`` — e.g. ``rates=[0.1, 0.3, 0.6, 1.0]`` skews
    the kept corpus toward high-quality documents while retaining a
    deterministic, re-layout-stable low-quality tail.

    Thresholds are the exact interpolated percentiles by default (one
    distributed sort-based aggregate; the driver receives n-1 doubles),
    bit-replicable by any engine's ``quantile_cont``. At very large scale
    pass ``approx=True`` to use ``percentile_approx`` boundaries instead —
    same downstream plan, sketch-sized aggregate, no global sort.

    Everything after the threshold aggregate is scan-local column algebra:
    bucket assignment is a CASE over literals and the keep predicate is
    the pushed-down multiplicative-hash filter. No shuffle of data rows.
    """
    n = len(rates)
    if n < 1 or not all(0.0 <= r <= 1.0 for r in rates):
        raise ValueError("rates must be fractions in [0, 1]")
    score = F.col(score_col)
    if n == 1:
        thresholds: list[float] = []
    else:
        ps = [i / n for i in range(1, n)]
        fn = F.percentile_approx if approx else F.percentile
        row = df.select(
            fn(score, F.array(*[F.lit(p) for p in ps])).alias("t")
        ).first()
        thresholds = [float(t) for t in row["t"]]
    bucket: Column = F.lit(n - 1)
    for i in range(n - 2, -1, -1):
        bucket = F.when(score <= F.lit(thresholds[i]), F.lit(i)).otherwise(bucket)
    keep_cap: Column = F.lit(int(round(rates[-1] * _BUCKETS)))
    for i in range(n - 2, -1, -1):
        keep_cap = F.when(
            score <= F.lit(thresholds[i]), F.lit(int(round(rates[i] * _BUCKETS)))
        ).otherwise(keep_cap)
    return (
        df.withColumn(bucket_col, bucket.cast("long"))
        .filter(sample_bucket(F.col(key_col), salt) < keep_cap)
    )
