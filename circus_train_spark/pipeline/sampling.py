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
