"""Deterministic synthetic token-table generator (distributed, seed-stable).

Generates the FIXTURES.md §1 table entirely with JVM-side expressions over
``spark.range`` — no Python row loop, no driver-side data — so the same
(seed, n_rows) pair yields identical rows at any parallelism, which is what
the scan-equality oracle and the two-cluster-size bench require.

Shape (per FIXTURES.md):
- ``doc_id``   : unique, ``doc-<016x>``
- ``tokens``   : array<int32>, element count == n_tok, values in [0, 50257)
- ``n_tok``    : skewed small, in [8, 4096] (log-normal-ish via hash mixing)
- ``source``   : ~10 values, heavy skew (one value ~50% of rows) to exercise
  salting / AQE skew handling

Reference analogue: the integration fixtures with skewed multi-level
partitions (``circus-train-integration-tests/.../IntegrationTestHelper.java:
72-94``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = 50257
SOURCES = [
    "web",  # hot partition: ~50% of rows
    "books",
    "wiki",
    "code",
    "news",
    "forums",
    "papers",
    "social",
    "legal",
    "patents",
]
# cumulative percent thresholds over pmod(h,100): web 50, books 15, wiki 10,
# code 8, news 6, forums 4, papers 3, social 2, legal 1, patents 1
_CUM = [50, 65, 75, 83, 89, 93, 96, 98, 99, 100]


def _source_expr(bucket):
    expr = F.lit(SOURCES[-1])
    for name, hi in reversed(list(zip(SOURCES[:-1], _CUM[:-1]))):
        expr = F.when(bucket < hi, F.lit(name)).otherwise(expr)
    return expr


def generate_tokens(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    partitions: int | None = None,
    min_tok: int = 8,
    max_tok: int = 4096,
) -> DataFrame:
    """Deterministic token DataFrame; safe to regenerate on any cluster size."""
    rng = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    h = F.xxhash64(F.col("id"), F.lit(seed))
    h2 = F.xxhash64(F.col("id"), F.lit(seed + 1))
    # log-normal-ish length: product of two small uniform factors, clipped
    len_expr = (
        F.lit(min_tok)
        + (F.pmod(h, F.lit(64)) * F.pmod(h2, F.lit(64))).cast("int")
    )
    n_tok = F.least(F.lit(max_tok), len_expr).cast("int")
    df = (
        rng.withColumn("doc_id", F.format_string("doc-%016x", F.col("id")))
        .withColumn("n_tok", n_tok)
        .withColumn("source", _source_expr(F.pmod(h, F.lit(100))))
        .withColumn(
            "tokens",
            F.transform(
                F.sequence(F.lit(0), F.col("n_tok") - 1),
                lambda i: F.pmod(F.xxhash64(F.col("id"), i, F.lit(seed)), F.lit(VOCAB)).cast(
                    "int"
                ),
            ),
        )
        .select("doc_id", "tokens", "n_tok", "source")
    )
    return df


def generate_changes(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    frac_update: float = 0.004,
    frac_delete: float = 0.003,
    frac_insert: float = 0.003,
) -> DataFrame:
    """Deterministic MERGE INTO change-set against ``generate_tokens`` output:
    updates + deletes reference existing doc_ids; inserts use fresh ids.
    Schema: data columns + ``_op`` in {upsert, delete} (tokens/n_tok/source
    are NULL for deletes)."""
    n_upd = max(1, int(n_rows * frac_update))
    n_del = max(1, int(n_rows * frac_delete))
    n_ins = max(1, int(n_rows * frac_insert))

    # updates: every k-th row, regenerated with a different seed (new tokens)
    stride_u = max(1, n_rows // n_upd)
    upd_ids = spark.range(0, n_rows, stride_u).withColumnRenamed("id", "rid")
    upd = (
        _regen_for_ids(upd_ids, seed=seed + 1000)
        .withColumn("_op", F.lit("upsert"))
    )
    # deletes: every k-th row offset by 1, excluding update ids (a key must
    # appear at most once in a change set — MERGE rejects ambiguous inputs)
    stride_d = max(1, n_rows // n_del)
    del_ids = (
        spark.range(1, n_rows, stride_d)
        .filter(F.col("id") % stride_u != 0)
        .withColumnRenamed("id", "rid")
    )
    dele = del_ids.select(
        F.format_string("doc-%016x", F.col("rid")).alias("doc_id"),
        F.lit(None).cast("array<int>").alias("tokens"),
        F.lit(None).cast("int").alias("n_tok"),
        F.lit(None).cast("string").alias("source"),
        F.lit("delete").alias("_op"),
    )
    # inserts: ids beyond the existing range
    ins_ids = spark.range(n_rows, n_rows + n_ins).withColumnRenamed("id", "rid")
    ins = _regen_for_ids(ins_ids, seed=seed).withColumn("_op", F.lit("upsert"))
    return upd.unionByName(dele).unionByName(ins)


def _regen_for_ids(ids_df: DataFrame, seed: int) -> DataFrame:
    h = F.xxhash64(F.col("rid"), F.lit(seed))
    h2 = F.xxhash64(F.col("rid"), F.lit(seed + 1))
    n_tok = F.least(
        F.lit(4096), F.lit(8) + (F.pmod(h, F.lit(64)) * F.pmod(h2, F.lit(64))).cast("int")
    ).cast("int")
    return (
        ids_df.withColumn("doc_id", F.format_string("doc-%016x", F.col("rid")))
        .withColumn("n_tok", n_tok)
        .withColumn("source", _source_expr(F.pmod(h, F.lit(100))))
        .withColumn(
            "tokens",
            F.transform(
                F.sequence(F.lit(0), F.col("n_tok") - 1),
                lambda i: F.pmod(
                    F.xxhash64(F.col("rid"), i, F.lit(seed)), F.lit(VOCAB)
                ).cast("int"),
            ),
        )
        .select("doc_id", "tokens", "n_tok", "source")
    )
