"""Cross-check the independent pure-Python XXH64 (tools/pyxxh64.py) against
Spark's own ``F.xxhash64`` — the foundation of the fixture-based oracles for
`minhash_lsh_dedup` and `simhash_fingerprint`.

Also pins the regression for the ``F.transform`` two-parameter-lambda trap:
a ``lambda s, i=i`` closure is parsed as the binary ``(element, index)``
lambda, so every minhash family would hash with the array position as seed
(one effective hash function; LSH S-curve destroyed).
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from pyxxh64 import (  # noqa: E402
    spark_xxhash64_long,
    spark_xxhash64_str,
    spark_xxhash64_str_int,
    spark_xxhash64_str_long,
)

STRINGS = [
    "",
    "a",
    "ab",
    "abc",
    "abcd",
    "abcde",
    "1234567",  # 7 bytes: int + byte tail
    "12345678",  # exactly one word
    "123456789",  # word + byte
    "x" * 31,
    "y" * 32,  # stripe boundary
    "z" * 33,
    "w" * 100,  # multiple stripes + tail
    "hello world the quick brown fox",
    "émoji ünïcode ✓ 測試 — multibyte utf-8",
]
LONGS = [0, 1, -1, 42, 2**31, -(2**31) - 7, 2**63 - 1, -(2**63)]


def test_pyxxh64_matches_spark(spark):
    df = spark.createDataFrame(
        [(s, LONGS[i % len(LONGS)]) for i, s in enumerate(STRINGS)], "s string, v long"
    )
    rows = df.select(
        "s",
        "v",
        F.xxhash64("s").alias("h_str"),
        F.xxhash64("v").alias("h_long"),
        F.xxhash64("s", "v").alias("h_chain_long"),
        F.xxhash64("s", F.lit(7)).alias("h_chain_int"),
    ).collect()
    for r in rows:
        assert r.h_str == spark_xxhash64_str(r.s), r.s
        assert r.h_long == spark_xxhash64_long(r.v), r.v
        assert r.h_chain_long == spark_xxhash64_str_long(r.s, r.v), (r.s, r.v)
        assert r.h_chain_int == spark_xxhash64_str_int(r.s, 7), r.s


def test_minhash_families_are_distinct(spark):
    """Regression: each hash family must use its own seed (not the element
    index — the two-parameter-lambda trap)."""
    from circus_train_spark.pipeline.dedup import minhash_signature

    df = spark.createDataFrame([(["alpha", "beta", "gamma"],)], "sh array<string>")
    sig = df.select(minhash_signature(F.col("sh"), 8).alias("sig")).collect()[0].sig
    assert len(set(sig)) > 1, "all minhash families identical — seed not applied"
    # and each family value equals the independent implementation's min
    for i, v in enumerate(sig):
        expect = min(spark_xxhash64_str_int(s, i) for s in ["alpha", "beta", "gamma"])
        assert v == expect, f"family {i}"


@pytest.mark.parametrize("sf_tag", ["sf0.001"])
def test_fixture_matches_engine(spark, sf_tag):
    """End-to-end: the committed fixture parquet equals the live engine
    output for the small sf (fast; sf0.01 is covered by check_oracle)."""
    import pandas as pd

    fixture_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
    )
    sf_dir = f"/root/testdata/{sf_tag}"
    if not os.path.isdir(sf_dir):
        pytest.skip("testdata not present")

    import __spark_entry__ as entry

    mh = entry.queries()["minhash_lsh_dedup"](spark, sf_dir).toPandas()
    fx = pd.read_parquet(os.path.join(fixture_dir, "minhash_lsh_dedup", f"{sf_tag}.parquet"))
    assert set(map(tuple, mh[["doc_id", "source"]].itertuples(index=False))) == set(
        map(tuple, fx[["doc_id", "source"]].itertuples(index=False))
    )

    sh = entry.queries()["simhash_fingerprint"](spark, sf_dir).toPandas()
    fs = pd.read_parquet(os.path.join(fixture_dir, "simhash_fingerprint", f"{sf_tag}.parquet"))
    assert dict(zip(sh.doc_id, sh.simhash)) == dict(zip(fs.doc_id, fs.simhash))
