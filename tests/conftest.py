from __future__ import annotations

import pytest

from circus_train_spark.session import get_spark
from circus_train_spark.sources.generator import generate_tokens


@pytest.fixture(scope="session")
def spark():
    s = get_spark("circus_train_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tokens_df(spark):
    """Small deterministic token table shared across tests (cached)."""
    df = generate_tokens(spark, 5_000, seed=42, partitions=8).cache()
    df.count()
    return df
