"""SpEL-equivalent dynamic filter folding (reference:
SpelParsedPartitionPredicate.java:38-52, ExpressionParserFunctions.java,
README.md:248-266)."""

import json
from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from circus_train_spark.functions.expressions import resolve_expressions
from circus_train_spark.meta.catalog import TokenTable

NOW = datetime(2016, 5, 16, 10, 30, tzinfo=timezone.utc)


def test_readme_example_folds_to_literal():
    # the README.md:260 example, pinned clock
    s = "local_date >= '#{#nowUtc().minusDays(3).toString(\"yyyy-MM-dd\")}'"
    assert resolve_expressions(s, now=NOW) == "local_date >= '2016-05-13'"


def test_helpers_and_chaining():
    assert (
        resolve_expressions("#{#nowUtc().plusMonths(1).toString(\"yyyy-MM\")}", now=NOW)
        == "2016-06"
    )
    # month-end clamping like Joda (Jan 31 + 1 month -> Feb 29 in 2016)
    jan31 = datetime(2016, 1, 31, tzinfo=timezone.utc)
    assert (
        resolve_expressions("#{#nowUtc().plusMonths(1).toString(\"yyyy-MM-dd\")}", now=jan31)
        == "2016-02-29"
    )
    assert resolve_expressions("#{#zeroPadLeft(7, 3)}", now=NOW) == "007"
    assert resolve_expressions("#{#zeroPadLeft('4', 2)}", now=NOW) == "04"
    # multiple blocks in one string
    s = "y = '#{#nowUtc().toString(\"yyyy\")}' AND m = '#{#zeroPadLeft(5, 2)}'"
    assert resolve_expressions(s, now=NOW) == "y = '2016' AND m = '05'"
    # literal-only strings pass through untouched
    assert resolve_expressions("partition = 'wiki'", now=NOW) == "partition = 'wiki'"


def test_no_builtins_leak():
    import pytest

    with pytest.raises(Exception):
        resolve_expressions("#{__import__('os').getpid()}", now=NOW)


def test_cli_relative_filter_selects_partitions(spark, tmp_path, tokens_df, capsys):
    """End-to-end: a date-partitioned table + a relative-date filter through
    the CLI's check-filter (the check-filters.sh dry-run tool analogue)."""
    from circus_train_spark.cli import main

    t = TokenTable.create(spark, str(tmp_path / "dated"))
    today = datetime.now(timezone.utc)
    dates = [(today - timedelta(days=d)).strftime("%Y-%m-%d") for d in range(6)]
    df = tokens_df.limit(600).withColumn(
        "source",
        F.element_at(
            F.array(*[F.lit(d) for d in dates]),
            (F.pmod(F.xxhash64("doc_id"), F.lit(6)) + 1).cast("int"),
        ),
    )
    t.append(df, num_files=2)

    rc = main(
        [
            "check-filter",
            "--table",
            str(tmp_path / "dated"),
            "--filter",
            "partition >= '#{#nowUtc().minusDays(3).toString(\"yyyy-MM-dd\")}'",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    expected = sorted(dates[:4], reverse=True)  # today .. today-3, newest first
    assert out["partitions"] == expected
    assert "#{" not in out["resolved"]


# ------------------------------------------------------- AST whitelist guard
def test_safe_eval_blocks_dunder_traversal():
    """The evaluator is an AST whitelist, not eval: attribute chains into
    dunders (the classic ().__class__.__mro__ escape) and non-whitelisted
    syntax raise instead of executing."""
    import pytest

    from circus_train_spark.functions.expressions import (
        ExpressionError,
        resolve_expressions,
    )

    hostile = [
        "().__class__.__mro__",                     # Tuple node
        "nowUtc().__class__",                       # dunder attribute
        "[x for x in (1,)]",                        # comprehension
        "__import__('os')",                         # unknown/underscore name
        "getattr(nowUtc(), 'x')",                   # unknown name
        "nowUtc()._dt",                             # private attribute
        "(lambda: 1)()",                            # lambda
        "'a' + 'b'",                                # binop not whitelisted
        "nowUtc(**{'a': 1})",                       # **kwargs
    ]
    for expr in hostile:
        with pytest.raises(ExpressionError):
            resolve_expressions("#{" + expr + "}")


def test_safe_eval_allows_documented_surface():
    from datetime import datetime, timezone

    from circus_train_spark.functions.expressions import resolve_expressions

    pinned = datetime(2024, 1, 31, tzinfo=timezone.utc)
    out = resolve_expressions(
        "d >= '#{#nowUtc().minusDays(-(-14)).withTimeAtStartOfDay()"
        '.toString("yyyy-MM-dd")}\'',
        now=pinned,
    )
    assert out == "d >= '2024-01-17'"
    assert resolve_expressions("#{zeroPadLeft(7, 3)}", now=pinned) == "007"
