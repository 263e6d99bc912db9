"""Local mimic of the driver's correctness gate: run each __spark_entry__
query on Spark and its oracle SQL on DuckDB at the same sf, compare
row count + sorted-column schema + order-insensitive value multiset.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry
from circus_train_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.6f}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(rows)} rows (rows-only, {time.monotonic()-t0:.1f}s)")
            if len(rows) == 0:
                failures.append(name)
                print(f"FAIL  {name}: zero rows from rows-only query")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = list(rel.columns)
            otypes = [str(t).upper() for t in rel.types]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        ok = True
        # physical-type parity: the driver hashes typed values, so a DuckDB
        # HUGEINT vs Spark BIGINT mismatch fails even when values are equal.
        sp_types = dict(df.dtypes)
        dk_types = dict(zip(ocols, otypes))
        _EQ = {
            "bigint": {"BIGINT", "INTEGER"},
            "int": {"INTEGER"},
            "double": {"DOUBLE", "FLOAT"},
            "string": {"VARCHAR"},
            "boolean": {"BOOLEAN"},
            "date": {"DATE"},
            "timestamp": {"TIMESTAMP"},
        }
        for c in cols:
            want = _EQ.get(sp_types.get(c, ""), None)
            got = dk_types.get(c)
            if want is not None and got is not None and got not in want:
                ok = False
                print(f"FAIL  {name}: column {c} type spark={sp_types[c]} duckdb={got}")
        if sorted(cols) != sorted(ocols):
            ok = False
            print(f"FAIL  {name}: columns {sorted(cols)} vs oracle {sorted(ocols)}")
        elif len(rows) != len(orows):
            ok = False
            print(f"FAIL  {name}: rowcount {len(rows)} vs oracle {len(orows)}")
        else:
            a, b = multiset(rows, cols), multiset(orows, ocols)
            if a != b:
                ok = False
                diffs = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
                print(f"FAIL  {name}: value mismatch; first diffs:")
                for i in diffs:
                    print(f"      spark : {a[i]}")
                    print(f"      oracle: {b[i]}")
        if ok:
            print(f"OK    {name}: {len(rows)} rows ({time.monotonic()-t0:.1f}s)")
        else:
            failures.append(name)
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
