"""Schemas and layout constants for the token-lake table format.

Data schema comes from the graft's input hint: pre-tokenized training
sequences ``(doc_id string, tokens array<int>, n_tok int, source string)``.

Manifest schema is the engine's catalog: one row per live data file with
per-file column stats (reference analogue: Circus Train pairs catalog
entities with column statistics — ``circus-train-core/.../core/
PartitionsAndStatistics.java:34-110`` — and records per-partition path
checksums — ``circus-train-comparator/.../PathDigest.java:55-70``).
"""

from __future__ import annotations

from pyspark.sql import types as T

PARTITION_COL = "source"

DATA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("file_path", T.StringType(), False),
        T.StructField("partition", T.StringType(), True),
        T.StructField("file_size", T.LongType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("min_doc_id", T.StringType(), True),
        T.StructField("max_doc_id", T.StringType(), True),
        T.StructField("min_n_tok", T.IntegerType(), True),
        T.StructField("max_n_tok", T.IntegerType(), True),
        T.StructField("min_zkey", T.LongType(), True),
        T.StructField("max_zkey", T.LongType(), True),
        # order-insensitive per-file digest: bit_xor of per-row xxhash64
        T.StructField("xor_digest", T.LongType(), True),
        T.StructField("added_snapshot_id", T.LongType(), False),
    ]
)

MANIFEST_COLUMNS = [f.name for f in MANIFEST_SCHEMA.fields]

# ---------------------------------------------------------------- evolution
#
# Reference matrix (SCHEMA_EVOLUTION.md:10-36): add field OK, remove field
# OK, int->long / float->double promotion OK; renames and demotions are NOT
# supported (the reference recreates the replica via temp-table + rename for
# anything else — AlterTableService.java:47-67, RenameTableOperation.java:
# 42-70). We enforce the same legality and resolve old files at SCAN time:
# Spark's parquet reader natively widens int32->int64 and float->double,
# returns null for columns a file predates, and prunes columns a file still
# carries after a remove — so no data rewrite is ever needed for a legal
# evolution.

_PROMOTIONS: dict[str, set[str]] = {
    "integer": {"long"},
    "float": {"double"},
}

# columns every token table must keep (the engine's core contract)
CORE_COLUMNS = ("doc_id", "tokens", "n_tok", "source")


def check_evolution(old: T.StructType, new: T.StructType) -> None:
    """Raise ValueError if ``old -> new`` is not a legal evolution."""
    old_by_name = {f.name: f for f in old.fields}
    for c in CORE_COLUMNS:
        if c not in {f.name for f in new.fields}:
            raise ValueError(f"cannot drop core column {c!r}")
    if [f.name for f in new.fields if f.name in old_by_name] != [
        f.name for f in old.fields if f.name in {g.name for g in new.fields}
    ]:
        raise ValueError("reordering existing columns is not supported")
    for f in new.fields:
        prev = old_by_name.get(f.name)
        if prev is None:
            if not f.nullable:
                raise ValueError(
                    f"new column {f.name!r} must be nullable (old files "
                    "have no values for it)"
                )
            continue
        if prev.dataType == f.dataType:
            continue
        if f.name in CORE_COLUMNS:
            # core columns carry persisted per-row xxhash64 digests whose
            # value depends on the physical type — widening them would make
            # recomputed digests disagree with manifest xor stats
            raise ValueError(
                f"cannot change the type of core column {f.name!r} "
                "(the engine's digest contract is bound to its type)"
            )
        ok = f.dataType.typeName() in _PROMOTIONS.get(prev.dataType.typeName(), set())
        if not ok:
            raise ValueError(
                f"illegal type change for {f.name!r}: "
                f"{prev.dataType.simpleString()} -> {f.dataType.simpleString()} "
                "(supported promotions: int->long, float->double)"
            )


def schema_from_json(text: str) -> T.StructType:
    return T.StructType.fromJson(__import__("json").loads(text))

# table directory layout
DATA_DIR = "data"
METADATA_DIR = "metadata"
SNAPSHOT_DIR = "metadata/snapshots"
MANIFEST_DIR = "metadata/manifests"
LINEAGE_DIR = "lineage"
VERSION_HINT = "metadata/version-hint.text"
COMMIT_LOCK = "metadata/commit.lock"
REFS_FILE = "metadata/refs.json"

# Directory-partition column used only on write (kept duplicated so the
# `source` column stays inside the parquet files themselves — Iceberg-style:
# partition values live in the manifest, not in path parsing).
WRITE_PART_COL = "_part"

# Row-content hash persisted as a hidden column in every data file (~0.2%
# size overhead): manifest stats collection then reads only the narrow
# columns below — never re-decoding token arrays. Scans use DATA_SCHEMA, so
# the column is pruned away at the parquet reader and invisible to users.
ROW_HASH_COL = "_h"
ZKEY_COL = "zkey"

# Token-table data files are written uncompressed: bounded-vocab int arrays
# are already compacted ~2x by parquet dictionary+RLE encoding, and snappy
# on top buys <1% size for ~2x encode time (measured at sf0.1). Scoped HERE,
# per write, so the session default (snappy) still applies to everything
# else the shared SparkSession touches. Swap to "zstd" for cold storage.
TOKEN_PARQUET_CODEC = "uncompressed"

STATS_READ_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField(ROW_HASH_COL, T.LongType(), True),
    ]
)

STATS_READ_SCHEMA_Z = T.StructType(
    STATS_READ_SCHEMA.fields[:3]
    + [
        T.StructField(ZKEY_COL, T.LongType(), True),
        T.StructField(ROW_HASH_COL, T.LongType(), True),
    ]
)
