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

# table directory layout
DATA_DIR = "data"
METADATA_DIR = "metadata"
SNAPSHOT_DIR = "metadata/snapshots"
MANIFEST_DIR = "metadata/manifests"
LINEAGE_DIR = "lineage"
VERSION_HINT = "metadata/version-hint.text"
COMMIT_LOCK = "metadata/commit.lock"

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
