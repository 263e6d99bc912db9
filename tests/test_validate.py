"""Metadata-vs-data parity audit (compare-tables tool analogue)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from circus_train_spark.meta.catalog import TokenTable
from circus_train_spark.operators.validate import validate


def test_validate_clean_table(spark, tmp_path, tokens_df):
    t = TokenTable.create(spark, str(tmp_path / "tbl"))
    t.append(tokens_df.limit(1000), num_files=4)
    res = validate(t)
    assert res.ok, res.issues
    assert res.files_checked > 0
    assert res.manifest_rows == res.data_rows == 1000


def test_validate_detects_missing_and_corrupt(spark, tmp_path, tokens_df):
    t = TokenTable.create(spark, str(tmp_path / "tbl"))
    t.append(tokens_df.limit(1000), num_files=4)
    files = sorted(t.file_paths())
    os.remove(files[0])
    # corrupt another file: rewrite it with one row dropped (and drop the
    # stale Hadoop .crc sidecar so the local FS serves the new bytes)
    tbl = pq.read_table(files[1])
    pq.write_table(tbl.slice(1), files[1])
    crc = os.path.join(
        os.path.dirname(files[1]), "." + os.path.basename(files[1]) + ".crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    res = validate(t)
    assert not res.ok
    statuses = {i.split(": ")[1] for i in res.issues if ": " in i}
    assert "missing" in statuses
    assert "row_count_mismatch" in statuses or "digest_mismatch" in statuses
