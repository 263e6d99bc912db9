"""Config-driven sequential runner with per-job failure isolation
(Locomotive.java:97-133 analogue)."""

import json

from circus_train_spark.meta.catalog import TokenTable
from circus_train_spark.pipeline.runner import run_config, run_config_file


def test_run_config_sequential_and_isolated(spark, tmp_path, tokens_df):
    t = TokenTable.create(spark, str(tmp_path / "tbl"))
    t.append(tokens_df.limit(600), num_files=6)

    cfg = {
        "jobs": [
            {"op": "compact", "table": str(tmp_path / "tbl"), "target_mb": 512},
            # failure in the middle: unknown table — must NOT abort the run
            {"op": "compact", "table": str(tmp_path / "nope")},
            {"op": "validate", "table": str(tmp_path / "tbl")},
            {
                "op": "replicate",
                "source": str(tmp_path / "tbl"),
                "replica": str(tmp_path / "rep"),
                "mode": "incremental",
            },
        ]
    }
    report = run_config(spark, cfg)
    codes = [(j.op, j.completion_code) for j in report.jobs]
    assert codes == [
        ("compact", 1),
        ("compact", -1),
        ("validate", 1),
        ("replicate", 1),
    ]
    assert not report.ok
    assert "FileNotFoundError" in report.jobs[1].error
    rep = TokenTable.load(spark, str(tmp_path / "rep"))
    assert rep.table_digest() == t.table_digest()


def test_run_config_file_with_dynamic_filter(spark, tmp_path, tokens_df):
    t = TokenTable.create(spark, str(tmp_path / "src2"))
    t.append(tokens_df.limit(300), num_files=2)
    cfg_path = tmp_path / "jobs.json"
    cfg_path.write_text(
        json.dumps(
            {
                "jobs": [
                    {
                        "op": "replicate",
                        "source": str(tmp_path / "src2"),
                        "replica": str(tmp_path / "rep2"),
                        "mode": "full",
                        # dynamic block folds to a literal; matches everything
                        "partition_filter": "partition >= '#{#zeroPadLeft(0, 1)}'",
                    }
                ]
            }
        )
    )
    report = run_config_file(spark, str(cfg_path))
    assert report.ok
    assert report.jobs[0].result["rows_copied"] == 300


def test_run_config_row_level_and_snapshot_ops(spark, tmp_path, tokens_df):
    """delete -> tag -> update -> rollback-to-tag -> validate as one config:
    the row-level and snapshot-management ops compose in the driver loop."""
    root = str(tmp_path / "tbl2")
    t = TokenTable.create(spark, root)
    t.append(tokens_df.limit(500), num_files=4)
    n0 = t.scan().count()
    d0 = t.table_digest()
    tagged_snapshot = t.log.current_id()

    cfg = {
        "jobs": [
            {"op": "tag", "table": root, "name": "pre-maintenance"},
            {"op": "delete", "table": root, "where": "n_tok < 32",
             "mode": "auto", "verify": False},
            {"op": "update", "table": root, "where": "n_tok > 96",
             "set": {"source": "upper(source)"}},
            {"op": "rollback", "table": root, "snapshot": tagged_snapshot},
            {"op": "validate", "table": root},
        ]
    }
    report = run_config(spark, cfg)
    assert [j.completion_code for j in report.jobs] == [1, 1, 1, 1, 1]
    assert report.ok
    # rollback restored the tagged state exactly
    t2 = TokenTable.load(spark, root)
    assert t2.scan().count() == n0
    assert t2.table_digest() == d0
    assert t2.refs()["tags"]["pre-maintenance"]["snapshot_id"] == tagged_snapshot


def test_run_config_view_ops_and_mapped_replication(spark, tmp_path, tokens_df):
    """create_view -> replicate with table_mappings -> drop_view in one
    config: views land on the replica with their text rewritten."""
    src_root = str(tmp_path / "vsrc")
    rep_root = str(tmp_path / "vrep")
    t = TokenTable.create(spark, src_root)
    t.append(tokens_df.limit(300), num_files=2)

    cfg = {
        "jobs": [
            {"op": "create_view", "table": src_root, "name": "big",
             "sql": "SELECT t.doc_id FROM prod.tok AS t WHERE t.n_tok > 64"},
            {"op": "replicate", "source": src_root, "replica": rep_root,
             "mode": "full",
             "table_mappings": {"prod.tok": "replica.tok"}},
            {"op": "drop_view", "table": src_root, "name": "big"},
        ]
    }
    report = run_config(spark, cfg)
    assert report.ok
    rep = TokenTable.load(spark, rep_root)
    assert rep.views() == {
        "big": "SELECT t.doc_id FROM replica.tok AS t WHERE t.n_tok > 64"
    }
    assert TokenTable.load(spark, src_root).views() == {}
