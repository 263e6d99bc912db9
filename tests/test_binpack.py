"""Unit tests for the FFD bin-packing planner (pure Python, no Spark)."""

from circus_train_spark.operators.binpack import (
    first_fit_decreasing,
    plan_compaction_groups,
)


def _mk(i, size, part="web", rows=10):
    return {
        "file_path": f"/d/{part}/f{i}.parquet",
        "file_size": size,
        "n_rows": rows,
        "partition": part,
    }


def test_ffd_respects_target():
    files = [(f"f{i}", s, 1) for i, s in enumerate([60, 50, 40, 30, 20, 10])]
    bins = first_fit_decreasing(files, target_bytes=100)
    assert all(b.total_bytes <= 100 for b in bins)
    assert sum(len(b.files) for b in bins) == 6
    # FFD on this instance: [60+40], [50+30+20], [10] → ≤ 3 bins
    assert len(bins) <= 3


def test_ffd_oversized_file_gets_singleton():
    bins = first_fit_decreasing([("big", 500, 1), ("s", 10, 1)], target_bytes=100)
    assert any(b.files == ["big"] for b in bins)


def test_ffd_deterministic_group_ids():
    files = [(f"f{i}", 10 * (i + 1), i) for i in range(10)]
    a = first_fit_decreasing(files, 64)
    b = first_fit_decreasing(list(reversed(files)), 64)
    assert [g.group_id for g in a] == [g.group_id for g in b]


def test_plan_filters_large_files_and_singletons():
    entries = [_mk(0, 10), _mk(1, 10), _mk(2, 999), _mk(3, 10, part="books")]
    groups = plan_compaction_groups(entries, target_bytes=100)
    # the two small web files form one group; the 999-byte file is not a
    # candidate; the lone books file is a singleton → dropped
    assert len(groups) == 1
    assert groups[0].partition == "web"
    assert sorted(groups[0].files) == ["/d/web/f0.parquet", "/d/web/f1.parquet"]


def test_plan_is_per_partition():
    entries = [_mk(i, 10) for i in range(4)] + [_mk(i, 10, part="books") for i in range(4, 8)]
    groups = plan_compaction_groups(entries, target_bytes=1000)
    assert {g.partition for g in groups} == {"web", "books"}
    for g in groups:
        assert len(g.files) == 4
