"""Greedy first-fit-decreasing (FFD) bin-packing of data files into
target-size rewrite groups.

Pure-Python planner over the (small) driver-side candidate list — the same
altitude at which the reference plans copy splits: its uniform-size input
format walks the listing accumulating bytes until a split reaches
``totalBytes/numSplits`` (``circus-train-s3-mapreduce-cp/.../mapreduce/
UniformSizeInputFormat.java:78-125``). FFD improves on that first-fit
in-listing-order approach: sorting descending first gives the classic
11/9·OPT+1 bound, producing fewer, fuller output files.

At 100 TB the candidate list is file-*count* sized (≈10^5–10^6 entries of
(path, size)), a few tens of MB on the driver — the standard posture for
table-format maintenance planners (Iceberg's RewriteDataFiles plans groups on
the driver too). The data itself never touches the driver.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field


@dataclass
class FileGroup:
    partition: str | None
    files: list[str] = field(default_factory=list)
    total_bytes: int = 0
    total_rows: int = 0

    @property
    def group_id(self) -> str:
        """Deterministic id from the sorted member list — identical re-plans
        yield identical ids, which is what makes resume idempotent (reference
        analogue: event-id-named destination folders)."""
        digest = hashlib.md5("\n".join(sorted(self.files)).encode()).hexdigest()
        return digest[:16]


def first_fit_decreasing(
    files: list[tuple[str, int, int]],
    target_bytes: int,
    partition: str | None = None,
) -> list[FileGroup]:
    """Pack (path, size, rows) triples into bins of ≤ target_bytes.

    Files larger than the target get a singleton bin (they pass through —
    caller normally filters those out beforehand).
    """
    bins: list[FileGroup] = []
    for path, size, rows in sorted(files, key=lambda t: (-t[1], t[0])):
        placed = False
        for b in bins:
            if b.total_bytes + size <= target_bytes:
                b.files.append(path)
                b.total_bytes += size
                b.total_rows += rows
                placed = True
                break
        if not placed:
            bins.append(
                FileGroup(
                    partition=partition, files=[path], total_bytes=size, total_rows=rows
                )
            )
    return bins


def plan_compaction_groups(
    entries: list[dict],
    target_bytes: int,
    small_file_threshold: int | None = None,
    min_group_files: int = 2,
    force_files: set[str] | None = None,
) -> list[FileGroup]:
    """Per-partition FFD over manifest entries.

    Candidates are files smaller than ``small_file_threshold`` (default:
    target_bytes). Groups with fewer than ``min_group_files`` members are
    dropped — rewriting a single file buys nothing — UNLESS the group holds
    a ``force_files`` member: those must be rewritten regardless of size
    (compaction uses this to rewrite files targeted by pending merge-on-read
    delete files, purging the deletes)."""
    threshold = small_file_threshold or target_bytes
    forced = force_files or set()
    by_part: dict[str | None, list[tuple[str, int, int]]] = {}
    for e in entries:
        if e["file_size"] < threshold or e["file_path"] in forced:
            by_part.setdefault(e["partition"], []).append(
                (e["file_path"], e["file_size"], e["n_rows"])
            )
    groups: list[FileGroup] = []
    for part in sorted(by_part, key=lambda p: (p is None, p)):
        for g in first_fit_decreasing(by_part[part], target_bytes, partition=part):
            if len(g.files) >= min_group_files or any(f in forced for f in g.files):
                groups.append(g)
    return groups
