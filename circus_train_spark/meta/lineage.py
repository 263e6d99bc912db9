"""Per-partition/per-group lineage + checkpoint log.

Every maintenance run appends one JSON line per unit of work (a compaction
group, a clustered partition, a merged file group) recording
files-in/files-out/rows/bytes and a terminal status. The log doubles as the
resume checkpoint: a re-run of the same logical job skips units whose
deterministic ``group_id`` is already recorded as committed and whose outputs
still exist.

Reference analogue: Hadoop counters incremented per copy task and rolled up
at job end (``s3-mapreduce-cp/.../mapreduce/CopyMapper.java:142-145``,
``circus-train-metrics/.../JobMetrics.java:46-70``) plus per-table failure
isolation in the driver loop (``core/Locomotive.java:107-126``).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field

from circus_train_spark.meta import schema as S

STATUS_DONE = "done"
STATUS_FAILED = "failed"


@dataclass
class LineageRecord:
    run_id: str
    operation: str
    group_id: str
    partition: str | None
    files_in: list[str] = field(default_factory=list)
    files_out: list[str] = field(default_factory=list)
    rows: int = 0
    bytes_in: int = 0
    bytes_out: int = 0
    status: str = STATUS_DONE
    error: str | None = None
    timestamp_ms: int = 0
    duration_s: float = 0.0


class LineageLog:
    def __init__(self, root: str):
        self.dir = os.path.join(root, S.LINEAGE_DIR)

    def _path(self, operation: str) -> str:
        return os.path.join(self.dir, f"{operation}.jsonl")

    def append(self, rec: LineageRecord) -> None:
        os.makedirs(self.dir, exist_ok=True)
        if not rec.timestamp_ms:
            rec.timestamp_ms = int(time.time() * 1000)
        line = json.dumps(asdict(rec), separators=(",", ":"))
        # O_APPEND single-write is atomic for reasonable line sizes on POSIX
        with open(self._path(rec.operation), "a") as f:
            f.write(line + "\n")

    def records(self, operation: str) -> list[LineageRecord]:
        try:
            with open(self._path(operation)) as f:
                lines = f.readlines()
        except FileNotFoundError:
            return []
        out = []
        for ln in lines:
            ln = ln.strip()
            if ln:
                out.append(LineageRecord(**json.loads(ln)))
        return out

    def completed_groups(self, operation: str) -> dict[str, LineageRecord]:
        """group_id -> record for groups already done whose outputs exist."""
        done: dict[str, LineageRecord] = {}
        for rec in self.records(operation):
            if rec.status == STATUS_DONE and all(
                os.path.exists(p) for p in rec.files_out
            ):
                done[rec.group_id] = rec
        return done
