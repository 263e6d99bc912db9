"""Snapshot log: immutable JSON snapshot descriptors + atomic pointer swap.

Semantics (Iceberg-style, built from scratch):

- every commit writes a **new** snapshot JSON file naming the full list of
  manifest files that make up the table at that version;
- the *current* version is a single pointer file (``version-hint.text``)
  swapped atomically via ``os.replace`` under an advisory file lock with an
  optimistic parent check — a commit racing against another sees
  ``CommitConflictError`` and re-plans.

Reference analogue: Circus Train never mutates live data in place — each run
writes to a unique event-id folder and commits by metastore pointer update
(``core/replica/FullReplicationReplicaLocationManager.java:58-97``), with the
rename-based two-step swap of ``RenameTableOperation.java:42-70``; old
locations are deleted later by housekeeping. On an object store the pointer
swap maps to put-if-absent / conditional-put; on POSIX we use
``flock`` + ``os.replace``.
"""

from __future__ import annotations

import fcntl
import json
import os
import time
from dataclasses import dataclass, field

from circus_train_spark.meta import schema as S


class CommitConflictError(RuntimeError):
    """Optimistic-concurrency failure: table head moved under the committer."""


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    event_id: str
    timestamp_ms: int
    operation: str
    manifests: list[str] = field(default_factory=list)
    summary: dict = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "snapshot_id": self.snapshot_id,
                "parent_id": self.parent_id,
                "event_id": self.event_id,
                "timestamp_ms": self.timestamp_ms,
                "operation": self.operation,
                "manifests": self.manifests,
                "summary": self.summary,
            },
            indent=1,
        )

    @staticmethod
    def from_json(text: str) -> "Snapshot":
        d = json.loads(text)
        return Snapshot(
            snapshot_id=d["snapshot_id"],
            parent_id=d.get("parent_id"),
            event_id=d.get("event_id", ""),
            timestamp_ms=d.get("timestamp_ms", 0),
            operation=d.get("operation", ""),
            manifests=list(d.get("manifests", [])),
            summary=dict(d.get("summary", {})),
        )


class SnapshotLog:
    """Filesystem-backed snapshot log for one table root."""

    def __init__(self, root: str):
        self.root = root
        self.snapshot_dir = os.path.join(root, S.SNAPSHOT_DIR)
        self.hint_path = os.path.join(root, S.VERSION_HINT)
        self.lock_path = os.path.join(root, S.COMMIT_LOCK)

    # -- reads ------------------------------------------------------------
    def current_id(self) -> int | None:
        try:
            with open(self.hint_path) as f:
                text = f.read().strip()
        except FileNotFoundError:
            return None
        return int(text) if text else None

    def snapshot_path(self, snapshot_id: int) -> str:
        return os.path.join(self.snapshot_dir, f"snap-{snapshot_id:012d}.json")

    def get(self, snapshot_id: int) -> Snapshot:
        with open(self.snapshot_path(snapshot_id)) as f:
            return Snapshot.from_json(f.read())

    def current(self) -> Snapshot | None:
        sid = self.current_id()
        return None if sid is None else self.get(sid)

    def all_snapshot_ids(self) -> list[int]:
        try:
            names = os.listdir(self.snapshot_dir)
        except FileNotFoundError:
            return []
        out = []
        for n in names:
            if n.startswith("snap-") and n.endswith(".json"):
                out.append(int(n[len("snap-") : -len(".json")]))
        return sorted(out)

    def history(self) -> list[Snapshot]:
        """Ancestor chain of the current snapshot, oldest first. Stops at the
        oldest *retained* ancestor (expiry deletes older snapshot files)."""
        chain: list[Snapshot] = []
        sid = self.current_id()
        while sid is not None:
            try:
                snap = self.get(sid)
            except FileNotFoundError:
                break
            chain.append(snap)
            sid = snap.parent_id
        return list(reversed(chain))

    def delete_snapshot(self, snapshot_id: int) -> None:
        """Remove an expired snapshot descriptor (no-op if already gone)."""
        try:
            os.remove(self.snapshot_path(snapshot_id))
        except FileNotFoundError:
            pass

    # -- writes -----------------------------------------------------------
    def _write_atomic(self, path: str, text: str) -> None:
        tmp = f"{path}.tmp.{os.getpid()}.{time.monotonic_ns()}"
        with open(tmp, "w") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def commit(
        self,
        *,
        expected_parent_id: int | None,
        event_id: str,
        operation: str,
        manifests: list[str],
        summary: dict,
    ) -> Snapshot:
        """Atomically advance the table head. Raises CommitConflictError if
        the head is no longer ``expected_parent_id``."""
        os.makedirs(self.snapshot_dir, exist_ok=True)
        os.makedirs(os.path.dirname(self.lock_path), exist_ok=True)
        with open(self.lock_path, "a") as lock:
            fcntl.flock(lock.fileno(), fcntl.LOCK_EX)
            try:
                cur = self.current_id()
                if cur != expected_parent_id:
                    raise CommitConflictError(
                        f"expected head {expected_parent_id}, found {cur}; re-plan and retry"
                    )
                new_id = 1 if cur is None else cur + 1
                snap = Snapshot(
                    snapshot_id=new_id,
                    parent_id=cur,
                    event_id=event_id,
                    timestamp_ms=int(time.time() * 1000),
                    operation=operation,
                    manifests=list(manifests),
                    summary=summary,
                )
                self._write_atomic(self.snapshot_path(new_id), snap.to_json())
                self._write_atomic(self.hint_path, str(new_id))
                return snap
            finally:
                fcntl.flock(lock.fileno(), fcntl.LOCK_UN)
