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


MAIN_BRANCH = "main"


class SnapshotLog:
    """Filesystem-backed snapshot log for one table root."""

    def __init__(self, root: str):
        self.root = root
        self.snapshot_dir = os.path.join(root, S.SNAPSHOT_DIR)
        self.hint_path = os.path.join(root, S.VERSION_HINT)
        self.lock_path = os.path.join(root, S.COMMIT_LOCK)
        self.refs_path = os.path.join(root, S.REFS_FILE)

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

    # -- refs (named branches & tags, Iceberg-style) ------------------------
    def refs(self) -> dict:
        """``{"branches": {name: {"snapshot_id": id, ...}}, "tags": {...}}``.
        ``main`` is implicit (the version hint), never stored here."""
        try:
            with open(self.refs_path) as f:
                d = json.load(f)
        except FileNotFoundError:
            d = {}
        d.setdefault("branches", {})
        d.setdefault("tags", {})
        return d

    def branch_head(self, branch: str = MAIN_BRANCH) -> int | None:
        if branch == MAIN_BRANCH:
            return self.current_id()
        b = self.refs()["branches"].get(branch)
        return None if b is None else int(b["snapshot_id"])

    def _write_refs_locked(self, refs: dict) -> None:
        self._write_atomic(self.refs_path, json.dumps(refs, indent=1))

    def set_ref(self, kind: str, name: str, snapshot_id: int) -> None:
        """Create/update a named ref under the commit lock. Tags are
        immutable: re-pointing an existing tag raises."""
        assert kind in ("branches", "tags")
        if name == MAIN_BRANCH:
            raise ValueError("'main' is the implicit head ref; use commit/rollback")
        os.makedirs(os.path.dirname(self.lock_path), exist_ok=True)
        with open(self.lock_path, "a") as lock:
            fcntl.flock(lock.fileno(), fcntl.LOCK_EX)
            try:
                refs = self.refs()
                prev = refs[kind].get(name)
                if kind == "tags" and prev and prev["snapshot_id"] != snapshot_id:
                    raise ValueError(
                        f"tag {name!r} already points at {prev['snapshot_id']}; "
                        "tags are immutable (drop it first)"
                    )
                refs[kind][name] = {
                    "snapshot_id": int(snapshot_id),
                    "created_ms": int(time.time() * 1000),
                }
                self._write_refs_locked(refs)
            finally:
                fcntl.flock(lock.fileno(), fcntl.LOCK_UN)

    def drop_ref(self, kind: str, name: str) -> None:
        os.makedirs(os.path.dirname(self.lock_path), exist_ok=True)
        with open(self.lock_path, "a") as lock:
            fcntl.flock(lock.fileno(), fcntl.LOCK_EX)
            try:
                refs = self.refs()
                refs[kind].pop(name, None)
                self._write_refs_locked(refs)
            finally:
                fcntl.flock(lock.fileno(), fcntl.LOCK_UN)

    def next_id(self) -> int:
        """Next globally-unique snapshot id: max over every snapshot on disk
        (branch/staged snapshots included) and the current head."""
        ids = self.all_snapshot_ids()
        hi = ids[-1] if ids else 0
        cur = self.current_id()
        if cur is not None and cur > hi:
            hi = cur
        return hi + 1

    def fast_forward(self, to_snapshot_id: int, expected_head: int | None) -> None:
        """Atomically advance the main head to ``to_snapshot_id`` (must be a
        direct child of the current head — the publish half of
        write-audit-publish). Raises CommitConflictError when the head moved."""
        with open(self.lock_path, "a") as lock:
            fcntl.flock(lock.fileno(), fcntl.LOCK_EX)
            try:
                cur = self.current_id()
                if cur != expected_head:
                    raise CommitConflictError(
                        f"expected head {expected_head}, found {cur}"
                    )
                target = self.get(to_snapshot_id)
                if target.parent_id != cur:
                    raise CommitConflictError(
                        f"snapshot {to_snapshot_id} is not a child of head {cur}; "
                        "cherry-pick instead"
                    )
                self._write_atomic(self.hint_path, str(to_snapshot_id))
            finally:
                fcntl.flock(lock.fileno(), fcntl.LOCK_UN)

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
        branch: str = MAIN_BRANCH,
        stage_only: bool = False,
        snapshot_id: int | None = None,
    ) -> Snapshot:
        """Atomically advance a ref (``main`` = the table head; any other
        ``branch`` = its refs.json pointer). Raises CommitConflictError if
        the ref is no longer ``expected_parent_id``.

        ``stage_only`` writes the snapshot descriptor WITHOUT moving any
        pointer — the write half of write-audit-publish; readers audit it by
        id, ``fast_forward``/cherry-pick publishes it later.

        ``snapshot_id`` lets the caller pre-allocate the id it stamped into
        manifest entries (``added_snapshot_id``); a stale pre-allocation
        (id taken by a concurrent commit) is a conflict, so the caller's
        rebase loop re-stamps and retries.
        """
        os.makedirs(self.snapshot_dir, exist_ok=True)
        os.makedirs(os.path.dirname(self.lock_path), exist_ok=True)
        with open(self.lock_path, "a") as lock:
            fcntl.flock(lock.fileno(), fcntl.LOCK_EX)
            try:
                cur = self.branch_head(branch)
                if cur != expected_parent_id:
                    raise CommitConflictError(
                        f"expected {branch} head {expected_parent_id}, found {cur}; "
                        "re-plan and retry"
                    )
                new_id = self.next_id() if snapshot_id is None else snapshot_id
                if os.path.exists(self.snapshot_path(new_id)):
                    raise CommitConflictError(
                        f"snapshot id {new_id} was taken by a concurrent commit"
                    )
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
                if not stage_only:
                    if branch == MAIN_BRANCH:
                        self._write_atomic(self.hint_path, str(new_id))
                    else:
                        refs = self.refs()
                        refs["branches"][branch] = {
                            "snapshot_id": new_id,
                            "created_ms": refs["branches"]
                            .get(branch, {})
                            .get("created_ms", int(time.time() * 1000)),
                        }
                        self._write_refs_locked(refs)
                return snap
            finally:
                fcntl.flock(lock.fileno(), fcntl.LOCK_UN)
