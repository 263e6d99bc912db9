"""Job metrics emission — the JobMetrics / MetricsListener analogue.

Circus Train aggregates per-job Hadoop counters into a ``JobMetrics`` object
(bytes replicated + counter map + completion code,
``circus-train-metrics/.../JobMetrics.java:46-70``) and publishes them
through a listener that renders dotted metric paths to a sender (Graphite,
``core/event/MetricsListener.java:66-93``). The lineage log already records
the raw data; this module adds the listener-facing surface:

- ``JobMetrics`` — one object per committed operation;
- ``MetricsListener`` — subscribes to a table's commit hook, derives the
  metrics from the snapshot summary, and forwards them to any sender
  callable;
- ``render_graphite`` — the ``<prefix>.<table>.<name> <value> <ts>`` line
  format the reference emits, for file/socket senders.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from circus_train_spark.meta.catalog import TokenTable

# reference completion codes (CompletionCode.java): SUCCESS=1, FAILURE=-1
SUCCESS = 1
FAILURE = -1


@dataclass
class JobMetrics:
    operation: str
    event_id: str
    snapshot_id: int | None
    completion_code: int
    bytes_replicated: int
    counters: dict[str, int] = field(default_factory=dict)
    timestamp_ms: int = 0

    def as_flat(self) -> dict[str, int]:
        out = {
            "completion_code": self.completion_code,
            "bytes_replicated": self.bytes_replicated,
        }
        out.update(self.counters)
        return out


def metrics_from_snapshot(snap) -> JobMetrics:
    s = snap.summary
    counters = {
        k: v
        for k, v in s.items()
        if isinstance(v, (int, float)) and not isinstance(v, bool)
    }
    return JobMetrics(
        operation=snap.operation,
        event_id=snap.event_id,
        snapshot_id=snap.snapshot_id,
        completion_code=SUCCESS,
        bytes_replicated=int(s.get("added_bytes", 0)),
        counters={k: int(v) for k, v in counters.items()},
        timestamp_ms=snap.timestamp_ms,
    )


def render_graphite(prefix: str, m: JobMetrics) -> list[str]:
    """``<prefix>.<operation>.<name> <value> <epoch-sec>`` lines — the
    MetricsListener path scheme (``<prefix>.<db>.<table>.<metric>``)."""
    ts = (m.timestamp_ms or int(time.time() * 1000)) // 1000
    return [
        f"{prefix}.{m.operation}.{name} {value} {ts}"
        for name, value in sorted(m.as_flat().items())
    ]


class MetricsListener:
    """Attach to a table; every commit produces a JobMetrics forwarded to
    the sender. Failures in the sender never fail the commit (the reference
    logs and continues — metrics are best-effort)."""

    def __init__(self, table: TokenTable, sender=None, prefix: str = "circus_train"):
        self.prefix = prefix
        self.sender = sender
        self.emitted: list[JobMetrics] = []
        table.on_commit(self._on_commit)

    def _on_commit(self, snap) -> None:
        m = metrics_from_snapshot(snap)
        self.emitted.append(m)
        if self.sender is not None:
            try:
                self.sender(m)
            except Exception:  # noqa: BLE001 — metrics are best-effort
                pass


def file_sender(path: str, prefix: str = "circus_train"):
    """Sender writing Graphite plaintext lines to a local file (swap for a
    socket sender in production)."""

    def send(m: JobMetrics) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "a") as f:
            for line in render_graphite(prefix, m):
                f.write(line + "\n")

    return send


def socket_sender(
    host: str, port: int, prefix: str = "circus_train", timeout_s: float = 5.0
):
    """Plaintext-protocol Graphite sender over TCP — the production path
    (reference emits raw ``<path> <value> <ts>\\n`` lines to a socket;
    integration-asserted in
    ``CircusTrainHdfsHdfsIntegrationTest.java:205-225``). One short-lived
    connection per metrics batch; errors propagate to the caller
    (MetricsListener already treats senders as best-effort)."""
    import socket

    def send(m: JobMetrics) -> None:
        payload = "".join(line + "\n" for line in render_graphite(prefix, m))
        with socket.create_connection((host, port), timeout=timeout_s) as sock:
            sock.sendall(payload.encode("utf-8"))

    return send
