"""Data-file writer strategy registry — the CopierFactory analogue.

Circus Train moves bytes through pluggable ``Copier`` strategies selected by
a factory manager with ``@Order`` precedence; users chain or replace them
(``circus-train-api/.../copier/CopierFactory.java``,
``CompositeCopierFactory.java``, ``core/DefaultCopierFactoryManager.java``,
``README.md:752-762``). In a Spark engine the byte-mover is the DataFrame
writer, so the pluggable unit here is the **file-group writer**: everything
that turns prepared rows into parquet data files — compaction group
rewrites, clustering output, merge/replicate/append staging — obtains its
writer from this registry.

A strategy declares ``accepts(dest_dir)`` and a precedence ``order`` (lower
wins, like Spring's ``@Order``); ``writer_for(dest)`` returns the first
accepting strategy. Registering a lower-order strategy (e.g. a
zstd-compressed cold-storage writer matched on a path marker, or an
encrypting writer) changes every operator's write path at once — the same
leverage the reference gets from swapping a CopierFactory.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class WriteRequest:
    """One file-group write: rows already repartitioned/sorted by the
    operator; the writer owns only the physical serialization."""

    df: DataFrame
    dest_dir: str
    partition_cols: list[str] = field(default_factory=list)
    single_file: bool = False
    codec: str = "uncompressed"
    mode: str = "append"


class ParquetWriter:
    """Default strategy: parquet via the Spark writer (whole-stage codegen,
    dictionary+RLE encoding; codec per request)."""

    name = "parquet"
    order = 100

    def accepts(self, dest_dir: str) -> bool:  # noqa: ARG002 — universal default
        return True

    def write(self, req: WriteRequest) -> None:
        df = req.df.coalesce(1) if req.single_file else req.df
        w = df.write.mode(req.mode).option("compression", req.codec)
        if req.partition_cols:
            w = w.partitionBy(*req.partition_cols)
        w.parquet(req.dest_dir)


_REGISTRY: list = [ParquetWriter()]


def register_writer(strategy) -> None:
    """Add a strategy; kept sorted by ``order`` (lower = higher priority)."""
    _REGISTRY.append(strategy)
    _REGISTRY.sort(key=lambda s: s.order)


def unregister_writer(name: str) -> None:
    _REGISTRY[:] = [s for s in _REGISTRY if s.name != name]


def writer_for(dest_dir: str):
    for s in _REGISTRY:
        if s.accepts(dest_dir):
            return s
    raise LookupError(f"no writer strategy accepts {dest_dir!r}")
