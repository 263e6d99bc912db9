"""circus_train_spark — a PySpark-native Iceberg-style table-maintenance engine.

A from-scratch re-expression of the capabilities of ExpediaGroup/circus-train
(a Hive-table replication engine) for Iceberg-style tables of pre-tokenized
training sequences:

- **compaction** — greedy first-fit-decreasing bin-packing of small data files
  into target-size groups (reference analogue: uniform-size split planning,
  ``circus-train-s3-mapreduce-cp/.../UniformSizeInputFormat.java:78-125``)
- **clustering** — Z-order / Hilbert keys via numpy bit-interleaving inside
  Arrow-vectorized pandas UDFs, ``repartitionByRange`` with salted keys
- **manifest rewrite** — metadata-only coalesce of manifest files (reference
  analogue: server-side S3->S3 copy, ``S3S3Copier.java:138-199``)
- **snapshot expiry** — deferred deletion of files reachable only from expired
  snapshots (reference analogue: housekeeping,
  ``circus-train-housekeeping/.../HousekeepingRunner.java:56-75``)
- **MERGE INTO** — broadcast-or-sort-merge anti/semi join classification with
  copy-on-write file-group rewrite (reference analogue: partition upsert probe
  ``core/replica/Replica.java:177-204`` and propagate-deletes anti-join
  ``core/replica/DestructiveReplica.java:83-127``)

plus snapshot isolation (atomic pointer swap; reference analogue: unique
event-id destinations + rename commit,
``FullReplicationReplicaLocationManager.java:58-77``) and per-partition
lineage/checkpoint logs (reference analogue: Hadoop copy counters,
``CopyMapper.java:142-145``).

Everything is expressed with the public ``pyspark.sql`` DataFrame API;
row-level compute is vectorized (built-in functions or Arrow pandas UDFs),
never per-row Python.
"""

__version__ = "0.1.0"

from circus_train_spark.meta.catalog import TokenTable  # noqa: F401
