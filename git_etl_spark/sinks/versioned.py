"""Snapshot-versioned tables — time travel without a table format.

Each publish writes a new immutable snapshot dir (``v000N``) and then
atomically repoints a one-line ``_CURRENT`` pointer file; readers
resolve the pointer (or an explicit version) and only ever see a fully
written snapshot. This is the minimal mechanism behind Delta/Iceberg
time travel, expressed directly on a filesystem:

- writers never mutate a published snapshot (append-only dirs);
- the pointer swap is a single rename → readers get atomic cutover;
- old snapshots stay readable until ``prune`` (retention) removes
  them, enabling reproducible re-reads of training data as-of a run.

At 100 TB the same layout holds per partition, and snapshots share
unchanged files via hard links or object-store copy-on-write;
correctness (atomicity, isolation of concurrent reads from an
in-flight publish, exact as-of reads) is what the tests assert.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"


def _versions(table: str) -> list[int]:
    if not os.path.isdir(table):
        return []
    return sorted(
        int(d[1:]) for d in os.listdir(table)
        if d.startswith("v") and d[1:].isdigit()
    )


def publish_snapshot(df: DataFrame, table: str) -> int:
    """Write the next snapshot and atomically repoint ``_CURRENT``.
    Returns the new version number."""
    os.makedirs(table, exist_ok=True)
    version = (_versions(table)[-1] + 1) if _versions(table) else 1
    snap = os.path.join(table, f"v{version:04d}")
    df.write.mode("overwrite").parquet(snap)
    tmp = os.path.join(table, f".{_POINTER}.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(table, _POINTER))  # atomic cutover
    return version


def current_version(table: str) -> int:
    with open(os.path.join(table, _POINTER)) as f:
        return int(f.read().strip())


def read_snapshot(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Read the current snapshot, or an explicit version (time travel)."""
    v = current_version(table) if version is None else version
    path = os.path.join(table, f"v{v:04d}")
    if not os.path.isdir(path):
        raise FileNotFoundError(f"snapshot v{v:04d} not present in {table}")
    return spark.read.parquet(path)


def prune_snapshots(table: str, keep_last: int = 2) -> list[int]:
    """Retention: drop all but the newest ``keep_last`` snapshots
    (never the current one). Returns pruned version numbers."""
    import shutil

    cur = current_version(table)
    vs = _versions(table)
    to_drop = [v for v in vs[:-keep_last] if v != cur] if keep_last else []
    for v in to_drop:
        shutil.rmtree(os.path.join(table, f"v{v:04d}"))
    return to_drop
