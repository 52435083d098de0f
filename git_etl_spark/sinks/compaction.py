"""Small-file compaction + clustering — data-lake table maintenance.

A long-lived table fed by incremental upserts (sinks/upsert.py) or
streaming micro-batches accumulates many small parquet files; at
100 TB that means millions of files, so every scan pays footer-read
and task-scheduling overhead per file and loses row-group-level
min/max pruning. Compaction rewrites a table into
``ceil(bytes / target_file_bytes)`` right-sized files, optionally
clustering rows (``sortWithinPartitions`` after a range
``repartitionByRange``) so each output file covers a narrow range of
the cluster key and predicate pushdown can skip whole files.

The reference's analogue is SQLite's implicit page management
(``/root/reference/db/index.ts:23-26`` tunes page cache / WAL); a
columnar lake must do this maintenance explicitly, so this is the
engine-side replacement, not a port.

Scale notes: compaction is per-partition in production (compact only
partitions whose small-file count crosses a threshold), runs against a
staging dir and atomically swaps via ``publish`` (K6 semantics) so
readers never see a half-compacted table. Range-repartition samples
the cluster key, so output files are balanced even under skew.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import SparkSession

from .upsert import publish, write_staging


@dataclass
class CompactionStats:
    files_before: int
    files_after: int
    bytes_before: int
    rows: int


def _parquet_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        out.extend(
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith(".")
        )
    return out


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_by: list[str] | None = None,
) -> CompactionStats:
    """Rewrite the parquet table at ``path`` into right-sized files,
    optionally range-clustered by ``cluster_by``, swapping atomically."""
    files = _parquet_files(path)
    bytes_before = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-bytes_before // target_file_bytes))  # ceil div

    df = spark.read.parquet(path)
    rows = df.count()
    if cluster_by:
        # range partition → each output file covers a narrow key range,
        # then sort inside the file so row-group min/max stats are tight
        df = df.repartitionByRange(n_out, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        df = df.coalesce(n_out) if len(files) > n_out else df.repartition(n_out)

    staged = write_staging(df, path)
    publish(staged, path)
    return CompactionStats(
        files_before=len(files),
        files_after=len(_parquet_files(path)),
        bytes_before=bytes_before,
        rows=rows,
    )


def zorder_value(cols: list[str], bits: int = 16):
    """Morton (Z-order) interleave of the low ``bits`` bits of each
    column: points close in EVERY dimension get close z-values, so
    range-partitioning + sorting on z tightens per-file min/max on ALL
    clustered columns at once — multi-dimensional data skipping, where
    lexicographic sort only serves its leading column. Columns must be
    non-negative ints (rank/bucket-encode first otherwise)."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(F.col(c).cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(cols) + j))
    return z


def compact_parquet_zorder(
    spark: SparkSession,
    path: str,
    cluster_by: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
) -> CompactionStats:
    """Compaction with Z-order clustering across ``cluster_by``
    (two or more dimensions); same atomic-swap semantics as
    compact_parquet."""
    files = _parquet_files(path)
    bytes_before = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-bytes_before // target_file_bytes))

    df = spark.read.parquet(path)
    rows = df.count()
    df = (
        df.withColumn("__z", zorder_value(cluster_by))
        .repartitionByRange(n_out, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    staged = write_staging(df, path)
    publish(staged, path)
    return CompactionStats(
        files_before=len(files),
        files_after=len(_parquet_files(path)),
        bytes_before=bytes_before,
        rows=rows,
    )
