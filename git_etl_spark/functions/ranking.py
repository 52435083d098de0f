"""Distributed total-order ranking — the zipWithIndex-style primitive
the global-window docstrings promise "at 100 TB".

``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY funnels the
whole relation through ONE task — semantically, not as an accident of
partition coalescing, so no runtime (AQE, bigger cluster) can rescue
it. For data-linear inputs (per-user aggregates, per-doc scores, the
shingle dictionary) that is the one stage class that cannot survive a
100x scale-up. The classic fix is two-phase numbering, the same scheme
``RDD.zipWithIndex`` uses:

1. ``repartitionByRange`` on the sort key (distributed range sort —
   sampled boundaries, each partition holds a contiguous key range),
2. sort + number WITHIN each partition in parallel
   (``monotonically_increasing_id`` after ``sortWithinPartitions``:
   consecutive within a partition, so ``mid - min(mid)`` is the local
   index),
3. collect ONE count per partition (<= numPartitions rows — bounded by
   cluster config, never by data; the same driver-side step
   ``zipWithIndex`` performs) and broadcast the cumulative offsets
   back; global rank = offset[pid] + local index + 1.

The result is bit-identical to the single-task window whenever the
sort key is TOTAL (callers append a unique tie-break column, as every
query in this repo already does for determinism): range boundaries may
land anywhere without changing any rank. The partitioned relation is
``localCheckpoint``-pinned so the count pass and the rank pass see the
same (sampled, hence otherwise non-deterministic) partitioning.

``global_ntile`` derives NTILE(k) from the rank with the SQL-standard
bucket arithmetic (n = bs*k + rem; the first rem buckets get bs+1
rows), so exact quantile scoring needs no global window either — and
unlike the percentile-boundary-binning fallback some docstrings used
to point at, it keeps the exact output contract at any scale.

Cost and crossover (measured, scripts/bench_ranking_crossover.py,
local[32], min-of-2 after warm-up, NTILE(10) + aggregate sink):

    rows        window    distributed
    50k         0.42 s    1.46 s   <- fixed jobs dominate
    500k        0.68 s    1.19 s
    5M          7.84 s    1.49 s   <- 5.3x: the single task is the wall
    20M         29.8 s    13.2 s

The primitive pays ~1 s of fixed work (eager checkpoint, offsets
collect, broadcast join) and wins past ~1M input rows on 32 cores —
below that the single-task sort is cheaper. That is why the three
aggregate-sized production sites (events RFM quintiles ~20k users,
surprisal deciles ~50k docs, PPJoin sid ~20k shingles) measured the
swap and REJECTED it (numbers at each site, PERFORMANCE.md round 11):
their docstrings point here for the mechanical swap the moment the
aggregate cardinality crosses ~1M.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PID = "_gr_pid"
_MID = "_gr_mid"
_BASE = "_gr_base"
_OFF = "_gr_off"


def _ranked(
    df: DataFrame,
    order_cols: list[Column],
    out: str,
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """df + a 1-based global row number ``out`` in ``order_cols`` order
    (which must be total — include a unique tie-break), plus the total
    row count (a free by-product of the offset pass)."""
    spark = df.sparkSession
    n_parts = int(
        num_partitions
        or spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    tagged = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .withColumn(_MID, F.monotonically_increasing_id())
        .localCheckpoint()  # pin the sampled range boundaries + ids
    )
    # <= n_parts rows: bounded by cluster configuration, not by data —
    # the same driver-side counts pass RDD.zipWithIndex performs.
    parts = tagged.groupBy(_PID).agg(
        F.count("*").alias("c"), F.min(_MID).alias("b")
    ).collect()
    rows, acc = [], 0
    for r in sorted(parts, key=lambda r: r[_PID]):
        rows.append((r[_PID], r["b"], acc))
        acc += r["c"]
    offsets = spark.createDataFrame(
        rows, f"{_PID} int, {_BASE} long, {_OFF} long"
    )
    ranked = (
        tagged.join(F.broadcast(offsets), _PID)
        .withColumn(
            out,
            (F.col(_OFF) + (F.col(_MID) - F.col(_BASE)) + F.lit(1)).cast(
                "long"
            ),
        )
        .drop(_PID, _MID, _BASE, _OFF)
    )
    return ranked, acc


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed ``ROW_NUMBER() OVER (ORDER BY order_cols)`` — see
    module docstring. ``order_cols`` must be a total order."""
    ranked, _ = _ranked(df, order_cols, out, num_partitions)
    return ranked


def _floor_div(c: Column, d: int) -> Column:
    """Exact integer floor-division of a non-negative long column by a
    positive literal — stays in longs (no double rounding past 2^53)."""
    return ((c - (c % F.lit(d))) / F.lit(d)).cast("long")


def global_ntile(
    df: DataFrame,
    k: int,
    order_cols: list[Column],
    out: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed ``NTILE(k) OVER (ORDER BY order_cols)`` (exact SQL
    semantics: bucket sizes differ by at most one, larger buckets
    first). ``order_cols`` must be a total order."""
    rn_col = f"_gr_rn_{out}"
    ranked, n = _ranked(df, order_cols, rn_col, num_partitions)
    bs, rem = divmod(n, k)
    rn = F.col(rn_col)
    if bs == 0:
        # n < k: tiles 1..n, one row each
        tile = rn
    else:
        cut = rem * (bs + 1)
        tile = F.when(
            rn <= F.lit(cut), _floor_div(rn - 1, bs + 1) + 1
        ).otherwise(F.lit(rem) + _floor_div(rn - F.lit(cut) - 1, bs) + 1)
    return ranked.withColumn(out, tile.cast("long")).drop(rn_col)
