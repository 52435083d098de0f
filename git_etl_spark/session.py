"""SparkSession factory.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default all cores);
the configuration below is chosen so the *same* logical plans deploy
unchanged to a large cluster:

- AQE on: runtime partition coalescing, skew-join splitting, and
  dynamic join-strategy switching replace hand-tuned shuffle counts
  at 100 TB (a static ``shuffle.partitions`` can never be right for
  both a 60 k-row test and a 100 TB table).
- ``spark.sql.session.timeZone=UTC``: timestamps behave identically
  across driver, executors, and the DuckDB oracle.
- Arrow enabled: every pandas_udf / applyInPandas / toPandas crossing
  is Arrow-batched, never row-at-a-time pickled.
- Broadcast threshold left at default (10 MB) and AQE may upgrade
  joins at runtime; dimension tables (region/nation/customer at test
  scale) broadcast automatically, and code hints ``F.broadcast`` where
  a side is known-small by construction.
"""

from __future__ import annotations

import os
from contextlib import contextmanager as _contextmanager

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "git-etl-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or ``*``. Shuffle
    partitions default to 2×cores locally; on a real cluster AQE
    coalesces from ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``
    so this initial value is a ceiling, not a tuning knob.
    """
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(8, 2 * int(cpus))
        except (TypeError, ValueError):
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Explicitly pinned (it is the Spark 4 default): ANSI mode is
        # the no-silent-wrap property — out-of-domain numerics (the
        # hostile-corpus survey, PERFORMANCE.md round 12) fail LOUDLY
        # as ArithmeticException instead of wrapping into silently
        # wrong aggregates. At 100 TB a killed stage is recoverable; a
        # wrapped sum is not.
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet stores TIMESTAMP(NANOS); Spark has no nanosecond
        # timestamp type, so read as long and convert in io.load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local mode puts executors in the driver JVM: shuffle blocks +
        # localCheckpoint storage for the iterative operators live here
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "10m")
        # Every distinct query compiles fresh whole-stage-codegen
        # classes; a multi-hundred-query session fills the JVM's
        # default ~240 MB reserved code cache (116 MB profiled-nmethod
        # heap), and the JIT's code-cache sweeping then flushes warm
        # methods — measured: tpch_q18 best-of-2 degraded 1.47 s →
        # 1.87 s after 100 prior queries under the default, and
        # recovered exactly with this raise (PERFORMANCE.md round 7).
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def memo_disabled() -> bool:
    """True when ``SPARK_GRAFT_DISABLE_MEMO`` is set to a non-empty
    value other than ``0`` — a measurement knob that bypasses every
    intra-session result memo (pagerank fixpoint, dedup pair graphs,
    BPE merge table, streaming replay source) so each query call is a
    full per-solve run.

    The memos model real production sharing (one converged artifact,
    several consuming surfaces) and stay ON for bench and the driver —
    but a SCALE measurement of a memoized query in a session that
    already ran it measures the cache hit, not the solve (the r11
    cores-screen blind spot: pagerank/BPE/cluster readings were memo
    hits — PERFORMANCE.md round 11). Sites gate only the memo GET and
    PUT on this flag; keys, invalidation, and default behavior are
    unchanged."""
    return os.environ.get("SPARK_GRAFT_DISABLE_MEMO", "0") not in ("", "0")


def iter_checkpoint(df, eager: bool = True):
    """Per-round lineage cut for iterative operators.

    ``localCheckpoint`` stores blocks on executors — fast, but lost
    with an executor, which kills a long-running iterative job on a
    real cluster. The knob is the standard Spark one: when the caller
    has set a reliable checkpoint location
    (``spark.sparkContext.setCheckpointDir(...)`` pointing at HDFS/S3),
    every round checkpoints reliably; otherwise the local fast path is
    used (the right default for local[] testing and short loops).
    All iterative operators (min-label / Large-Star–Small-Star
    components, PageRank, IVF Lloyd rounds) route their round
    materialization through here, so one ``setCheckpointDir`` call
    flips the whole engine — see DEPLOYMENT.md.

    ``eager=False`` defers materialization to the caller's next action
    — loops that immediately run a convergence-signature aggregate
    over the round output pass False so checkpoint + signature are ONE
    job per round instead of two (the driver-planning/job-overhead tax
    measured on the iterative families)."""
    spark = df.sparkSession
    if spark.sparkContext.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


@_contextmanager
def loop_shuffle_partitions(
    spark: SparkSession, n_rows: int, rows_per_partition: int = 500_000
):
    """Run an iterative loop's rounds under a shuffle-partition count
    proportional to the loop's working set (~1 per 500k rows, capped at
    the session parallelism).

    Iterative DataFrame algorithms (label propagation, PageRank) pay a
    per-round fixed cost ∝ shuffle partitions: task launch, AQE
    planning, checkpoint materialization. Once the working set is
    materialized its size is known, so the round can be sized to the
    data — a few thousand edges run as single-task rounds, while at
    100 TB the same formula scales back to full parallelism. The
    session default is restored on exit, so only the loop's own
    shuffles are affected.

    CONTRACT: results must be *materialized inside the scope* (every
    call site ends rounds in an eager iter_checkpoint/localCheckpoint).
    A lazily-returned plan would execute after exit under the restored
    session setting — silently losing the sizing this context exists
    to apply.
    """
    parts = max(
        1,
        min(
            spark.sparkContext.defaultParallelism,
            n_rows // rows_per_partition + 1,
        ),
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        yield parts
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
