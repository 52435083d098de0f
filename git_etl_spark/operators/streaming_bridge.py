"""Streaming-as-a-query bridge — SURVEY.md §2.10 X7.

Registers the *actual Structured Streaming pipeline* as a driver-
checkable query: the events table is replayed through a file-source
stream with ``trigger(availableNow=True)`` into an in-memory table,
and the result is returned as a batch DataFrame. Its oracle is the
same SQL as the batch twin — so the streaming engine's windowed
aggregation is held to the exact same DuckDB hash-match as every
batch operator (not just a rows-only smoke check).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query
from ..streaming.events_stream import hourly_counts


@query(
    "streaming_hourly_agg_replay",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_bucket, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def streaming_hourly_agg_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window streaming aggregation, replayed deterministically:
    events → parquet file stream → watermarked 1-hour window
    (streaming/events_stream.py) → complete-mode memory sink. With
    ``availableNow`` every event is processed before the query stops,
    so the streaming result must equal the batch group-by bit-for-bit —
    which the DuckDB oracle then verifies."""
    events = load_table(spark, sf_dir, "events")
    run_id = uuid.uuid4().hex[:8]
    src_dir = os.path.join(tempfile.gettempdir(), f"ges-stream-{run_id}")
    events.repartition(4).write.parquet(src_dir)

    stream = spark.readStream.schema(events.schema).parquet(src_dir)
    name = f"stream_hourly_{run_id}"
    # Streaming aggregations ignore AQE: every micro-batch commits one
    # state-store instance per shuffle partition, so the session's 32
    # partitions mean 32 HDFSBackedStateStore snapshots per trigger for
    # a result of a few hundred groups. Pin the stateful shuffle to 4
    # partitions for this bounded replay and restore the session conf
    # after — on a real cluster this knob is sized to state volume, not
    # to the batch default.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            hourly_counts(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    # materialize the sink contents so the temp table/dir can be dropped
    result = spark.table(name).select(
        "hour_bucket", "event_type", "n", "sum_value"
    )
    rows = result.collect()
    spark.catalog.dropTempView(name)
    shutil.rmtree(src_dir, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema)
