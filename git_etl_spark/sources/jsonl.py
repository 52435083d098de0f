"""JSON-lines source with corrupt-record isolation — the distributed
form of the reference's per-row try/catch error counting
(``src/database.ts:38-63``, E12): bad rows never abort the load, they
land in a quarantine frame with the raw line preserved for replay.

Spark-native mechanics: ``PERMISSIVE`` mode with an explicit schema
plus ``columnNameOfCorruptRecord`` — malformed lines parse to all-null
rows carrying the raw text in the corrupt column; the split is then
one filter each way. No Python in the path; the JSON parser is the
JVM's vectorized one.

At 100 TB: schema is always explicit (inference is a full extra pass),
the corrupt column is dropped from the clean frame before it reaches
any shuffle, and the quarantine write is partitioned by load date so
replays are partition-scoped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl_with_quarantine(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read JSON-lines at ``path`` against ``schema``; return
    (clean, quarantine). Clean rows have the declared columns;
    quarantine rows carry only the raw offending line."""
    full_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    raw = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        # Spark requires materializing the parsed frame before the
        # corrupt column is referenced standalone
        .cache()
    )
    clean = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, quarantine
