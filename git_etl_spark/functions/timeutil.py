"""Session-timezone-independent time helpers.

The corpus's parquet timestamps read as TIMESTAMP_NTZ, but two common
idioms silently reintroduce the session timezone — under a non-UTC
session (the driver's, not ours) they shift values and break oracle
parity:

- ``unix_timestamp(ntz)`` interprets the NTZ value in the session tz;
- ``lit("...").cast("timestamp")`` builds a TZ-aware literal that
  coerces the NTZ comparison.

These helpers stay in pure NTZ arithmetic instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def epoch_sec(col: Column | str) -> Column:
    """Seconds since epoch of an NTZ timestamp, timezone-free
    (floor semantics — matches DuckDB FLOOR(epoch(ts)))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(
        F.timestamp_diff("MICROSECOND", F.expr(_EPOCH_NTZ), c) / 1_000_000
    ).cast("long")


def ts_ntz(literal: str) -> Column:
    """A TIMESTAMP_NTZ literal for comparisons against NTZ columns."""
    return F.lit(literal).cast("timestamp_ntz")


def trunc_hour_ntz(col: Column | str) -> Column:
    """Hour truncation that PRESERVES TIMESTAMP_NTZ. Spark's
    ``date_trunc`` coerces NTZ to a session-tz timestamp (observed:
    buckets shift under a non-UTC session); rebuilding via
    ``make_timestamp_ntz`` keeps wall-clock semantics — matching
    DuckDB's naive ``date_trunc``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.make_timestamp_ntz(
        F.year(c), F.month(c), F.dayofmonth(c), F.hour(c), F.lit(0), F.lit(0)
    )


def ntz_to_instant(col: Column | str) -> Column:
    """NTZ wall time → TIMESTAMP instant, reading the wall time as UTC.
    Pure epoch arithmetic: tz-conversion functions (to_utc_timestamp)
    coerce NTZ through the *session* tz first, double-shifting under a
    non-UTC session. Needed where Spark requires a real timestamp
    (streaming watermarks)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_micros(
        F.timestamp_diff("MICROSECOND", F.expr(_EPOCH_NTZ), c)
    )


def instant_to_ntz(col: Column | str) -> Column:
    """Inverse of ntz_to_instant: TIMESTAMP instant → its UTC wall time
    as TIMESTAMP_NTZ (epoch arithmetic, session-tz-free)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_add("MICROSECOND", F.unix_micros(c), F.expr(_EPOCH_NTZ))
