"""Deterministic aggregate helpers.

Floating-point SUM/AVG is order-dependent; Spark's partial/final
aggregation tree and DuckDB's serial scan sum in different orders, so
raw double aggregates differ in the last bits and fail a value-hash
compare. These helpers route float aggregation through DECIMAL (exact,
order-independent) and cast the *final* value back to double — both
engines then produce the identical bit pattern.

At 100 TB this is also the right call for money-like columns: decimal
partial aggregates stay in Tungsten unsafe rows and whole-stage
codegen; there is no Python round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Exact SUM of a double column via decimal; result as double.

    Oracle-side twin: ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided in double.

    Oracle-side twin:
    ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double") / F.count(c)


def count_if(cond: Column) -> Column:
    """COUNT_IF as a LongType column (reference README.md:92 pattern:
    ``SUM(CASE WHEN ... THEN 1 ELSE 0 END)``)."""
    return F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).cast("long")


def qsum(expr: Column, scale: int = 8) -> Column:
    """Exact SUM of a DERIVED double expression (a product like
    ``price·(1−discount)``), quantized identically in both engines.

    ``dsum``'s per-row double→DECIMAL cast is engine-dependent for
    derived values: Spark casts via the double's SHORTEST decimal
    representation (java BigDecimal.valueOf) while DuckDB rounds the
    exact binary value — for a product whose binary noise (~1 ulp,
    ~2e-13 relative) lands within that gap of a decimal-grid midpoint
    the two engines round OPPOSITE ways. Probability ~4e-5 per row at
    scale 8: invisible at sf0.01, ~20 rows across sf0.1's 600k-row
    lineitem — found by the round-7 full sf0.1 parity sweep as 1-ulp
    mismatches in tpch_q1 and the Pearson moments.

    Fix: quantize with pure IEEE arithmetic BOTH engines execute
    identically — ``floor(x·10^s + 0.5)`` (exact for |x·10^s| < 2^53)
    — sum the resulting integers exactly in DECIMAL(38,0) (DuckDB:
    HUGEINT), and reconstruct the final double through the
    sign/hi/lo split from functions/vector.py rather than the engines'
    native wide-int→double casts: DuckDB composes HUGEINT→DOUBLE from
    two word conversions, which is NOT correctly rounded once the unit
    sum passes 2⁶³ (observed: identical 2.2e19 unit sums converting to
    doubles 1 ulp apart), while the split path is exact-operand
    arithmetic in both engines.

    Input bound (guarded): ``|x| < (2⁶³ − 2) / 10ˢ`` — ~9.2e10 at the
    default scale 8. Beyond it ``floor``'s LongType result SATURATES to
    Long.MAX silently (even under ANSI — measured on Spark 4.1) while
    DuckDB's ``CAST(... AS BIGINT)`` raises, so an out-of-range row
    would diverge silently instead of failing loudly. The in-plan
    ``assert_true`` below turns that into a job failure naming the
    offending value; it is a per-row abs+compare that stays inside
    whole-stage codegen (~free next to the multiply it guards).
    Separately, quantization is a FAITHFUL rounding of x only while
    ``|x·10ˢ| < 2⁵³`` (~9e7 at scale 8): past that the decimal grid is
    coarser than one double ulp — still cross-engine *identical* (both
    engines compute the same IEEE product), just no longer the nearest
    grid point to x. Callers aggregating values above ~1e7 should drop
    ``scale`` accordingly.

    Oracle-side twin: :func:`duck_qsum` (DuckDB's BIGINT cast raises on
    overflow natively, so only the Spark side needs the guard).
    """
    from .vector import dec_scaled_to_double

    bound = (2.0**63 - 2.0) / float(10**scale)
    # NULL rows pass the guard and quantize to NULL, so SUM skips them
    # — standard SQL aggregate semantics, matching duck_qsum's SUM
    # (without the isNull arm, abs(NULL) < bound is NULL and
    # assert_true(NULL) kills the job with a NULL-concat message: the
    # Spark side would crash on data the oracle silently aggregates)
    ok = F.assert_true(
        expr.isNull() | (F.abs(expr) < F.lit(bound)),
        F.concat(
            F.lit(f"qsum: |x| >= {bound:.6g} exceeds the exact long "
                  f"quantization range at scale {scale}; got "),
            expr.cast("string"),
        ),
    )
    q = F.floor(expr * F.lit(float(10**scale)) + F.lit(0.5))
    # assert_true is NULL whenever it does not raise; the when() keeps
    # it in the plan without changing q's value or nullability path.
    q = F.when(ok.isNull(), q)
    return dec_scaled_to_double(
        F.sum(q.cast("decimal(38,0)")), float(10**scale)
    )


def duck_qsum(expr: str, scale: int = 8) -> str:
    """DuckDB twin of :func:`qsum` (SUM(BIGINT) widens to HUGEINT —
    exact; the hi/lo-split reconstruction matches Spark's bit for
    bit where a plain ``CAST(... AS DOUBLE)`` of a >2⁶³ HUGEINT
    would not)."""
    from .vector import duck_dec_scaled_to_double

    return duck_dec_scaled_to_double(
        f"SUM(CAST(floor(({expr}) * 1e{scale} + 0.5) AS BIGINT))",
        f"1e{scale}",
    )
