"""Order-independent exact aggregation helpers.

Distributed double summation is non-associative: two engines summing the
same values in different orders differ by ~1e-8, and money sums land
EXACTLY on half-cents, so ``ROUND(sum, 2)`` can flip between engines.
The testdata's money columns are exact fixed-point (2dp prices/
discounts/taxes → 4-6dp products), which admits an exact path.

Spark side: quantize each row to integer units (``round(x·10^s)`` as
long — unambiguous, the double is within 1e-9 of the true fixed-point
value), SUM the longs (vectorized, order-independent, fits 2^63 with
~15 digits of headroom), round to the output scale in *integer* math,
and divide back to double (correctly-rounded IEEE division).

Oracle twin (DuckDB): ``CAST(ROUND(SUM(CAST(x AS DECIMAL(38,s))), r) AS
DOUBLE)`` — an exact decimal sum of the same per-row values, so both
engines produce the identical double. (DuckDB's decimal→decimal CAST
truncates; always ROUND there.)

Long sums keep the aggregation inside whole-stage codegen — Spark's
DECIMAL(38,·) sums fall off the vectorized path and cost ~15% extra
wall time on the TPC-H Q1 shape.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def _units(col, scale_in: int):
    if not hasattr(col, "cast"):
        col = F.col(col)
    return F.round(col * (10**scale_in), 0).cast("long")


def dsum(col, scale_in: int = 4, round_to: int = 2):
    """Exact fixed-point SUM of a double column → double rounded to
    ``round_to`` decimals (half away from zero, like both engines'
    decimal ROUND)."""
    s = F.sum(_units(col, scale_in))
    k = 10 ** (scale_in - round_to)
    if k == 1:
        r = s
    else:
        half = k // 2
        mag = F.floor((F.abs(s) + half) / F.lit(float(k)))  # integer half-up
        r = F.when(s < 0, -mag).otherwise(mag)
    return (r / F.lit(float(10**round_to))).cast("double")


def dsum_raw(col, scale_in: int = 4):
    """Exact fixed-point SUM → double, unrounded (for ratios of sums)."""
    return (F.sum(_units(col, scale_in)) / F.lit(float(10**scale_in))).cast("double")
