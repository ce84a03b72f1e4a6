"""Order-independent exact aggregation helpers.

Distributed double summation is non-associative: two engines summing the
same values in different orders differ by ~1e-8, and money sums land
EXACTLY on half-cents, so ``ROUND(sum, 2)`` can flip between engines.
The testdata's money columns are exact fixed-point (prices/discounts/
taxes have 2dp), so products have 4-6dp: casting each row to DECIMAL at
that scale is unambiguous (the double is within 1e-9 of the true value),
the decimal SUM is exact in any order, and ROUND on the decimal is
tie-free half-up in both Spark and DuckDB.

Oracle-side twin: ``CAST(ROUND(SUM(CAST(x AS DECIMAL(38,s))), r) AS DOUBLE)``.
(DuckDB's decimal→decimal CAST truncates — always ROUND, never CAST, to
reduce scale.)
"""

from __future__ import annotations

import pyspark.sql.functions as F


def dsum(col, scale_in: int = 4, round_to: int = 2):
    """Exact decimal SUM of a fixed-point double column → rounded double."""
    if not hasattr(col, "cast"):
        col = F.col(col)
    return (
        F.round(F.sum(col.cast(f"decimal(38,{scale_in})")), round_to).cast("double")
    )


def dsum_raw(col, scale_in: int = 4):
    """Exact decimal SUM → double, unrounded (for ratios of sums)."""
    if not hasattr(col, "cast"):
        col = F.col(col)
    return F.sum(col.cast(f"decimal(38,{scale_in})")).cast("double")
