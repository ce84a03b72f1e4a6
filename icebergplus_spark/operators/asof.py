"""As-of join — a custom operator Spark lacks (SURVEY.md §2.B "as-of").

Implemented as the scalable union-sort trick, NOT a range-exploded join:

1. Union right-side "state" rows with left-side "probe" rows on a common
   (key, time) axis; right rows carry their payload, left rows carry null.
2. One shuffle+sort per key on (time, side, tiebreak); ``last(payload,
   ignorenulls=True)`` over the running frame gives each probe row the
   most recent right row at-or-before its timestamp.

Cost: ONE shuffle of |L|+|R| rows — no L×R candidate blow-up, so it
survives 100 TB fact-to-fact as-of joins where a range join would
explode. Window-partition skew (one hot key) is the scale risk; callers
with skewed keys should pre-bucket time into the key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
    how: str = "inner",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row on the same key:
    ``direction='backward'`` → latest right with ``right_ts <= left_ts``;
    ``direction='forward'``  → earliest right with ``right_ts >= left_ts``.

    ``tiebreak``: right-side column ordering ties on equal ``right_ts``
    (the row nearest in the scan order wins) — REQUIRED for
    deterministic results when right rows can share a timestamp.
    ``how``: 'inner' drops unmatched left rows, 'left' keeps them with
    null payload. ``tolerance_seconds``: matches farther than this from
    the probe time are discarded (pandas.merge_asof tolerance parity).
    """
    if direction == "forward":
        # reflect time: forward as-of == backward as-of on negated axis
        neg = lambda df, c: df.withColumn(  # noqa: E731
            "__asof_negts", -F.col(c).cast("double")
        )
        out = asof_join(
            neg(left, left_ts),
            neg(right, right_ts),
            left_key,
            right_key,
            "__asof_negts",
            "__asof_negts",
            payload_cols,
            tiebreak=tiebreak,
            how=how,
            direction="backward",
            tolerance_seconds=tolerance_seconds,
        )
        return out.drop("__asof_negts")
    if direction != "backward":
        raise ValueError(f"asof_join: unsupported direction={direction!r}")
    # Pack the right payload into one struct so a single last() resolves
    # all columns consistently (no column-wise tearing between ties).
    # The matched right timestamp rides along for tolerance checks.
    payload = F.struct(
        *[F.col(c) for c in payload_cols],
        F.col(right_ts).cast("double").alias("__asof_rts"),
    ).alias("__asof_payload")
    r = right.select(
        F.col(right_key).alias("__asof_key"),
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias("__asof_side"),  # right rows sort before left at equal ts
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__asof_tie"),
        payload,
    )
    left_cols = left.columns
    l = left.select(
        F.col(left_key).alias("__asof_key"),
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias("__asof_side"),
        F.lit(None).cast(r.schema["__asof_tie"].dataType).alias("__asof_tie"),
        F.lit(None).cast(r.schema["__asof_payload"].dataType).alias("__asof_payload"),
        *[F.col(c) for c in left_cols],
    )
    w = (
        Window.partitionBy("__asof_key")
        .orderBy("__asof_ts", "__asof_side", "__asof_tie")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = r.unionByName(l, allowMissingColumns=True)
    out = (
        matched.withColumn("__asof_match", F.last("__asof_payload", ignorenulls=True).over(w))
        .filter(F.col("__asof_side") == 1)  # keep probe rows only
        .select(*left_cols, F.col("__asof_ts"), F.col("__asof_match"))
    )
    if tolerance_seconds is not None:
        # distance from probe to match (≥0 by construction on this axis)
        dist = F.col("__asof_ts").cast("double") - F.col("__asof_match.__asof_rts")
        out = out.withColumn(
            "__asof_match",
            F.when(dist <= float(tolerance_seconds), F.col("__asof_match")),
        )
    if how == "inner":
        out = out.filter(F.col("__asof_match").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join: unsupported how={how!r}")
    # Unpack payload struct back to named columns.
    for c in payload_cols:
        out = out.withColumn(c, F.col(f"__asof_match.{c}"))
    return out.drop("__asof_match", "__asof_ts")
