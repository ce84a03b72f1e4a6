"""Scalable exact global rank — distributed zipWithIndex for DataFrames.

An unpartitioned ``row_number()`` window funnels EVERY row through one
partition: the executor holding it sorts (and possibly spills) the whole
dataset while the rest of the cluster idles. That is the
``WindowExec: No Partition Defined`` warning, and at 100 TB it is a
non-starter.

The exact global rank is still computable with full cluster parallelism
in two passes — the trick ``RDD.zipWithIndex`` uses, expressed in
DataFrame operations so Catalyst keeps optimizing around it:

1. ``repartitionByRange`` on the sort key → partitions hold disjoint,
   ordered key ranges (boundaries come from a sample; *where* the cuts
   land doesn't affect correctness, only balance).
2. Per-partition row counts → cumulative sum = each partition's global
   offset. The window for the cumulative sum runs over ``numPartitions``
   rows — negligible, and constant in data size.
3. Within each partition, ``row_number()`` over a window PARTITIONED by
   ``spark_partition_id()`` (parallel, no global funnel) + the offset,
   attached by a broadcast join on the partition id.

Everything stays in ONE lazy plan: the range-shuffle subplan appears
twice (rank side + counts side) and Spark's ReuseExchange collapses it,
so both sides observe identical partition boundaries.

The sort key must be a total order (include a unique tiebreaker column)
or ranks of ties would depend on partition boundaries.
"""

from __future__ import annotations

from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def with_global_rank(
    df: DataFrame,
    *order_cols: Column,
    rank_col: str = "rk",
    num_partitions: Optional[int] = None,
    zero_based: bool = False,
) -> DataFrame:
    """Append an exact global ``row_number`` ranked by ``order_cols``.

    ``order_cols`` must define a total order (add a unique id as the
    last key). Unlike ``row_number().over(Window.orderBy(...))`` this
    never materializes the dataset in a single partition: the heavy
    sort runs range-partitioned and per-partition, and only a
    numPartitions-row side table crosses stages.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *order_cols).withColumn(
        "__gr_pid", F.spark_partition_id()
    )
    counts = parted.groupBy("__gr_pid").agg(F.count(F.lit(1)).alias("__gr_cnt"))
    # Exclusive prefix sum over the (tiny) per-partition counts. The
    # constant-but-unfoldable partition key (pmod(pid,1)=0 — a plain
    # lit(0) is folded out of the spec by Catalyst) keeps WindowExec off
    # its unpartitioned path; the window sees numPartitions rows, not
    # the data.
    w_off = (
        Window.partitionBy(F.pmod(F.col("__gr_pid"), F.lit(1)))
        .orderBy("__gr_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__gr_pid",
        F.coalesce(F.sum("__gr_cnt").over(w_off), F.lit(0)).alias("__gr_off"),
    )
    w = Window.partitionBy("__gr_pid").orderBy(*order_cols)
    base = 0 if zero_based else 1
    return (
        parted.join(F.broadcast(offsets), "__gr_pid")
        .withColumn(
            rank_col, F.row_number().over(w) - 1 + F.col("__gr_off") + F.lit(base)
        )
        .drop("__gr_pid", "__gr_off")
    )
