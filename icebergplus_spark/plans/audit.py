"""Plan-audit utilities: programmatic checks over physical plans so
operators can be validated for 100 TB shape (broadcast where intended,
pushdown reaching the scan, no cartesian leaks). Used by
tests/test_plan_quality.py and available to users via
``icebergplus_spark.plans.audit``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame, finalize: bool = False) -> str:
    """Physical plan string; ``finalize=True`` runs the query so AQE's
    final plan (codegen stages, coalesced reads) is visible."""
    if finalize:
        df.count()
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@dataclass
class PlanAudit:
    has_broadcast_join: bool
    has_cartesian: bool
    has_sort_merge_join: bool
    pushed_filters: list[str]
    read_schemas: list[str]
    n_shuffles: int  # shuffle exchanges only
    n_broadcasts: int

    @property
    def shuffle_count(self) -> int:
        return self.n_shuffles


def audit(df: DataFrame) -> PlanAudit:
    plan = executed_plan(df)
    fmt = formatted_plan(df)
    pushed: list[str] = []
    reads: list[str] = []
    for part in fmt.split("PushedFilters: [")[1:]:
        pushed.append(part.split("]")[0])
    for part in fmt.split("ReadSchema: ")[1:]:
        reads.append(part.splitlines()[0])
    # "BroadcastExchange" also contains the substring "Exchange " — count
    # shuffles by their partitioning spec, not the bare word
    n_shuffles = sum(
        plan.count(f"Exchange {kind}")
        for kind in ("hashpartitioning", "rangepartitioning", "SinglePartition")
    )
    return PlanAudit(
        has_broadcast_join="BroadcastHashJoin" in plan
        or "BroadcastNestedLoopJoin" in plan,
        has_cartesian="CartesianProduct" in plan,
        has_sort_merge_join="SortMergeJoin" in plan,
        pushed_filters=pushed,
        read_schemas=reads,
        n_shuffles=n_shuffles,
        n_broadcasts=plan.count("BroadcastExchange"),
    )
