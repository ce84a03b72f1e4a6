"""Query registry: named queries + their DuckDB oracle SQL.

The driver's correctness gate (BASELINE.md) runs every entry of
``__spark_entry__.queries()`` against ``oracle_sql()`` via DuckDB at
sf0.01 and compares row-count + schema + order-insensitive value hash.
Operator modules register here with the ``@register`` decorator; queries
without SQL-expressible semantics register with ``oracle=None`` and get
the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so its @register calls run."""
    import icebergplus_spark.operators.relational  # noqa: F401
    import icebergplus_spark.operators.relational2  # noqa: F401
    import icebergplus_spark.operators.relational3  # noqa: F401
    import icebergplus_spark.operators.clusters  # noqa: F401
    import icebergplus_spark.operators.map_udaf  # noqa: F401
    import icebergplus_spark.operators.windows  # noqa: F401
    import icebergplus_spark.operators.scalar_funcs  # noqa: F401
    import icebergplus_spark.operators.events_ops  # noqa: F401
    import icebergplus_spark.operators.dedup  # noqa: F401
    import icebergplus_spark.operators.similarity  # noqa: F401
    import icebergplus_spark.operators.textops  # noqa: F401
    import icebergplus_spark.operators.multimodal  # noqa: F401
    import icebergplus_spark.operators.sql_frontend  # noqa: F401
    import icebergplus_spark.operators.udf_surface  # noqa: F401
    import icebergplus_spark.operators.file_formats  # noqa: F401
    import icebergplus_spark.operators.tpch_suite  # noqa: F401
    import icebergplus_spark.operators.tpch_suite2  # noqa: F401
    import icebergplus_spark.operators.tpch_suite3  # noqa: F401
    import icebergplus_spark.operators.textops2  # noqa: F401
    import icebergplus_spark.operators.textops3  # noqa: F401
    import icebergplus_spark.operators.analytics2  # noqa: F401
    import icebergplus_spark.operators.semistructured  # noqa: F401
    import icebergplus_spark.operators.dedup2  # noqa: F401
    import icebergplus_spark.operators.relational4  # noqa: F401
    import icebergplus_spark.operators.analytics3  # noqa: F401
    import icebergplus_spark.operators.vector_index  # noqa: F401
    import icebergplus_spark.operators.corpus_stats  # noqa: F401
    import icebergplus_spark.operators.streaming_gate  # noqa: F401
