"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pricing-summary query at sf0.001 (smoke).
``queries()`` / ``oracle_sql()`` — the operator battery from SURVEY.md
§2.B, registered by the modules under ``icebergplus_spark/operators/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from icebergplus_spark import registry  # noqa: E402

registry.load_all()

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["q01_pricing_summary"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query."""
    return dict(registry.ORACLES)
