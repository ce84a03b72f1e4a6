"""Map-type functions + pandas UDAF (grouped aggregate) — the last two
SURVEY.md §2.B scalar/UDF rows.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from icebergplus_spark.registry import register
from icebergplus_spark.session import prepare_session
from icebergplus_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q39 — map functions: JSON → map, keys/values/size/element access
# ---------------------------------------------------------------------------
@register(
    "q39_map_funcs",
    oracle="""
SELECT event_id,
       CAST(len(json_keys(props)) AS INTEGER)            AS n_keys,
       CAST(json_keys(props)[1] AS VARCHAR)              AS first_key,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
FROM events
WHERE event_id % 50 = 0
""",
)
def q39_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 50 == 0)
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.element_at(m, "k").alias("k_val"),
    )


# ---------------------------------------------------------------------------
# q58 — pandas UDAF (grouped aggregate): exact integer-units sum inside
# the UDAF (numpy int64) so the result is oracle-exact despite crossing
# into Python
# ---------------------------------------------------------------------------
@register(
    "q58_pandas_udaf",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY l_returnflag
""",
)
def q58_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def cents_sum(prices: pd.Series) -> int:
        import numpy as np

        # quantize to integer cents then exact int64 sum — same
        # determinism contract as functions/exact.py, in Python
        return int(np.rint(prices.to_numpy() * 100).astype("int64").sum())

    @pandas_udf("long")
    def n_rows(prices: pd.Series) -> int:
        return len(prices)  # pandas UDAFs can't mix with JVM aggregates

    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        cents_sum("l_extendedprice").alias("price_cents"),
        n_rows("l_extendedprice").alias("n_lines"),
    )
