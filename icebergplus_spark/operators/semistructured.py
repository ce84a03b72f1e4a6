"""Spark 4 surface coverage: VariantType semi-structured access and the
Python DataSource V2 API.

Variant is Spark 4's open-format binary JSON (parse once, typed access
without a fixed schema) — the right store for ``events.props``-style
payloads at 100 TB because shredded access avoids per-query JSON
string parsing. The Python DataSource demonstrates the custom-connector
extension point: partition-parallel reads from any system, planned by
Spark like a native source.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from icebergplus_spark.registry import register
from icebergplus_spark.session import prepare_session
from icebergplus_spark.sources import load_table


# ---------------------------------------------------------------------------
# q81 — variant semi-structured access: parse the JSON payload ONCE
# into a variant, then typed-path extraction feeds an ordinary
# aggregate. (q33 does the same via string JSON functions — this is
# the parse-once columnar path.)
# ---------------------------------------------------------------------------
@register(
    "q81_variant_semistructured",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(props::JSON->>'k' AS INTEGER)) AS BIGINT) AS k_sum,
       CAST(MAX(CAST(props::JSON->>'k' AS INTEGER)) AS INTEGER) AS k_max
FROM events
GROUP BY event_type
""",
)
def q81_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    ev = load_table(spark, sf_dir, "events")
    # try_parse_json: malformed payloads become NULL instead of failing
    # the job (parse_json is FAILFAST — one bad record kills the scan)
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("k_sum"),
            F.max("k").alias("k_max"),
        )
    )


# ---------------------------------------------------------------------------
# q82 — custom Python data source (Spark 4 DataSource V2 Python API):
# a deterministic partitioned generator source, registered and read
# like any format. Each partition yields its own id range, so the scan
# parallelizes exactly like a native source — the pattern any custom
# connector (REST pagination, message queue, bespoke file format)
# plugs into.
# ---------------------------------------------------------------------------
N_ROWS = 10_000
N_PARTS = 8


def _register_detrange(spark: SparkSession) -> None:
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class DetRangeReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", N_ROWS))
            self.parts = int(options.get("parts", N_PARTS))

        def partitions(self):
            return [InputPartition(i) for i in range(self.parts)]

        def read(self, partition):
            pid = partition.value
            # contiguous slices: partition i owns [lo, hi)
            lo = pid * self.n // self.parts
            hi = (pid + 1) * self.n // self.parts
            for i in range(lo, hi):
                yield (i, i % 97, float(i) * 0.5)

    class DetRangeSource(DataSource):
        @classmethod
        def name(cls):
            return "detrange"

        def schema(self):
            return "id long, bucket long, half double"

        def reader(self, schema):
            return DetRangeReader(self.options)

    try:
        spark.dataSource.register(DetRangeSource)
    except Exception:
        pass  # already registered in this session


@register(
    "q82_python_datasource",
    oracle="""
SELECT CAST(bucket AS BIGINT) AS bucket,
       COUNT(*) AS n,
       CAST(SUM(id) AS BIGINT) AS id_sum,
       CAST(ROUND(SUM(half), 1) AS DOUBLE) AS half_sum
FROM (SELECT range AS id, range % 97 AS bucket, range * 0.5 AS half
      FROM range(10000))
GROUP BY bucket
""",
)
def q82_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    _register_detrange(spark)
    df = (
        spark.read.format("detrange")
        .option("n", N_ROWS)
        .option("parts", N_PARTS)
        .load()
    )
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("id").alias("id_sum"),
        # halves are exact in binary — the sum is order-independent
        F.round(F.sum("half"), 1).alias("half_sum"),
    )
