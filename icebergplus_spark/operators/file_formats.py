"""CSV / JSON source-sink round-trips (SURVEY.md §2.B "CSV/JSON scan").

Each query writes a slice of testdata out in the text format and reads
it back with an explicit schema (never inference for managed data —
SURVEY.md §1.3), then aggregates; the oracle aggregates the original
parquet. Identical results prove the format round-trip is lossless for
the typed subset used. Only integer/string columns ride through text
formats here — float round-tripping through decimal strings is
format-version-dependent and belongs in parquet.
"""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from icebergplus_spark.registry import register
from icebergplus_spark.session import prepare_session
from icebergplus_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, name)


@register(
    "q52_csv_roundtrip",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
FROM orders
GROUP BY o_orderstatus, o_orderpriority
""",
)
def q52_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    path = tempfile.mkdtemp(prefix="csv_rt_") + "/orders_csv"
    orders.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(
        "o_orderkey long, o_orderstatus string, o_orderpriority string"
    ).option("header", True).csv(path)
    return back.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("key_sum")
    )


@register(
    "q53_json_roundtrip",
    oracle="""
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang
""",
)
def q53_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    path = tempfile.mkdtemp(prefix="json_rt_") + "/docs_json"
    docs.write.mode("overwrite").json(path)
    back = spark.read.schema("doc_id long, lang string, n_chars long").json(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )
