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


# ---------------------------------------------------------------------------
# q125 — text source round-trip (the last built-in file source in the
# matrix: parquet / csv / json / orc / binaryFile / text). Documents
# are written one per line with a tab-separated id prefix and read back
# with spark.read.text (whole line as one string column) — the raw-line
# ingestion path every scraped-text pipeline starts from. The oracle
# recomputes the same aggregate straight from the source table, so a
# hash match proves line-level round-tripping is byte-lossless for the
# single-line corpus (newline-free by construction).
# ---------------------------------------------------------------------------
@register(
    "q125_text_roundtrip",
    oracle="""
SELECT CAST(doc_id % 7 AS BIGINT) AS bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_id
FROM documents
GROUP BY doc_id % 7
""",
)
def q125_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="text_rt_")
    docs.select(
        F.concat_ws("\t", F.col("doc_id"), F.col("text")).alias("value")
    ).write.mode("overwrite").text(out)
    lines = spark.read.text(out)
    parsed = lines.select(
        F.split_part(F.col("value"), F.lit("\t"), F.lit(1))
        .cast("long")
        .alias("doc_id"),
        F.substring_index(F.col("value"), "\t", -1).alias("text"),
    )
    return parsed.groupBy((F.col("doc_id") % 7).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.min("doc_id").alias("min_id"),
    )


# ---------------------------------------------------------------------------
# q133 — AVRO round-trip under the oracle gate. Neither spark-avro nor
# any Python avro package ships in this image, so the engine carries
# its own Object Container File codec implemented from the public Avro
# 1.12 spec (sources/avro_io.py), cross-validated byte-level against
# the JVM reference implementation (avro-1.12.1.jar) in
# tests/test_avro.py. Both paths are distributed: the sink encodes one
# OCF per partition via mapInPandas, the source decodes per-file on
# executors. The hash match proves the binary encoding round-trips the
# typed subset (longs, strings, doubles, nullable unions) losslessly.
# ---------------------------------------------------------------------------
@register(
    "q133_avro_roundtrip",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS sum_price
FROM orders
GROUP BY o_orderstatus
""",
)
def q133_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergplus_spark.functions.exact import dsum
    from icebergplus_spark.sources.avro_io import (
        read_avro_dataset,
        write_avro_dataset,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = tempfile.mkdtemp(prefix="avro_rt_") + "/orders_avro"
    write_avro_dataset(orders, path)
    back = read_avro_dataset(spark, path, orders.schema)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").alias("key_sum"),
        dsum("o_totalprice", 2).alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# q147 — XML source/sink round-trip (Spark 4 NATIVE xml format; closes
# the remaining built-in file source: parquet / csv q52 / json q53 /
# orc q79 / avro q133 / text q125 / binaryFile m-family / xml here).
# Distributed on both sides: the writer emits one XML document per
# partition, the reader parses rowTag elements in parallel. Types
# survive via an explicit read schema, so the aggregate is engine-exact.
# ---------------------------------------------------------------------------
@register(
    "q147_xml_roundtrip",
    oracle="""
SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
       COUNT(*) AS n_nations,
       CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
       MIN(n_name) AS first_name
FROM nation
GROUP BY n_regionkey
""",
)
def q147_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = tempfile.mkdtemp(prefix="xml_rt_") + "/nation_xml"
    (
        nation.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "nations")
        .option("rowTag", "nation")
        .save(path)
    )
    back = (
        spark.read.schema("n_nationkey long, n_name string, n_regionkey long")
        .format("xml")
        .option("rowTag", "nation")
        .load(path)
    )
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.sum("n_nationkey").alias("key_sum"),
        F.min("n_name").alias("first_name"),
    )


# ---------------------------------------------------------------------------
# q148 — from_xml semistructured parsing: an XML payload column
# (synthesized from orders so the oracle can state the expected result
# relationally) parsed back into typed fields with a schema — the XML
# face of the JSON q33/q81 family. Parsing is a Catalyst expression
# (JVM-side, codegen), not a UDF.
# ---------------------------------------------------------------------------
@register(
    "q148_xml_parse",
    oracle="""
SELECT o_orderstatus AS status,
       COUNT(*) AS n,
       CAST(SUM(o_custkey) AS BIGINT) AS cust_sum,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS price_sum
FROM orders
WHERE o_orderkey % 7 = 0
GROUP BY o_orderstatus
""",
)
def q148_xml_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergplus_spark.functions.exact import dsum

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    payload = orders.select(
        F.concat(
            F.lit("<order><custkey>"),
            F.col("o_custkey"),
            F.lit("</custkey><status>"),
            F.col("o_orderstatus"),
            F.lit("</status><total>"),
            F.col("o_totalprice").cast("decimal(38,2)").cast("string"),
            F.lit("</total></order>"),
        ).alias("xml")
    )
    parsed = payload.select(
        F.from_xml(
            "xml",
            "custkey BIGINT, status STRING, total DECIMAL(38,2)",
        ).alias("o")
    ).select("o.custkey", "o.status", "o.total")
    return parsed.groupBy(F.col("status")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("custkey").alias("cust_sum"),
        F.round(F.sum("total"), 2).cast("double").alias("price_sum"),
    )
