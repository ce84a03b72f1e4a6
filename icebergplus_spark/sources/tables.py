"""Parquet table sources over the driver's testdata layout.

Mirrors the reference's scan entry points (``Catalog.loadTable`` +
``IcebergGenerics.read``, LocalIcebergCatalogTest.java:76,145-153) as
plain Spark parquet reads: Catalyst handles file listing, predicate
pushdown, column pruning and vectorized decode (SURVEY.md §3.3).

Scale notes: reads stay declarative (``spark.read.parquet``) so a
100 TB table with Hive-style partitions gets partition pruning for
free; nothing here collects to the driver.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# All driver-generated tables (TESTDATA.md).
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables — always broadcast-join candidates at any scale.
DIM_TABLES = {"region", "nation", "supplier", "part", "customer"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame.

    ``events.ts`` is parquet TIMESTAMP(NANOS): Spark reads it as long
    (legacy nanosAsLong conf, set in prepare_session) and we truncate to
    microseconds — the same truncation DuckDB's µs timestamp applies, so
    oracle values agree.
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer `div`, not `/`: ns values exceed double's 2^53 precision
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register testdata tables as temp views for spark.sql queries."""
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
