"""The r12 identity-projection skip in _write_data_files: an append
whose frame already carries the table's exact names and types skips the
per-column rename/cast select (pure driver-latency savings), while any
name mapping or type difference must still take the full coercion
select. These tests pin the gate's three routes."""

import tempfile

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from icebergplus_spark.lake import LocalLakeCatalog


@pytest.fixture()
def cat(spark):
    root = tempfile.mkdtemp(prefix="ident_append_")
    return LocalLakeCatalog(spark, root).start()


def _rows(t):
    return sorted(tuple(r) for r in t.scan().collect())


def test_identity_append_scan_and_stats(spark, cat):
    """Exact-schema append (the skip route): scan contents, footer
    stats, and physical column names are all intact."""
    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("s", StringType()),
        ]
    )
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, None)], schema)
    t = cat.create_table("idt.plain", schema)
    t.append(df.coalesce(1))
    assert _rows(t) == [(1, "a"), (2, "b"), (3, None)]
    [entry] = t.plan_files()
    import json

    mins = json.loads(entry["column_mins"])
    maxs = json.loads(entry["column_maxs"])
    assert mins["k"] == 1 and maxs["k"] == 3
    assert set(pq.read_schema(entry["file_path"]).names) == {"k", "s"}


def test_type_mismatch_still_coerces(spark, cat):
    """An int frame into a bigint column must take the cast route and
    land as bigint in the file (the pre-r12 coercion contract)."""
    table_schema = StructType([StructField("k", LongType())])
    t = cat.create_table("idt.coerce", table_schema)
    df = spark.createDataFrame(
        [(7,), (9,)], StructType([StructField("k", IntegerType())])
    )
    t.append(df.coalesce(1))
    [entry] = t.plan_files()
    assert str(pq.read_schema(entry["file_path"]).field("k").type) == "int64"
    assert _rows(t) == [(7,), (9,)]


def test_renamed_column_takes_mapping_route(spark, cat):
    """After rename_column the logical→physical mapping is non-identity:
    the append must write under the PHYSICAL name so old files stay
    readable, and the scan returns the logical name."""
    schema = StructType([StructField("a", LongType())])
    t = cat.create_table("idt.renamed", schema)
    t.append(spark.createDataFrame([(1,)], schema).coalesce(1))
    t.rename_column("a", "b")
    t.append(
        spark.createDataFrame(
            [(2,)], StructType([StructField("b", LongType())])
        ).coalesce(1)
    )
    assert sorted(r["b"] for r in t.scan().collect()) == [1, 2]
    phys_names = {
        n for e in t.plan_files() for n in pq.read_schema(e["file_path"]).names
    }
    assert phys_names == {"a"}  # both files under the birth-name physical col


def test_identity_append_matches_forced_select(spark, cat):
    """The skip is a pure fast path: contents and harvested stats are
    identical to an append of the same frame pushed through a cast (a
    frame whose type differs, forcing the old select route)."""
    import json

    schema = StructType(
        [StructField("k", LongType()), StructField("v", StringType())]
    )
    rows = [(i, f"v{i % 3}") for i in range(50)]
    fast = cat.create_table("idt.fast", schema)
    fast.append(spark.createDataFrame(rows, schema).coalesce(1))
    slow = cat.create_table("idt.slow", schema)
    slow.append(
        spark.createDataFrame(rows, schema)
        .withColumn("k", F.col("k").cast("int"))  # int → bigint: select route
        .coalesce(1)
    )
    assert _rows(fast) == _rows(slow)
    [fe] = fast.plan_files()
    [se] = slow.plan_files()
    for stat in ("column_mins", "column_maxs", "column_null_counts"):
        assert json.loads(fe[stat]) == json.loads(se[stat])
