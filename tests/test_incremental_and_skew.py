"""Incremental (CDC-style) scans + salted-join helper + partitioned
lake tables."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from icebergplus_spark.functions.skew import salted_join
from icebergplus_spark.lake import LocalLakeCatalog

SCHEMA = StructType(
    [StructField("k", IntegerType(), True), StructField("v", StringType(), True)]
)


def test_scan_incremental_reads_only_new_commits(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.inc", SCHEMA)
    t.append(spark.createDataFrame([(1, "a")], SCHEMA))
    t.append(spark.createDataFrame([(2, "b")], SCHEMA))
    t.append(spark.createDataFrame([(3, "c")], SCHEMA))
    # consume from snapshot 1 (exclusive): only commits 2 and 3
    got = sorted(r["k"] for r in t.scan_incremental(1).collect())
    assert got == [2, 3]
    # bounded range (1, 2]
    assert sorted(r["k"] for r in t.scan_incremental(1, 2).collect()) == [2]
    # nothing new
    assert t.scan_incremental(3).count() == 0


def test_scan_incremental_skips_compaction_rewrites(spark, tmp_path):
    from icebergplus_spark.lake import compact

    cat = LocalLakeCatalog(spark, str(tmp_path / "wh2")).start()
    t = cat.create_table("db.inc2", SCHEMA)
    t.append(spark.createDataFrame([(i, "x") for i in range(5)], SCHEMA).repartition(2))
    t.append(spark.createDataFrame([(i, "y") for i in range(5, 10)], SCHEMA).repartition(2))
    compact(t)  # snapshot 3: replace (no new rows)
    t.append(spark.createDataFrame([(10, "z")], SCHEMA))  # snapshot 4
    # consumer at snapshot 2 must see ONLY the new row, not rewrites
    assert sorted(r["k"] for r in t.scan_incremental(2).collect()) == [10]


def test_partitioned_table_writes_hive_layout(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh3")).start()
    t = cat.create_table("db.parts", SCHEMA, partition_cols=["v"])
    t.append(spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], SCHEMA))
    files = t.plan_files()
    # hive-style layout: partition column in the path
    assert all("v=" in f["file_path"] for f in files)
    # partition-pruned planning: only v=a files for v = 'a'
    pruned = t.plan_files({"v": ("=", "a")})
    assert {("v=a" in f["file_path"]) for f in pruned} == {True}
    rows = sorted((r["k"], r["v"]) for r in t.scan({"v": ("=", "a")}).collect())
    assert rows == [(1, "a"), (3, "a")]


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    plain = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .count()
    )
    salted = (
        salted_join(li, orders, "l_orderkey", "o_orderkey", salt_n=8)
        .groupBy("o_orderpriority")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

def test_bin_range_join_equals_theta_join(spark):
    """Binned rewrite == naive theta join on random points/intervals,
    and the plan contains no nested-loop or cartesian operator."""
    import random

    import pyspark.sql.functions as F

    from icebergplus_spark.functions.range_join import bin_range_join

    rnd = random.Random(3)
    pts = spark.createDataFrame(
        [(i, rnd.uniform(0, 100)) for i in range(300)], "pid long, x double"
    )
    ivs = spark.createDataFrame(
        [
            (j, lo, lo + rnd.uniform(0, 15))
            for j in range(40)
            for lo in [rnd.uniform(-5, 95)]
        ],
        "iid long, lo double, hi double",
    )
    got = bin_range_join(pts, ivs, "x", "lo", "hi", bin_width=7.0)
    expected = pts.join(ivs, (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")))
    assert sorted(
        (r["pid"], r["iid"]) for r in got.select("pid", "iid").collect()
    ) == sorted((r["pid"], r["iid"]) for r in expected.select("pid", "iid").collect())
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_scan_incremental_after_partition_overwrite_emits_added_only(
    spark, tmp_path
):
    """overwrite_partitions consolidates survivors + new files into one
    manifest; incremental consumers must still see ONLY the rows the
    commit added, never the carried-over untouched partitions."""
    from pyspark.sql.types import LongType, StructType, StructField, StringType

    schema = StructType(
        [
            StructField("region", StringType(), True),
            StructField("v", LongType(), True),
        ]
    )
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.inc_dpo", schema, partition_cols=["region"])
    t.append(
        spark.createDataFrame(
            [("eu", 1), ("eu", 2), ("us", 10), ("ap", 100)], schema
        ).coalesce(1)
    )
    snap1 = t.snapshot()["snapshot_id"]
    t.overwrite_partitions(spark.createDataFrame([("eu", 7)], schema).coalesce(1))
    got = sorted((r["region"], r["v"]) for r in t.scan_incremental(snap1).collect())
    # ONLY the overwritten partition's new rows — us/ap not re-emitted
    assert got == [("eu", 7)]


def test_lake_stream_after_partition_overwrite_no_duplicates(spark, tmp_path):
    """The streaming source must not replay untouched partitions after a
    dynamic partition overwrite (same consolidated-manifest hazard as
    scan_incremental)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from icebergplus_spark.streaming.lake_source import read_lake_stream

    schema = StructType(
        [
            StructField("region", StringType(), True),
            StructField("v", LongType(), True),
        ]
    )
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.stream_dpo", schema, partition_cols=["region"])
    t.append(
        spark.createDataFrame(
            [("eu", 1), ("us", 10), ("ap", 100)], schema
        ).coalesce(1)
    )
    t.overwrite_partitions(spark.createDataFrame([("eu", 7)], schema).coalesce(1))
    q = (
        read_lake_stream(spark, t.table_dir)
        .writeStream.format("memory")
        .queryName("dpo_stream_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_dpo"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        (r["region"], r["v"])
        for r in spark.sql("SELECT region, v FROM dpo_stream_out").collect()
    )
    # initial snapshot's 3 rows + the overwrite's 1 new row; the eu=1
    # pre-image was replaced (not an append) and us/ap appear ONCE
    assert rows == [("ap", 100), ("eu", 1), ("eu", 7), ("us", 10)]
