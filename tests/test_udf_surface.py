"""UDF-surface tests: approx distinct accuracy; grouped pandas matches
the declarative twin computed in-test."""

import pyspark.sql.functions as F

from icebergplus_spark.registry import QUERIES, load_all

load_all()


def test_approx_distinct_within_bound(spark, sf_dir):
    # the query itself gates the 10% bound; assert it held, and check
    # the raw sketch error directly at 5% on the source data
    from icebergplus_spark.sources import load_table

    for r in QUERIES["q57_approx_distinct"](spark, sf_dir).collect():
        assert r["approx_within_10pct"], r["l_returnflag"]
    li = load_table(spark, sf_dir, "lineitem")
    rows = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("a"),
        F.countDistinct("l_partkey").alias("e"),
    ).collect()
    for r in rows:
        err = abs(r["a"] - r["e"]) / max(r["e"], 1)
        assert err <= 0.05, f"{r['l_returnflag']}: HLL error {err:.3f}"


def test_grouped_pandas_matches_window_twin(spark, sf_dir):
    from pyspark.sql import Window

    got = {
        r["c_custkey"]: r["bal_z"]
        for r in QUERIES["q54_grouped_pandas_zscore"](spark, sf_dir).collect()
    }
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    w = Window.partitionBy("c_nationkey")
    want = {
        r["c_custkey"]: r["bal_z"]
        for r in cust.select(
            "c_custkey",
            F.round(
                (F.col("c_acctbal") - F.avg("c_acctbal").over(w))
                / F.stddev_samp("c_acctbal").over(w),
                6,
            ).alias("bal_z"),
        ).collect()
    }
    assert got == want


def test_approx_percentile_close_to_exact(spark, sf_dir):
    for r in QUERIES["q59_approx_percentile"](spark, sf_dir).collect():
        assert r["median_within_1pct"], r["l_returnflag"]
        assert r["p99_within_1pct"], r["l_returnflag"]
