"""UDF-surface tests: approx distinct accuracy; grouped pandas matches
the declarative twin computed in-test."""

import pyspark.sql.functions as F

from icebergplus_spark.registry import QUERIES, load_all

load_all()


def test_approx_distinct_within_5pct(spark, sf_dir):
    for r in QUERIES["q57_approx_distinct"](spark, sf_dir).collect():
        err = abs(r["approx_parts"] - r["exact_parts"]) / max(r["exact_parts"], 1)
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
        for a, e in [("approx_median", "exact_median"), ("approx_p99", "exact_p99")]:
            rel = abs(r[a] - r[e]) / max(abs(r[e]), 1e-9)
            assert rel < 0.02, f"{r['l_returnflag']} {a}: rel err {rel:.4f}"
