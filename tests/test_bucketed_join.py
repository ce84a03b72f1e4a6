"""q102: bucketed co-located join must be exchange-free on both join
inputs — the layout job paid the shuffle once; the join itself reads
bucket-aligned files. This is the plan shape that makes a repeated
fact-fact join viable at 100 TB."""

import re

from icebergplus_spark import registry

registry.load_all()


def test_bucketed_join_has_no_join_exchange(spark, sf_dir):
    # At test SF the planner would broadcast the small side (also
    # correct); disabling auto-broadcast simulates the at-scale
    # decision, where bucketing must carry the join exchange-free.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = registry.QUERIES["q102_bucketed_join"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, "bucketed join should sort-merge on buckets"
    # Exactly one exchange total: the final groupBy(c_mktsegment). The
    # join inputs ride bucket metadata, not a shuffle.
    exchanges = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    assert len(exchanges) == 1, f"unexpected exchanges: {exchanges}"
    assert "c_mktsegment" in exchanges[0]
    # bucket pruning metadata visible on both scans
    assert plan.count("Bucketed: true") == 2


def test_bucketed_join_matches_plain_join(spark, sf_dir):
    from icebergplus_spark.sources import load_table

    got = {
        r.c_mktsegment: (r.n_orders, r.revenue)
        for r in registry.QUERIES["q102_bucketed_join"](spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    import pyspark.sql.functions as F

    want = {
        r.c_mktsegment: (r.n, float(r.rev))
        for r in orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(38,2)")), 2).alias(
                "rev"
            ),
        )
        .collect()
    }
    assert got == want
