"""q114: dynamic partition pruning must reach the fact scan — the dim's
runtime key set becomes a partition filter, so non-matching partitions
are never read."""

from icebergplus_spark import registry

registry.load_all()


def test_dpp_expression_on_fact_scan(spark, sf_dir):
    df = registry.QUERIES["q114_dynamic_partition_pruning"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), "fact scan not dynamically pruned"


def test_dpp_matches_static_filter(spark, sf_dir):
    import pyspark.sql.functions as F

    from icebergplus_spark.sources import load_table

    got = {
        r.o_orderpriority: (r.n_orders, r.revenue)
        for r in registry.QUERIES["q114_dynamic_partition_pruning"](
            spark, sf_dir
        ).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    want = {
        r.o_orderpriority: (r.n, float(r.rev))
        for r in orders.filter(
            F.col("o_orderpriority").startswith("1-")
            | F.col("o_orderpriority").startswith("2-")
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(38,2)")), 2).alias("rev"),
        )
        .collect()
    }
    assert got == want
