"""Bucketed-table co-located joins: pre-bucketing both sides on the join
key removes the shuffle entirely — the 100 TB pattern for repeated
fact-fact joins (SURVEY.md §2.B "bucketing for co-located joins")."""

import uuid

import pyspark.sql.functions as F


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    suffix = uuid.uuid4().hex[:8]
    t_li, t_o = f"li_b_{suffix}", f"o_b_{suffix}"
    try:
        (
            li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .mode("overwrite").saveAsTable(t_li)
        )
        (
            orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .mode("overwrite").saveAsTable(t_o)
        )
        # disable broadcast so the join strategy decision is about shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(t_li).join(
            spark.table(t_o), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "SortMergeJoin" in plan
        # and it still returns the right answer
        expected = li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql(f"DROP TABLE IF EXISTS {t_li}")
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")
