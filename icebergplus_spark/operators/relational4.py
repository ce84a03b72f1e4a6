"""Fourth relational battery: recursive CTEs, LATERAL correlated
subqueries, regression/covariance aggregates, boolean + bitwise
aggregates (SURVEY.md §2.B breadth — all absent in the reference,
which delegates query processing entirely; SURVEY.md §2.C).

Recursive CTE support is native in Spark 4 SQL (WITH RECURSIVE), so
the same SQL text runs on Spark and on the DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from icebergplus_spark.localrel import local_rows_df
from icebergplus_spark.registry import register
from icebergplus_spark.session import prepare_session
from icebergplus_spark.sources import load_table, register_views


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q88 — recursive CTE: generated month spine LEFT JOINed to 1995 orders.
# The spine is 12 rows produced by recursion, so the join is a broadcast
# of the recursive side at any scale; decimal-sum keeps revenue exact.
# ---------------------------------------------------------------------------
_Q88 = """
WITH RECURSIVE months(m) AS (
  SELECT 1
  UNION ALL
  SELECT m + 1 FROM months WHERE m < 12
)
SELECT m AS order_month,
       CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
       CAST(COALESCE(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2), 0)
            AS DOUBLE) AS month_revenue
FROM months
LEFT JOIN orders
  ON EXTRACT(MONTH FROM o_orderdate) = m
 AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
 AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
GROUP BY m
"""


@register("q88_recursive_cte", oracle=_Q88)
def q88_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_Q88)


# ---------------------------------------------------------------------------
# q89 — LATERAL correlated subquery: top-2 customers by balance per
# nation. Spark decorrelates the LATERAL into a ranked window join —
# the same plan shape as the explicit row_number() formulation, so no
# per-nation re-scan happens at scale.
# ---------------------------------------------------------------------------
_Q89 = """
SELECT n_name, l.c_custkey, l.c_acctbal
FROM nation, LATERAL (
  SELECT c_custkey, c_acctbal
  FROM customer
  WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) l
"""


@register("q89_lateral_topk", oracle=_Q89)
def q89_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    register_views(spark, sf_dir, ["nation", "customer"])
    return spark.sql(_Q89)


# ---------------------------------------------------------------------------
# q90 — regression/covariance aggregate battery. Single distributed
# pass (partial + final aggregation); rounding absorbs the float
# summation-order difference between Spark's tree aggregation and the
# oracle's sequential one.
# ---------------------------------------------------------------------------
@register(
    "q90_regr_aggregates",
    oracle="""
SELECT l_returnflag,
       ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS qty_price_covar,
       ROUND(COVAR_POP(l_quantity, l_extendedprice), 2)  AS qty_price_covar_pop,
       ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS price_per_qty,
       ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 2) AS price_at_zero,
       ROUND(REGR_R2(l_extendedprice, l_quantity), 6)    AS fit_r2,
       CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
       ROUND(REGR_AVGX(l_extendedprice, l_quantity), 4)  AS avg_qty,
       ROUND(REGR_AVGY(l_extendedprice, l_quantity), 2)  AS avg_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def q90_regr_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.round(F.covar_samp(q, p), 2).alias("qty_price_covar"),
        F.round(F.covar_pop(q, p), 2).alias("qty_price_covar_pop"),
        F.round(F.regr_slope(p, q), 4).alias("price_per_qty"),
        F.round(F.regr_intercept(p, q), 2).alias("price_at_zero"),
        F.round(F.regr_r2(p, q), 6).alias("fit_r2"),
        F.regr_count(p, q).alias("n_pairs"),
        F.round(F.regr_avgx(p, q), 4).alias("avg_qty"),
        F.round(F.regr_avgy(p, q), 2).alias("avg_price"),
    )


# ---------------------------------------------------------------------------
# q91 — boolean + bitwise aggregates and exact median per order
# priority. Integer domains, so every value is exact cross-engine.
# ---------------------------------------------------------------------------
@register(
    "q91_bool_bit_aggregates",
    oracle="""
SELECT o_orderpriority,
       BOOL_AND(o_totalprice > 900)    AS all_above_900,
       BOOL_OR(o_totalprice > 400000)  AS any_jumbo,
       CAST(BIT_AND(o_custkey) AS BIGINT) AS key_bit_and,
       CAST(BIT_OR(o_custkey)  AS BIGINT) AS key_bit_or,
       CAST(BIT_XOR(o_custkey) AS BIGINT) AS key_bit_xor,
       ROUND(MEDIAN(EXTRACT(DAY FROM o_orderdate)), 1) AS median_orderday
FROM orders
GROUP BY o_orderpriority
""",
)
def q91_bool_bit_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    key = F.col("o_custkey").cast("bigint")
    return orders.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 900).alias("all_above_900"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_jumbo"),
        F.bit_and(key).alias("key_bit_and"),
        F.bit_or(key).alias("key_bit_or"),
        F.bit_xor(key).alias("key_bit_xor"),
        F.round(F.median(F.dayofmonth("o_orderdate").cast("double")), 1).alias(
            "median_orderday"
        ),
    )


# ---------------------------------------------------------------------------
# q93 — SCD type-2 dimension build: per-customer order-status history
# with [valid_from, valid_to) intervals and an is_current flag, derived
# from the orders fact with lag/lead windows (the standard "statusline
# dimension from event stream" warehouse load). Change detection keeps
# only rows where status differs from the previous order (lag), then
# validity windows come from lead. One shuffle on o_custkey; window
# partitions are per-customer (bounded), so the plan is skew-safe at
# 100 TB. Ties within a date are broken by o_orderkey so both engines
# pick identical change rows.
# ---------------------------------------------------------------------------
@register(
    "q93_scd2_history",
    oracle="""
WITH ordered AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
         LAG(o_orderstatus) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_status
  FROM orders
),
changes AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
  FROM ordered
  WHERE prev_status IS NULL OR o_orderstatus <> prev_status
),
hist AS (
  SELECT o_custkey, o_orderstatus,
         CAST(o_orderdate AS TIMESTAMP) AS valid_from,
         CAST(LEAD(o_orderdate) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           AS TIMESTAMP) AS valid_to
  FROM changes
)
SELECT o_custkey, o_orderstatus, valid_from, valid_to,
       CASE WHEN valid_to IS NULL THEN TRUE ELSE FALSE END AS is_current
FROM hist
WHERE o_custkey % 10 = 0
""",
)
def q93_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ordered = orders.select(
        "o_custkey",
        "o_orderstatus",
        "o_orderdate",
        "o_orderkey",
        F.lag("o_orderstatus").over(w).alias("prev_status"),
    )
    changes = ordered.filter(
        F.col("prev_status").isNull()
        | (F.col("o_orderstatus") != F.col("prev_status"))
    )
    hist = changes.select(
        "o_custkey",
        "o_orderstatus",
        F.col("o_orderdate").cast("timestamp").alias("valid_from"),
        F.lead(F.col("o_orderdate").cast("timestamp")).over(w).alias("valid_to"),
    )
    return hist.filter(F.col("o_custkey") % 10 == 0).select(
        "o_custkey",
        "o_orderstatus",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# q102 — bucketed co-located join: both fact tables are written
# bucketed on the join key, so the join itself needs NO exchange on
# either side — the shuffle is paid once at write time and amortized
# over every subsequent join (the canonical 100 TB strategy for a
# fact-fact join that runs repeatedly; SCALING.md "co-located joins").
# The only exchange left in the plan is the final small aggregation.
# Plan-asserted in tests/test_bucketed_join.py.
# ---------------------------------------------------------------------------
@register(
    "q102_bucketed_join",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def q102_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    prepare_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    # Write both sides bucketed on the join key. At 100 TB this is the
    # one-time layout job; afterwards every custkey-join is exchange-free
    # (Spark aligns the 16 buckets side-to-side instead of shuffling).
    root = tempfile.mkdtemp(prefix="bucketed_")
    for name, df, key in (
        ("bq_orders", orders, "o_custkey"),
        ("bq_customer", cust, "c_custkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .option("path", f"{root}/{name}")
            .bucketBy(16, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    bo = spark.table("bq_orders")
    bc = spark.table("bq_customer")
    return (
        bo.join(bc, bo.o_custkey == bc.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(38,2)")), 2
            )
            .cast("double")
            .alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q114 — dynamic partition pruning: the fact side is laid out
# hive-partitioned on the join column; the dimension side's filter is
# only known at runtime (it comes out of a query, not a literal), so
# static pruning can't help — Spark's DPP injects the dim's key set
# into the fact scan's PartitionFilters and whole partitions are never
# read. At 100 TB this is the difference between scanning 2 of 5
# partitions and scanning everything. Plan-asserted in
# tests/test_dpp.py (dynamicpruningexpression on the fact scan).
# ---------------------------------------------------------------------------
@register(
    "q114_dynamic_partition_pruning",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS revenue
FROM orders
WHERE o_orderpriority IN (
  SELECT DISTINCT o_orderpriority FROM orders WHERE o_orderpriority LIKE '1-%'
     OR o_orderpriority LIKE '2-%'
)
GROUP BY o_orderpriority
""",
)
def q114_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    prepare_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="dpp_")
    # One-time layout job: facts live partitioned on the filter/join key.
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(root)
    fact = spark.read.parquet(root)
    # The dim's priorities are computed at runtime — DPP, not static
    # pruning, keeps the fact scan to the matching partitions.
    dim = (
        orders.filter(
            F.col("o_orderpriority").startswith("1-")
            | F.col("o_orderpriority").startswith("2-")
        )
        .select(F.col("o_orderpriority").alias("p"))
        .distinct()
    )
    return (
        fact.join(F.broadcast(dim), fact.o_orderpriority == dim.p)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(38,2)")), 2)
            .cast("double")
            .alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q115 — salted skew join under the oracle gate: the explicit remedy
# for a pathological hot key (one customer owning a double-digit share
# of a 100 TB fact table). The probe side scatters each key across
# salt_n sub-keys; the build side replicates salt_n ways — any single
# reducer is bounded at ~1/salt_n of the hot key, at the cost of
# salt_n× build-side shuffle volume (keep the build side the smaller
# input). AQE's skew split handles moderate skew without this; the
# salted form is for when even one split of the hot key floods its
# reducer. The oracle is the plain join — salting must not change a
# single row.
# ---------------------------------------------------------------------------
@register(
    "q115_salted_join",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n_lines,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def q115_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergplus_spark.functions.skew import salted_join

    prepare_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return (
        salted_join(orders, cust, "o_custkey", "c_custkey", salt_n=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(38,2)")), 2)
            .cast("double")
            .alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q142 — REST-CATALOG roundtrip under the oracle gate (lake/rest.py):
# the q134 lifecycle (write → commit → compact → scan) with every
# catalog operation and metadata commit going through an HTTP client
# against a localhost REST server — the network-facing version of the
# reference's JdbcCatalog role (LocalIcebergCatalog.java:133-135),
# endpoint shapes per the public Iceberg REST catalog spec. A hash
# match proves the HTTP strategy's lifecycle is lossless
# driver-visibly, extending the commit-authority matrix to four
# (rename / object-store / catalog-service / REST).
# ---------------------------------------------------------------------------
@register(
    "q142_lake_rest_catalog_roundtrip",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n_lines,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS sum_price
FROM lineitem
WHERE l_suppkey % 4 = 2
GROUP BY l_returnflag
""",
)
def q142_lake_rest_catalog_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from icebergplus_spark.functions.exact import dsum
    from icebergplus_spark.lake import compact
    from icebergplus_spark.lake.rest import LakeRestServer, RestLakeCatalog

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") % 4 == 2)
    root = tempfile.mkdtemp(prefix="lake_rest_")
    srv = LakeRestServer(root).start()
    try:
        cat = RestLakeCatalog(spark, srv.base_url).start()
        t = cat.create_table("bench.lineitem_rest", li.schema)
        t.append(li.filter(F.col("l_orderkey") % 2 == 0).repartition(4))
        t.append(li.filter(F.col("l_orderkey") % 2 == 1).repartition(4))
        compact(t, target_file_size=256 * 1024 * 1024)
        return (
            cat.load_table("bench.lineitem_rest")
            .scan()
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                dsum("l_extendedprice", 2).alias("sum_price"),
            )
        )
    finally:
        # scan() resolves file paths from metadata eagerly; executors
        # then read shared storage, never HTTP — so the returned lazy
        # DataFrame stays valid after the server stops.
        srv.stop()


# ---------------------------------------------------------------------------
# q143 — DELETION-VECTOR merge-on-read under the oracle gate (lake/dv.py
# + delete.representation=dv): the q87 lifecycle with the position
# deletes represented as Iceberg-v3 bitmap deletion vectors — two
# STACKED predicate deletes force a vector merge (at most one live
# vector per data file), then an equality delete lands on top, then the
# aggregate reads through all tombstone kinds. A hash match proves the
# bitmap representation reproduces exact relational semantics with v2
# position files nowhere in the path.
# ---------------------------------------------------------------------------
@register(
    "q143_lake_deletion_vectors_roundtrip",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n_lines,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS sum_price
FROM lineitem
WHERE l_linenumber <= 2
  AND NOT (l_quantity < 4)
  AND NOT (l_quantity > 46)
  AND l_orderkey % 89 <> 0
GROUP BY l_returnflag
""",
)
def q143_lake_deletion_vectors_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from icebergplus_spark.functions.exact import dsum
    from icebergplus_spark.lake import LocalLakeCatalog

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    root = tempfile.mkdtemp(prefix="lake_dv_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.lineitem_dv", li.schema)
    t.set_property("delete.representation", "dv")
    t.append(li.filter(F.col("l_orderkey") % 2 == 0).repartition(2))
    t.append(li.filter(F.col("l_orderkey") % 2 == 1).repartition(2))
    # two stacked vector deletes: the second MERGES into each affected
    # file's existing vector (supersession, not accumulation)
    t.delete_where({"l_quantity": ("<", 4)})
    t.delete_where({"l_quantity": (">", 46)})
    # equality tombstones compose with vectors at scan
    t.delete_by_key(
        li.filter(F.col("l_orderkey") % 89 == 0).select("l_orderkey").distinct()
    )
    return (
        t.scan()
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_extendedprice", 2).alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# q146 — CONTINUOUS AGGREGATE UNDER DELETES (r5 rollup invalidation fix
# under the oracle gate): the q140 lifecycle with a source DELETE and
# an equality tombstone landing BETWEEN refreshes — the rollup's
# changelog-driven invalidation must recompute the touched buckets and
# tombstone cells that emptied out; the oracle is the from-scratch
# aggregate over the surviving rows only. A hash match proves the
# incremental maintenance converges to the exact recompute under a
# mixed append/delete history, not just an append stream.
# ---------------------------------------------------------------------------
@register(
    "q146_continuous_aggregate_with_deletes",
    oracle="""
SELECT DATE_TRUNC('hour', ts) AS bucket,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events
WHERE NOT (value > 80.0)
  AND event_type <> 'signup'
GROUP BY 1, 2
""",
)
def q146_continuous_aggregate_with_deletes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.rollup import (
        refresh_rollup,
        rollup_table_schema,
    )

    ev = _t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="lake_rollup_del_")
    cat = LocalLakeCatalog(spark, root).start()
    src = cat.create_table("bench.events_src_d", ev.schema)
    roll = cat.create_table("bench.events_rollup_d", rollup_table_schema())
    src.append(ev.filter(F.col("ts") < "2024-01-15"))
    refresh_rollup(src, roll, window="hour")
    # CoW predicate delete between refreshes
    src.delete({"value": (">", 80.0)})
    refresh_rollup(src, roll, window="hour")
    src.append(ev.filter(F.col("ts") >= "2024-01-15"))
    # MoR equality tombstone: drop an entire event_type (empties whole
    # rollup cells — their rows must disappear, not stand stale)
    src.delete_by_key(
        spark.createDataFrame([("signup",)], "event_type string")
    )
    src.delete({"value": (">", 80.0)})  # re-assert over the second chunk
    refresh_rollup(src, roll, window="hour")
    return roll.scan().select(
        "bucket",
        "event_type",
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# q149 — GENERALIZED MATERIALIZED VIEW through the SQL surface: CREATE
# MATERIALIZED VIEW (spec persisted in table metadata) over an orders
# lake table, then appends + a CoW delete land and REFRESH MATERIALIZED
# VIEW folds them in via changelog invalidation. The aggregate includes
# count(DISTINCT o_custkey) — NOT delta-mergeable, exact here because
# touched buckets are recomputed, never merged. The oracle is the
# from-scratch monthly aggregate over the surviving rows.
# ---------------------------------------------------------------------------
@register(
    "q149_materialized_view_sql",
    oracle="""
SELECT DATE_TRUNC('month', o_orderdate) AS bucket,
       o_orderstatus,
       COUNT(*) AS n,
       COUNT(DISTINCT o_custkey) AS n_cust,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS revenue
FROM orders
WHERE NOT (o_totalprice > 250000.0)
GROUP BY 1, 2
""",
)
def q149_materialized_view_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    orders = _t(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="lake_mv_")
    cat = LocalLakeCatalog(spark, root).start()
    src = cat.create_table("bench.orders_mv_src", orders.schema)
    src.append(orders.filter(F.col("o_orderkey") % 2 == 0))
    lake_sql(
        cat,
        """CREATE MATERIALIZED VIEW bench.orders_monthly AS
SELECT DATE_TRUNC('month', o_orderdate) AS bucket, o_orderstatus,
       count(*) AS n, count(DISTINCT o_custkey) AS n_cust,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS revenue
FROM bench.orders_mv_src GROUP BY 1, 2""",
    )
    src.append(orders.filter(F.col("o_orderkey") % 2 == 1))
    src.delete({"o_totalprice": (">", 250000.0)})
    lake_sql(cat, "REFRESH MATERIALIZED VIEW bench.orders_monthly")
    return (
        cat.load_table("bench.orders_monthly")
        .scan()
        .select("bucket", "o_orderstatus", "n", "n_cust", "revenue")
    )


# ---------------------------------------------------------------------------
# q151 — MERGE-ON-READ UPDATE + MERGE under deletion vectors (r6,
# Iceberg v3 MoR write path): a dv-mode table takes a predicate UPDATE,
# a MERGE matched-update, and a MERGE matched-delete — each commit
# tombstones pre-images via vectors and appends only post-images, never
# rewriting a data file. The oracle replays the same mutations as pure
# SQL over the raw table, so a hash match proves the MoR write path
# converges to exactly the CoW-visible state.
# ---------------------------------------------------------------------------
@register(
    "q151_lake_mor_update_merge",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(
           CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1000.0
                ELSE o_totalprice END AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS revenue,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
         AS BIGINT) AS n_repri
FROM orders
WHERE o_orderkey % 131 <> 0
GROUP BY o_orderstatus
""",
)
def q151_lake_mor_update_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.functions.exact import dsum
    from icebergplus_spark.lake import LocalLakeCatalog

    orders = _t(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="lake_mor_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.orders_mor", orders.schema)
    t.set_property("delete.representation", "dv")
    t.append(orders.filter(F.col("o_orderkey") % 2 == 0).repartition(2))
    t.append(orders.filter(F.col("o_orderkey") % 2 == 1).repartition(2))
    # MoR UPDATE: tombstone pre-images, append post-images
    t.update_where(
        {"o_orderstatus": ("=", "F")}, {"o_orderpriority": "0-REASSIGNED"}
    )
    # MoR MERGE matched-update: +1000 on every %97 order
    bump = (
        orders.filter(F.col("o_orderkey") % 97 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1000.0))
    )
    t.merge_into(
        bump,
        on="o_orderkey",
        when_matched_update={"o_totalprice": F.col("src_o_totalprice")},
        when_not_matched_insert=False,
    )
    # MoR MERGE matched-delete: drop every %131 order
    t.merge_into(
        orders.filter(F.col("o_orderkey") % 131 == 0),
        on="o_orderkey",
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    return (
        t.scan()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", 2).alias("revenue"),
            F.sum(
                F.when(
                    F.col("o_orderpriority") == "0-REASSIGNED", 1
                ).otherwise(0)
            ).alias("n_repri"),
        )
    )


# ---------------------------------------------------------------------------
# q152 — DISJUNCTIVE RANGE SCAN under the oracle gate (r6): scan_ranges
# plans the union of two disjoint time windows in ONE manifest pass
# (both bounds of each range prune files; single scan subtree, OR
# residual) — the primitive the MV refresh's touched-bucket recompute
# rides. The oracle is the equivalent WHERE (.. OR ..) over the raw
# events, so a hash match proves the disjunctive planner loses no rows
# at either range boundary.
# ---------------------------------------------------------------------------
@register(
    "q152_range_scan_disjunction",
    oracle="""
SELECT DATE_TRUNC('day', ts) AS day,
       event_type,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS sum_value
FROM events
WHERE (ts >= TIMESTAMP '2024-01-03' AND ts < TIMESTAMP '2024-01-05')
   OR (ts >= TIMESTAMP '2024-01-20' AND ts < TIMESTAMP '2024-01-22')
GROUP BY 1, 2
""",
)
def q152_range_scan_disjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as dt
    import tempfile

    from icebergplus_spark.functions.exact import dsum
    from icebergplus_spark.lake import LocalLakeCatalog

    ev = _t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="lake_ranges_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.events_ranges", ev.schema)
    # day-sliced appends so each file's ts stats cover ~one day and the
    # planner has real pruning work at every scale
    for d in range(1, 32, 8):
        t.append(
            ev.filter(
                (F.dayofmonth("ts") >= d) & (F.dayofmonth("ts") < d + 8)
            ).repartition(2)
        )
    ranges = [
        (dt.datetime(2024, 1, 3), dt.datetime(2024, 1, 5)),
        (dt.datetime(2024, 1, 20), dt.datetime(2024, 1, 22)),
    ]
    return (
        t.scan_ranges("ts", ranges)
        .groupBy(
            F.date_trunc("day", "ts").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value", 2).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# q153 — SQL-REACHABLE RANGE PREDICATES (r7, VERDICT r6 #1): the whole
# statement surface runs through lake_sql text — a closed-range DELETE
# (``ts >= x AND ts < y``: repeated-column conjunction → AND-list, both
# bounds prune manifests; this used to raise UnsupportedSQL) followed by
# a two-window OR SELECT (routed through plan_files_any's one-pass union
# planner + the pruned-view fast path). The first SELECT window overlaps
# the deleted range, so a hash match proves the deleted rows are really
# gone AND the pruned read loses nothing at any of the four range
# boundaries. Oracle = the same set algebra over the raw events.
# ---------------------------------------------------------------------------
@register(
    "q153_sql_range_dml",
    oracle="""
SELECT DATE_TRUNC('day', ts) AS day,
       event_type,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS sum_value
FROM events
WHERE NOT (ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-11')
  AND ((ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-09')
    OR (ts >= TIMESTAMP '2024-01-20' AND ts < TIMESTAMP '2024-01-23'))
GROUP BY 1, 2
""",
)
def q153_sql_range_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    ev = _t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="lake_sql_range_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.ev_sqlrange", ev.schema)
    # day-sliced appends so each file's ts stats span ~4 days and both
    # the DELETE and the SELECT have real files to skip at every scale
    for d in range(1, 32, 4):
        t.append(
            ev.filter(
                (F.dayofmonth("ts") >= d) & (F.dayofmonth("ts") < d + 4)
            ).repartition(2)
        )
    lake_sql(
        cat,
        "DELETE FROM bench.ev_sqlrange "
        "WHERE ts >= '2024-01-08 00:00:00' AND ts < '2024-01-11 00:00:00'",
    )
    return lake_sql(
        cat,
        """
        SELECT DATE_TRUNC('day', ts) AS day,
               event_type,
               COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(38,2))), 2) AS DOUBLE)
                 AS sum_value
        FROM bench.ev_sqlrange
        WHERE (ts >= '2024-01-05 00:00:00' AND ts < '2024-01-09 00:00:00')
           OR (ts >= '2024-01-20 00:00:00' AND ts < '2024-01-23 00:00:00')
        GROUP BY 1, 2
        """,
    )


# ---------------------------------------------------------------------------
# q154 — IN-LIST PREDICATES through the SQL frontend (r7): ``col IN
# (literals)`` expands to equality branches riding the same one-pass
# union planner as explicit ORs — here a DELETE with a mixed
# IN + range conjunction, then an IN-filtered SELECT through the
# pruned fast path. The oracle recomputes the same set algebra over
# raw events, so a hash match proves the cross-product expansion and
# the equality-branch pruning lose no rows.
# ---------------------------------------------------------------------------
@register(
    "q154_sql_inlist_dml",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS sum_value
FROM events
WHERE NOT (event_type IN ('error', 'signup')
           AND ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20')
  AND event_type IN ('click', 'error', 'purchase')
GROUP BY event_type
""",
)
def q154_sql_inlist_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    ev = _t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="lake_sql_in_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.ev_inlist", ev.schema)
    for d in range(1, 32, 8):
        t.append(
            ev.filter(
                (F.dayofmonth("ts") >= d) & (F.dayofmonth("ts") < d + 8)
            ).repartition(2)
        )
    lake_sql(
        cat,
        "DELETE FROM bench.ev_inlist "
        "WHERE event_type IN ('error', 'signup') "
        "AND ts >= '2024-01-10 00:00:00' AND ts < '2024-01-20 00:00:00'",
    )
    return lake_sql(
        cat,
        """
        SELECT event_type,
               COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(38,2))), 2) AS DOUBLE)
                 AS sum_value
        FROM bench.ev_inlist
        WHERE event_type IN ('click', 'error', 'purchase')
        GROUP BY event_type
        """,
    )


# ---------------------------------------------------------------------------
# q155 — METADATA-ANSWERED COUNT under the oracle gate (r7): COUNT(*)
# over an OR of time windows through lake_sql routes to
# LakeTable.count_rows — day-sliced files fully inside a window are
# counted from manifest stats alone, only boundary files are scanned.
# The oracle recomputes the count over raw events, so a hash match
# proves the full/partial file classification is exact at every window
# edge. The 100 TB shape: inventory questions answered from metadata.
# ---------------------------------------------------------------------------
@register(
    "q155_sql_count_meta",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n
FROM events
WHERE (ts >= TIMESTAMP '2024-01-04' AND ts < TIMESTAMP '2024-01-09')
   OR (ts >= TIMESTAMP '2024-01-21' AND ts < TIMESTAMP '2024-01-26')
   OR event_type IN ('signup')
""",
)
def q155_sql_count_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    ev = _t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="lake_sql_cnt_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.ev_count", ev.schema)
    for d in range(1, 32, 4):
        t.append(
            ev.filter(
                (F.dayofmonth("ts") >= d) & (F.dayofmonth("ts") < d + 4)
            ).repartition(2)
        )
    return lake_sql(
        cat,
        "SELECT COUNT(*) AS n FROM bench.ev_count "
        "WHERE (ts >= '2024-01-04 00:00:00' AND ts < '2024-01-09 00:00:00') "
        "OR (ts >= '2024-01-21 00:00:00' AND ts < '2024-01-26 00:00:00') "
        "OR event_type IN ('signup')",
    )


# ---------------------------------------------------------------------------
# q156 — METADATA-ANSWERED MIN/MAX/COUNT inventory (r7): the classic
# "table inventory" SELECT routes to stats_min_max + count_rows —
# manifest folds only, zero data-file reads (planted pytest pins that).
# The oracle recomputes over raw events, so a hash match proves the
# manifest extrema and record counts are faithful to the data.
# ---------------------------------------------------------------------------
@register(
    "q156_sql_inventory_meta",
    oracle="""
SELECT CAST(MIN(ts) AS TIMESTAMP) AS lo,
       CAST(MAX(ts) AS TIMESTAMP) AS hi,
       CAST(MIN(value) AS DOUBLE) AS lo_v,
       CAST(MAX(value) AS DOUBLE) AS hi_v,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
""",
)
def q156_sql_inventory_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    ev = _t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="lake_sql_inv_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.ev_inventory", ev.schema)
    for d in range(1, 32, 8):
        t.append(
            ev.filter(
                (F.dayofmonth("ts") >= d) & (F.dayofmonth("ts") < d + 8)
            ).repartition(2)
        )
    return lake_sql(
        cat,
        "SELECT MIN(ts) AS lo, MAX(ts) AS hi, "
        "MIN(value) AS lo_v, MAX(value) AS hi_v, COUNT(*) AS n "
        "FROM bench.ev_inventory",
    )


# ---------------------------------------------------------------------------
# q157 — RESIDUAL / NULL / PREFIX predicates through the SQL frontend
# (r8, VERDICT r7 #1): the everyday DML shapes the grammar used to
# refuse. A prefix-LIKE DELETE (rewritten exactly to the ['src1','src2')
# range — both the manifest prune and the row predicate), an IS NULL
# UPDATE (pruned from column_null_counts), then a SELECT through the
# pruned fast path combining IS NOT NULL and !=. The oracle replays the
# same set algebra over raw documents with CASE-injected nulls, so a
# hash match proves three-valued-logic semantics (nulls fail !=) AND
# that none of the three prunes drops live rows.
# ---------------------------------------------------------------------------
@register(
    "q157_sql_residual_dml",
    oracle="""
WITH seeded AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang_n,
         source,
         n_chars
  FROM documents
), after_delete AS (
  SELECT * FROM seeded WHERE NOT (source LIKE 'src1%')
), after_update AS (
  SELECT doc_id, lang_n, source,
         CASE WHEN lang_n IS NULL THEN -1 ELSE n_chars END AS n_chars
  FROM after_delete
)
SELECT lang_n AS lang,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM after_update
WHERE lang_n IS NOT NULL AND lang_n != 'en'
GROUP BY lang_n
""",
)
def q157_sql_residual_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("lang"))
        .alias("lang_n"),
        "source",
        "n_chars",
    )
    root = tempfile.mkdtemp(prefix="lake_sql_res_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.docs_residual", docs.schema)
    # doc_id-sliced appends: per-file null counts and source/lang stats
    # give every prune in the battery real files to keep and skip
    n_docs = docs.count()
    step = max(1, n_docs // 4)
    for lo in range(0, n_docs, step):
        t.append(
            docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + step)
            ).repartition(2)
        )
    lake_sql(
        cat,
        "DELETE FROM bench.docs_residual WHERE source LIKE 'src1%'",
    )
    lake_sql(
        cat,
        "UPDATE bench.docs_residual SET n_chars = -1 WHERE lang_n IS NULL",
    )
    return lake_sql(
        cat,
        "SELECT lang_n AS lang, COUNT(*) AS n, SUM(n_chars) AS sum_chars "
        "FROM bench.docs_residual "
        "WHERE lang_n IS NOT NULL AND lang_n != 'en' "
        "GROUP BY lang_n",
    )


# ---------------------------------------------------------------------------
# q158 — METADATA-ANSWERED aggregates UNDER WHERE (r8, VERDICT r7 #4):
# q156's inventory fold combined with q155's branch grammar —
# ``SELECT MIN/MAX/COUNT(*) ... WHERE <range OR range>`` folds files a
# branch fully covers from footer stats and scans only the boundary
# files (planted pytest proves the covered files are never opened by
# deleting them). The oracle recomputes over raw events: a hash match
# proves the fold+boundary merge is exact across both domains
# (timestamp extrema travel as ISO strings, values as doubles).
# ---------------------------------------------------------------------------
@register(
    "q158_sql_agg_where_meta",
    oracle="""
SELECT CAST(MIN(ts) AS TIMESTAMP) AS lo,
       CAST(MAX(ts) AS TIMESTAMP) AS hi,
       CAST(MIN(value) AS DOUBLE) AS lo_v,
       CAST(MAX(value) AS DOUBLE) AS hi_v,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
WHERE (ts >= TIMESTAMP '2024-01-03 12:00:00'
       AND ts < TIMESTAMP '2024-01-10')
   OR (ts >= TIMESTAMP '2024-01-21' AND ts < TIMESTAMP '2024-01-27')
""",
)
def q158_sql_agg_where_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    ev = _t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="lake_sql_aggw_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.ev_aggwhere", ev.schema)
    # day-sliced files: the first WHERE branch starts INTRA-day so one
    # file is a real boundary scan; whole days inside both windows fold
    for d in range(1, 32, 3):
        t.append(
            ev.filter(
                (F.dayofmonth("ts") >= d) & (F.dayofmonth("ts") < d + 3)
            ).repartition(2)
        )
    return lake_sql(
        cat,
        "SELECT MIN(ts) AS lo, MAX(ts) AS hi, "
        "MIN(value) AS lo_v, MAX(value) AS hi_v, COUNT(*) AS n "
        "FROM bench.ev_aggwhere "
        "WHERE (ts >= '2024-01-03 12:00:00' AND ts < '2024-01-10 00:00:00') "
        "OR (ts >= '2024-01-21 00:00:00' AND ts < '2024-01-27 00:00:00')",
    )


# ---------------------------------------------------------------------------
# q159 — METADATA-ANSWERED GROUPED COUNTS (r8, VERDICT r7 #6): per-
# partition row counts — the single most common inventory question on a
# partitioned lake table — via count_rows_by: identity-partitioned
# files are single-valued in the group column, so files the WHERE fully
# covers contribute (value, record_count) straight from the manifest;
# only the intra-day boundary file is scanned, and the halves merge in
# Spark (group cardinality never hits the driver). Planted pytest
# proves the fold by deleting covered data files; this oracle proves
# exactness: DuckDB replays the same grouped count over raw events.
# ---------------------------------------------------------------------------
@register(
    "q159_sql_group_count_meta",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
WHERE ts >= TIMESTAMP '2024-01-04'
  AND ts < TIMESTAMP '2024-01-20 12:00:00'
GROUP BY event_type
HAVING COUNT(*) > 5
ORDER BY event_type
""",
)
def q159_sql_group_count_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    ev = _t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="lake_sql_gcnt_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table(
        "bench.ev_gcount", ev.schema, partition_cols=["event_type"]
    )
    # day-sliced appends × identity partition on event_type → every
    # file single-valued in the group column with ~2-day ts stats
    for d in range(1, 32, 2):
        t.append(
            ev.filter(
                (F.dayofmonth("ts") >= d) & (F.dayofmonth("ts") < d + 2)
            )
        )
    return lake_sql(
        cat,
        "SELECT event_type, COUNT(*) AS n FROM bench.ev_gcount "
        "WHERE ts >= '2024-01-04 00:00:00' "
        "AND ts < '2024-01-20 12:00:00' "
        "GROUP BY event_type HAVING n > 5 ORDER BY event_type",
    )


# ---------------------------------------------------------------------------
# q160 — JOIN PRUNING through the generic SELECT path (r8, VERDICT r7
# missing #2): the most common analytics shape — a fact-dim join with a
# range WHERE on the fact side — runs through lake_sql against two lake
# tables; the fact table's view is pruned to the files the WHERE can
# match (alias-qualified attribution, every OR branch constrains the
# fact), the dim joins whole. The oracle replays the identical join
# over raw orders/customer, so a hash match proves the pruned view
# loses no rows at any range boundary. Planted pytests
# (test_sql_join_pruning.py) pin the file counts; this pins exactness.
# ---------------------------------------------------------------------------
@register(
    "q160_sql_join_pruned",
    oracle="""
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE (o.o_orderdate >= TIMESTAMP '1996-01-01'
       AND o.o_orderdate < TIMESTAMP '1996-07-01')
   OR (o.o_orderdate >= TIMESTAMP '1999-01-01'
       AND o.o_orderdate < TIMESTAMP '1999-04-01')
GROUP BY c.c_mktsegment
ORDER BY segment
""",
)
def q160_sql_join_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    root = tempfile.mkdtemp(prefix="lake_sql_joinp_")
    cat = LocalLakeCatalog(spark, root).start()
    fact = cat.create_table("bench.w_orders", orders.schema)
    # year-sliced appends (years derived from the DATA — the synthetic
    # corpus spans 1995-2001, not TPC-H's 1992-1998; a static range
    # silently dropped rows, self-review r8) so the two WHERE windows
    # have whole files to skip and boundary files to residual-filter
    years = sorted(
        r["y"]
        for r in orders.select(
            F.year("o_orderdate").alias("y")
        ).distinct().collect()
    )
    for y in years:
        fact.append(
            orders.filter(F.year("o_orderdate") == y).repartition(2)
        )
    dim = cat.create_table("bench.w_cust", cust.schema)
    dim.append(cust)
    return lake_sql(
        cat,
        "SELECT c.c_mktsegment AS segment, COUNT(*) AS n_orders, "
        "CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(38,2))), 2) "
        "AS DOUBLE) AS revenue "
        "FROM bench.w_orders o JOIN bench.w_cust c "
        "ON o.o_custkey = c.c_custkey "
        "WHERE (o.o_orderdate >= '1996-01-01' "
        "AND o.o_orderdate < '1996-07-01') "
        "OR (o.o_orderdate >= '1999-01-01' "
        "AND o.o_orderdate < '1999-04-01') "
        "GROUP BY c.c_mktsegment ORDER BY segment",
    )


# ---------------------------------------------------------------------------
# q161 — DELETE WHERE col IN (SELECT ...) (r8): the subquery-keyed
# delete every retention/GDPR pipeline runs. The key set comes from an
# ordinary SELECT (here: customers of one segment below an account-
# balance cutoff) and drives LakeTable.delete_by_key — an EQUALITY
# delete whose keys never land on the driver: unhittable files are
# exempted by range/bloom stats, matching files get tombstones, and the
# scan applies them. Oracle = NOT IN over the same raw tables, so a
# hash match proves key-set completeness and tombstone exactness.
# ---------------------------------------------------------------------------
@register(
    "q161_sql_delete_in_subquery",
    oracle="""
SELECT o.o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS revenue
FROM orders o
WHERE o.o_custkey NOT IN (
  SELECT c_custkey FROM customer
  WHERE c_mktsegment = 'BUILDING' AND c_acctbal < 1000.0
)
GROUP BY o.o_orderstatus
ORDER BY status
""",
)
def q161_sql_delete_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    root = tempfile.mkdtemp(prefix="lake_sql_insub_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.ord_insub", orders.schema)
    years = sorted(
        r["y"]
        for r in orders.select(
            F.year("o_orderdate").alias("y")
        ).distinct().collect()
    )
    for y in years:
        t.append(orders.filter(F.year("o_orderdate") == y).repartition(2))
    c = cat.create_table("bench.cust_insub", cust.schema)
    c.append(cust)
    lake_sql(
        cat,
        "DELETE FROM bench.ord_insub WHERE o_custkey IN ("
        "SELECT c_custkey FROM bench.cust_insub "
        "WHERE c_mktsegment = 'BUILDING' AND c_acctbal < 1000.0)",
    )
    return lake_sql(
        cat,
        "SELECT o_orderstatus AS status, COUNT(*) AS n, "
        "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2) "
        "AS DOUBLE) AS revenue "
        "FROM bench.ord_insub GROUP BY o_orderstatus ORDER BY status",
    )


# ---------------------------------------------------------------------------
# q162 — MULTI-KEY grouped counts from metadata (r8): the partition ×
# day rollup — events land partitioned by (event_type, day), so every
# file is single-valued in BOTH group columns and a whole-day WHERE
# folds the counts entirely from manifests (count_rows_by multi-key;
# the intra-day bound forces real boundary scans too). Oracle replays
# the grouped count over raw events; planted pytest proves the fold by
# deleting data files.
# ---------------------------------------------------------------------------
@register(
    "q162_sql_group_count_multi",
    oracle="""
SELECT event_type,
       STRFTIME(ts, '%Y-%m-%d') AS day,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
WHERE ts >= TIMESTAMP '2024-01-05'
  AND ts < TIMESTAMP '2024-01-12 12:00:00'
GROUP BY 1, 2
""",
)
def q162_sql_group_count_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "event_type",
        "value",
    )
    root = tempfile.mkdtemp(prefix="lake_sql_gmulti_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table(
        "bench.ev_gmulti", ev.schema, partition_cols=["event_type", "day"]
    )
    for d in range(1, 32, 4):
        t.append(
            ev.filter(
                (F.dayofmonth("ts") >= d) & (F.dayofmonth("ts") < d + 4)
            )
        )
    return lake_sql(
        cat,
        "SELECT event_type, day, COUNT(*) AS n FROM bench.ev_gmulti "
        "WHERE ts >= '2024-01-05 00:00:00' "
        "AND ts < '2024-01-12 12:00:00' "
        "GROUP BY event_type, day",
    )


# ---------------------------------------------------------------------------
# q163 — UPDATE ... WHERE col IN (SELECT ...) (r8): the subquery-keyed
# update (re-scoring, re-labeling, PII-masking pipelines). The key set
# becomes a stats-targeted MERGE source with the insert clause off —
# only files whose key range intersects the keys rewrite. Oracle
# replays with CASE WHEN ... IN, so a hash match proves both the key
# set and that non-matching rows were untouched.
# ---------------------------------------------------------------------------
@register(
    "q163_sql_update_in_subquery",
    oracle="""
WITH flagged AS (
  SELECT o_orderkey,
         CASE WHEN o_custkey IN (
           SELECT c_custkey FROM customer
           WHERE c_mktsegment = 'MACHINERY' AND c_acctbal >= 9000.0
         ) THEN 'FLAGGED' ELSE o_orderpriority END AS pri,
         o_totalprice
  FROM orders
)
SELECT pri,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS revenue
FROM flagged
GROUP BY pri
ORDER BY pri
""",
)
def q163_sql_update_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    root = tempfile.mkdtemp(prefix="lake_sql_updsub_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.ord_updsub", orders.schema)
    years = sorted(
        r["y"]
        for r in orders.select(
            F.year("o_orderdate").alias("y")
        ).distinct().collect()
    )
    for y in years:
        t.append(orders.filter(F.year("o_orderdate") == y).repartition(2))
    c = cat.create_table("bench.cust_updsub", cust.schema)
    c.append(cust)
    lake_sql(
        cat,
        "UPDATE bench.ord_updsub SET o_orderpriority = 'FLAGGED' "
        "WHERE o_custkey IN (SELECT c_custkey FROM bench.cust_updsub "
        "WHERE c_mktsegment = 'MACHINERY' AND c_acctbal >= 9000.0)",
    )
    return lake_sql(
        cat,
        "SELECT o_orderpriority AS pri, COUNT(*) AS n, "
        "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2) "
        "AS DOUBLE) AS revenue "
        "FROM bench.ord_updsub GROUP BY o_orderpriority ORDER BY pri",
    )


# ---------------------------------------------------------------------------
# q164 — CTE over the lake SQL fast paths (r9, VERDICT r8 #1): the way
# analysts actually write the fact-dim shape — a range-WHERE CTE over
# the fact table, joined to the dim in the main query. The CTE body
# dispatches through lake_sql recursively (sql_dml._with_select), so it
# takes the SAME pruned-view path a bare SELECT does: only files whose
# footer stats can match the window are planned; the main query's join
# runs over the lazy CTE view (Catalyst inlines it — a plan rewrite,
# not a materialization). Oracle replays the identical WITH over raw
# orders/customer, so a hash match proves the decomposition loses no
# rows at any range boundary. Planted pytests (test_sql_cte.py) pin the
# file counts; this pins exactness.
# ---------------------------------------------------------------------------
@register(
    "q164_sql_cte_pruned",
    oracle="""
WITH recent AS (
  SELECT o_custkey, o_totalprice
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1996-07-01'
)
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(ROUND(SUM(CAST(r.o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS revenue
FROM recent r
JOIN customer c ON r.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY segment
""",
)
def q164_sql_cte_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    root = tempfile.mkdtemp(prefix="lake_sql_cte_")
    cat = LocalLakeCatalog(spark, root).start()
    fact = cat.create_table("bench.cte_orders", orders.schema)
    years = sorted(
        r["y"]
        for r in orders.select(
            F.year("o_orderdate").alias("y")
        ).distinct().collect()
    )
    for y in years:
        fact.append(
            orders.filter(F.year("o_orderdate") == y).repartition(2)
        )
    dim = cat.create_table("bench.cte_cust", cust.schema)
    dim.append(cust)
    return lake_sql(
        cat,
        "WITH recent AS ("
        "  SELECT o_custkey, o_totalprice FROM bench.cte_orders"
        "  WHERE o_orderdate >= '1996-01-01'"
        "  AND o_orderdate < '1996-07-01'"
        ") "
        "SELECT c.c_mktsegment AS segment, COUNT(*) AS n_orders, "
        "CAST(ROUND(SUM(CAST(r.o_totalprice AS DECIMAL(38,2))), 2) "
        "AS DOUBLE) AS revenue "
        "FROM recent r JOIN bench.cte_cust c ON r.o_custkey = c.c_custkey "
        "GROUP BY c.c_mktsegment ORDER BY segment",
    )


# ---------------------------------------------------------------------------
# q165 — DELETE ... WHERE col NOT IN (SELECT ...) (r9, VERDICT r8 #3):
# the keep-list delete (retention allowlists, GDPR keep-sets) with
# SQL's three-valued NULL semantics done right. Phase 1 deletes orders
# whose custkey is NOT among one segment's customers (anti-join via
# merge_into's BY SOURCE delete, never a driver-side key collect; the
# IS NOT NULL condition keeps NULL-key rows, as NULL NOT IN evaluates
# NULL). Phase 2 replays a NOT IN whose key set CONTAINS a NULL — the
# classic trap: it must be a NO-OP (NOT IN over a NULL-bearing set is
# never TRUE). The oracle replays both phases declaratively; a hash
# match proves phase 1's exact key set AND phase 2's no-op-ness.
# ---------------------------------------------------------------------------
@register(
    "q165_sql_delete_not_in",
    oracle="""
SELECT o.o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS revenue
FROM orders o
WHERE o.o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
)
GROUP BY o.o_orderstatus
ORDER BY status
""",
)
def q165_sql_delete_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    root = tempfile.mkdtemp(prefix="lake_sql_notin_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.ord_notin", orders.schema)
    years = sorted(
        r["y"]
        for r in orders.select(
            F.year("o_orderdate").alias("y")
        ).distinct().collect()
    )
    for y in years:
        t.append(orders.filter(F.year("o_orderdate") == y).repartition(2))
    c = cat.create_table("bench.cust_notin", cust.schema)
    c.append(cust)
    # phase 1: keep only AUTOMOBILE customers' orders
    lake_sql(
        cat,
        "DELETE FROM bench.ord_notin WHERE o_custkey NOT IN ("
        "SELECT c_custkey FROM bench.cust_notin "
        "WHERE c_mktsegment = 'AUTOMOBILE')",
    )
    # phase 2: a NULL-bearing key set — MUST be a no-op (any NULL key
    # makes NOT IN never TRUE); the oracle's result proves it
    lake_sql(
        cat,
        "DELETE FROM bench.ord_notin WHERE o_custkey NOT IN ("
        "SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END "
        "FROM bench.cust_notin)",
    )
    return lake_sql(
        cat,
        "SELECT o_orderstatus AS status, COUNT(*) AS n, "
        "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2) "
        "AS DOUBLE) AS revenue "
        "FROM bench.ord_notin GROUP BY o_orderstatus ORDER BY status",
    )


# ---------------------------------------------------------------------------
# q166 — UPDATE ... WHERE col NOT IN (SELECT ...) (r9): the complement
# of q163 — rows OUTSIDE the key set get the SET expressions, routed
# through merge_into's new WHEN NOT MATCHED BY SOURCE UPDATE clause
# (Delta parity). The oracle's CASE uses DuckDB's own NOT IN, so a
# hash match proves the anti-join reproduces three-valued semantics
# over a non-NULL key set; the second phase replays a NULL-bearing set
# (must no-op), mirroring q165.
# ---------------------------------------------------------------------------
@register(
    "q166_sql_update_not_in",
    oracle="""
WITH flagged AS (
  SELECT CASE WHEN o_custkey NOT IN (
           SELECT c_custkey FROM customer WHERE c_mktsegment = 'FURNITURE'
         ) THEN 'EXTERNAL' ELSE o_orderpriority END AS pri,
         o_totalprice
  FROM orders
)
SELECT pri,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS revenue
FROM flagged
GROUP BY pri
ORDER BY pri
""",
)
def q166_sql_update_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    root = tempfile.mkdtemp(prefix="lake_sql_updnotin_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.ord_updnotin", orders.schema)
    years = sorted(
        r["y"]
        for r in orders.select(
            F.year("o_orderdate").alias("y")
        ).distinct().collect()
    )
    for y in years:
        t.append(orders.filter(F.year("o_orderdate") == y).repartition(2))
    c = cat.create_table("bench.cust_updnotin", cust.schema)
    c.append(cust)
    lake_sql(
        cat,
        "UPDATE bench.ord_updnotin SET o_orderpriority = 'EXTERNAL' "
        "WHERE o_custkey NOT IN (SELECT c_custkey FROM "
        "bench.cust_updnotin WHERE c_mktsegment = 'FURNITURE')",
    )
    # NULL-bearing key set — must not update anything
    lake_sql(
        cat,
        "UPDATE bench.ord_updnotin SET o_orderpriority = 'WRONG' "
        "WHERE o_custkey NOT IN (SELECT CASE WHEN c_acctbal < 0 "
        "THEN NULL ELSE c_custkey END FROM bench.cust_updnotin)",
    )
    return lake_sql(
        cat,
        "SELECT o_orderpriority AS pri, COUNT(*) AS n, "
        "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2) "
        "AS DOUBLE) AS revenue "
        "FROM bench.ord_updnotin GROUP BY o_orderpriority ORDER BY pri",
    )


# ---------------------------------------------------------------------------
# q167 — grouped MIN/MAX/COUNT from metadata (r9): the per-partition
# freshness/inventory dashboard shape — events partitioned by
# event_type, asking each partition's first/last timestamp and row
# count over a ranged window. Routes through sql_dml._group_agg_select
# onto LakeTable.agg_by: files single-valued in the group column and
# fully covered by the WHERE contribute footer stats from the MANIFEST
# (min-of-mins / max-of-maxs / sum-of-counts merge IN SPARK); only the
# intra-day boundary files are scanned. Oracle replays the grouped
# aggregate over raw events; planted pytests
# (test_metadata_aggs.py::test_agg_by_*) prove the fold by deleting
# data files and pin both tiers' equivalence.
# ---------------------------------------------------------------------------
@register(
    "q167_sql_group_agg_meta",
    oracle="""
SELECT event_type,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
WHERE ts >= TIMESTAMP '2024-01-03'
  AND ts < TIMESTAMP '2024-01-18 12:00:00'
GROUP BY event_type
ORDER BY event_type
""",
)
def q167_sql_group_agg_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    ev = _t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="lake_sql_gagg_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table(
        "bench.ev_gagg", ev.schema, partition_cols=["event_type"]
    )
    for d in range(1, 32, 2):
        t.append(
            ev.filter(
                (F.dayofmonth("ts") >= d) & (F.dayofmonth("ts") < d + 2)
            )
        )
    return lake_sql(
        cat,
        "SELECT event_type, MIN(ts) AS first_ts, MAX(ts) AS last_ts, "
        "COUNT(*) AS n FROM bench.ev_gagg "
        "WHERE ts >= '2024-01-03 00:00:00' "
        "AND ts < '2024-01-18 12:00:00' "
        "GROUP BY event_type ORDER BY event_type",
    )


# ---------------------------------------------------------------------------
# q168 — compound subquery DML WHERE (r10, VERDICT r9 #1): the
# incremental-maintenance DELETE shape — a key-set subquery ANDed with
# a time bound: `DELETE ... WHERE k IN (SELECT ...) AND ts < X`.
# Routed through ONE merge_into pass: the key set drives the semi-join
# (never collected to the driver), the range conjunct both gates the
# clause row-by-row AND prunes target files through target_branches
# (planted file-count proof in test_sql_subquery_compound.py). Three
# phases: compound IN + range, compound NOT IN over a NULL-bearing set
# (must no-op — any NULL key makes NOT IN never TRUE, regardless of
# the other conjuncts), compound NOT IN + range over a clean set. The
# oracle replays all three declaratively; survivors of sequential
# row-level DELETEs compose as the conjunction of NOT(phase_i).
# ---------------------------------------------------------------------------
@register(
    "q168_sql_delete_compound_subquery",
    oracle="""
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS revenue
FROM orders o
WHERE NOT (o.o_custkey IN (
             SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
           AND o.o_orderdate < TIMESTAMP '1995-01-01')
  AND NOT (o.o_custkey NOT IN (
             SELECT c_custkey FROM customer WHERE c_acctbal >= 0)
           AND o.o_orderdate >= TIMESTAMP '1997-06-01')
GROUP BY o_orderstatus
ORDER BY status
""",
)
def q168_sql_delete_compound_subquery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    root = tempfile.mkdtemp(prefix="lake_sql_comp_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.ord_comp", orders.schema)
    years = sorted(
        r["y"]
        for r in orders.select(
            F.year("o_orderdate").alias("y")
        ).distinct().collect()
    )
    for y in years:
        t.append(orders.filter(F.year("o_orderdate") == y).repartition(2))
    c = cat.create_table("bench.cust_comp", cust.schema)
    c.append(cust)
    # phase 1: key-set semi-join AND time bound — the range conjunct
    # prunes whole year-files out of the rewrite
    lake_sql(
        cat,
        "DELETE FROM bench.ord_comp WHERE o_custkey IN ("
        "SELECT c_custkey FROM bench.cust_comp "
        "WHERE c_mktsegment = 'BUILDING') "
        "AND o_orderdate < '1995-01-01'",
    )
    # phase 2: NULL-bearing NOT IN set — whole statement MUST no-op
    # even though the range conjunct alone would match rows
    lake_sql(
        cat,
        "DELETE FROM bench.ord_comp WHERE o_custkey NOT IN ("
        "SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END "
        "FROM bench.cust_comp) AND o_orderdate >= '1997-06-01'",
    )
    # phase 3: clean keep-set NOT IN AND time bound
    lake_sql(
        cat,
        "DELETE FROM bench.ord_comp WHERE o_custkey NOT IN ("
        "SELECT c_custkey FROM bench.cust_comp WHERE c_acctbal >= 0) "
        "AND o_orderdate >= '1997-06-01'",
    )
    return lake_sql(
        cat,
        "SELECT o_orderstatus AS status, COUNT(*) AS n, "
        "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2) "
        "AS DOUBLE) AS revenue "
        "FROM bench.ord_comp GROUP BY o_orderstatus ORDER BY status",
    )


# ---------------------------------------------------------------------------
# q169 — EXISTS / NOT EXISTS subquery DML (r10, VERDICT r9 #3):
# correlated-equality EXISTS rewrites onto the same merge machinery —
# `EXISTS (SELECT 1 FROM s WHERE s.k = t.k AND <inner filters>)` is
# the semi-join (matched clause), NOT EXISTS the anti-join (BY SOURCE
# clause; unlike NOT IN, NULL keys in the set are inert and a NULL
# target key FIRES the NOT EXISTS). Phase 1 updates recent orders of
# high-balance customers via correlated EXISTS + range; phase 2
# deletes old orders whose customer has no non-MACHINERY row via
# NOT EXISTS + range. The oracle replays both with DuckDB's native
# EXISTS, so a hash match proves the de-correlation rewrite exact.
# ---------------------------------------------------------------------------
@register(
    "q169_sql_exists_dml",
    oracle="""
WITH upd AS (
  SELECT CASE WHEN EXISTS (
           SELECT 1 FROM customer c
           WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 5000)
         AND o.o_orderdate >= TIMESTAMP '1997-01-01'
         THEN 'HOT' ELSE o.o_orderpriority END AS pri,
         o.o_custkey, o.o_orderdate, o.o_totalprice
  FROM orders o
)
SELECT pri,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS revenue
FROM upd u
WHERE NOT (NOT EXISTS (
             SELECT 1 FROM customer c
             WHERE c.c_custkey = u.o_custkey
               AND c.c_mktsegment <> 'MACHINERY')
           AND u.o_orderdate < TIMESTAMP '1994-01-01')
GROUP BY pri
ORDER BY pri
""",
)
def q169_sql_exists_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    root = tempfile.mkdtemp(prefix="lake_sql_exists_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.ord_ex", orders.schema)
    years = sorted(
        r["y"]
        for r in orders.select(
            F.year("o_orderdate").alias("y")
        ).distinct().collect()
    )
    for y in years:
        t.append(orders.filter(F.year("o_orderdate") == y).repartition(2))
    c = cat.create_table("bench.cust_ex", cust.schema)
    c.append(cust)
    # phase 1: correlated EXISTS semi-join + range conjunct (UPDATE)
    lake_sql(
        cat,
        "UPDATE bench.ord_ex SET o_orderpriority = 'HOT' "
        "WHERE EXISTS (SELECT 1 FROM bench.cust_ex c "
        "WHERE c.c_custkey = ord_ex.o_custkey AND c.c_acctbal > 5000) "
        "AND o_orderdate >= '1997-01-01'",
    )
    # phase 2: NOT EXISTS anti-join + range conjunct (DELETE)
    lake_sql(
        cat,
        "DELETE FROM bench.ord_ex "
        "WHERE NOT EXISTS (SELECT 1 FROM bench.cust_ex c "
        "WHERE c.c_custkey = ord_ex.o_custkey "
        "AND c.c_mktsegment <> 'MACHINERY') "
        "AND o_orderdate < '1994-01-01'",
    )
    return lake_sql(
        cat,
        "SELECT o_orderpriority AS pri, COUNT(*) AS n, "
        "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2) "
        "AS DOUBLE) AS revenue "
        "FROM bench.ord_ex GROUP BY o_orderpriority ORDER BY pri",
    )


# ---------------------------------------------------------------------------
# q170 — scalar-subquery WHERE inlining (r10, VERDICT r9 #5): THE
# incremental-consumer read shape — `SELECT ... WHERE ts > (SELECT
# MAX(ts) FROM checkpoint)`. The scalar is answered by the subquery's
# own fast path (a MAX fold over manifest stats — zero data reads when
# stats cover; tests plant this by deleting the checkpoint's files)
# and inlined as a literal, so the outer aggregate rides the pruned
# group-agg fold: whole year-files answer from metadata, only the
# boundary file scans. The checkpoint is itself populated through a
# fold (INSERT ... SELECT MAX(...) WHERE ...), so the oracle can
# derive the same watermark declaratively from raw orders.
# ---------------------------------------------------------------------------
@register(
    "q170_sql_scalar_watermark",
    oracle="""
SELECT o_orderpriority AS pri,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS revenue
FROM orders
WHERE o_orderdate > (
  SELECT MAX(o_orderdate) FROM orders
  WHERE o_orderdate < TIMESTAMP '1997-01-01'
)
GROUP BY o_orderpriority
ORDER BY pri
""",
)
def q170_sql_scalar_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    orders = _t(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="lake_sql_wm_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.ord_wm", orders.schema)
    years = sorted(
        r["y"]
        for r in orders.select(
            F.year("o_orderdate").alias("y")
        ).distinct().collect()
    )
    for y in years:
        t.append(orders.filter(F.year("o_orderdate") == y).repartition(2))
    cp = cat.create_table(
        "bench.wm_cp",
        spark.createDataFrame(
            [], orders.select(F.col("o_orderdate").alias("wm")).schema
        ).schema,
    )
    # the checkpoint row itself comes from a MAX fold over the lake
    lake_sql(
        cat,
        "INSERT INTO bench.wm_cp SELECT MAX(o_orderdate) AS wm "
        "FROM bench.ord_wm WHERE o_orderdate < '1997-01-01'",
    )
    return lake_sql(
        cat,
        "SELECT o_orderpriority AS pri, COUNT(*) AS n, "
        "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2) "
        "AS DOUBLE) AS revenue "
        "FROM bench.ord_wm "
        "WHERE o_orderdate > (SELECT MAX(wm) FROM bench.wm_cp) "
        "GROUP BY o_orderpriority ORDER BY pri",
    )


# ---------------------------------------------------------------------------
# q171 — grouped SUM/AVG manifest folds (r10, VERDICT r9 #8): the
# corpus-inventory shape — per-language character totals/averages over
# a ranged slice of the documents table. Parquet footers carry no
# sums, so the engine harvests exact per-file INTEGER sums into its
# own manifest at write time (column_sums — the manifest is ours,
# Iceberg parity not required); agg_by folds SUM, and AVG as
# SUM + non-null COUNT divided once after the merge, in the same
# two-tier fold as MIN/MAX/COUNT. Files the WHERE fully covers fold
# from metadata; boundary files scan; halves merge in Spark. Planted
# pytest (test_sum_folds.py) proves the fold by deleting data files
# and pins pre-upgrade back-compat (no sums ⇒ scan leg).
# ---------------------------------------------------------------------------
@register(
    "q171_sql_sum_fold",
    oracle="""
SELECT lang,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       AVG(n_chars) AS avg_chars,
       CAST(COUNT(*) AS BIGINT) AS n
FROM documents
WHERE doc_id >= 100
GROUP BY lang
ORDER BY lang
""",
)
def q171_sql_sum_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    docs = _t(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="lake_sql_sumfold_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.docs_sum", docs.schema)
    # several appends → several files, so the WHERE has both fully
    # covered files (fold) and a boundary file (scan)
    n = docs.count()
    step = max(n // 4, 1)
    for lo in range(0, n, step):
        t.append(
            docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + step)
            ).repartition(2)
        )
    return lake_sql(
        cat,
        "SELECT lang, SUM(n_chars) AS total_chars, AVG(n_chars) AS "
        "avg_chars, COUNT(*) AS n FROM bench.docs_sum "
        "WHERE doc_id >= 100 GROUP BY lang ORDER BY lang",
    )


# ---------------------------------------------------------------------------
# q172 — sibling-referencing CTE chain (r10, VERDICT r9 #2): the
# analyst-funnel shape — WITH recent AS (ranged scan), by_cust AS
# (aggregate OVER recent), final join to the dimension. Definition-
# order resolution makes BOTH bodies ride the recursive fast-path
# dispatch (the first body's range WHERE plans only matching files;
# the second body's FROM reference rewrites onto the resolved lazy
# view, keeping the CTE name as its alias). Oracle replays the same
# chain in DuckDB.
# ---------------------------------------------------------------------------
@register(
    "q172_sql_cte_chain",
    oracle="""
WITH recent AS (
  SELECT o_custkey, o_totalprice
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
), by_cust AS (
  SELECT o_custkey,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS spend
  FROM recent
  GROUP BY o_custkey
)
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(ROUND(SUM(b.spend), 2) AS DOUBLE) AS revenue
FROM by_cust b
JOIN customer c ON b.o_custkey = c.c_custkey
WHERE b.n_orders >= 2
GROUP BY c.c_mktsegment
ORDER BY segment
""",
)
def q172_sql_cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    root = tempfile.mkdtemp(prefix="lake_sql_ctechain_")
    cat = LocalLakeCatalog(spark, root).start()
    fact = cat.create_table("bench.chain_orders", orders.schema)
    years = sorted(
        r["y"]
        for r in orders.select(
            F.year("o_orderdate").alias("y")
        ).distinct().collect()
    )
    for y in years:
        fact.append(
            orders.filter(F.year("o_orderdate") == y).repartition(2)
        )
    dim = cat.create_table("bench.chain_cust", cust.schema)
    dim.append(cust)
    return lake_sql(
        cat,
        "WITH recent AS ("
        "  SELECT o_custkey, o_totalprice FROM bench.chain_orders"
        "  WHERE o_orderdate >= '1996-01-01'"
        "  AND o_orderdate < '1997-01-01'"
        "), by_cust AS ("
        "  SELECT o_custkey, COUNT(*) AS n_orders, "
        "  SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS spend "
        "  FROM recent GROUP BY o_custkey"
        ") "
        "SELECT c.c_mktsegment AS segment, COUNT(*) AS n_cust, "
        "CAST(ROUND(SUM(b.spend), 2) AS DOUBLE) AS revenue "
        "FROM by_cust b JOIN bench.chain_cust c "
        "ON b.o_custkey = c.c_custkey "
        "WHERE b.n_orders >= 2 "
        "GROUP BY c.c_mktsegment ORDER BY segment",
    )


# ---------------------------------------------------------------------------
# q173 — disjunctive ON pruning (r10, VERDICT r9 #4): a fact-dim join
# whose ON carries a parenthesized OR of two date windows — the
# "campaign periods" shape. The tolerant extractor distributes the
# disjunction over the branch set, so only year-files intersecting
# EITHER window are planned; results replay exactly in DuckDB's
# native join.
# ---------------------------------------------------------------------------
@register(
    "q173_sql_disjunctive_on",
    oracle="""
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS revenue
FROM orders o
JOIN customer c
  ON o.o_custkey = c.c_custkey
 AND (o.o_orderdate < TIMESTAMP '1993-01-01'
      OR o.o_orderdate >= TIMESTAMP '1997-06-01')
GROUP BY c.c_mktsegment
ORDER BY segment
""",
)
def q173_sql_disjunctive_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    root = tempfile.mkdtemp(prefix="lake_sql_dison_")
    cat = LocalLakeCatalog(spark, root).start()
    fact = cat.create_table("bench.dison_orders", orders.schema)
    years = sorted(
        r["y"]
        for r in orders.select(
            F.year("o_orderdate").alias("y")
        ).distinct().collect()
    )
    for y in years:
        fact.append(
            orders.filter(F.year("o_orderdate") == y).repartition(2)
        )
    dim = cat.create_table("bench.dison_cust", cust.schema)
    dim.append(cust)
    return lake_sql(
        cat,
        "SELECT c.c_mktsegment AS segment, COUNT(*) AS n, "
        "CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(38,2))), 2) "
        "AS DOUBLE) AS revenue "
        "FROM bench.dison_orders o JOIN bench.dison_cust c "
        "ON o.o_custkey = c.c_custkey "
        "AND (o.o_orderdate < '1993-01-01' "
        "OR o.o_orderdate >= '1997-06-01') "
        "GROUP BY c.c_mktsegment ORDER BY segment",
    )


# ---------------------------------------------------------------------------
# q174 — scalar subqueries beyond WHERE (r11, VERDICT r10 #2): the
# reference-data maintenance shape. An UPDATE caps late orders' price
# at a value read from a checkpoint table via `SET o_totalprice =
# (SELECT MAX(cap) ...)` — the scalar folds from the cap table's
# manifests (zero data reads when stats cover; test_sql_scalar_set.py
# proves it by deleting the cap files) and lands as a typed literal,
# so the UPDATE itself still range-prunes target files. The follow-up
# read carries a SELECT-LIST scalar (`(SELECT COUNT(*) ...) AS
# grand_n`) that inlines the same way — answered by a COUNT fold —
# while the grouped aggregate rides its pruned fast path. The oracle
# derives cap and grand_n declaratively from raw orders.
# ---------------------------------------------------------------------------
@register(
    "q174_sql_scalar_set",
    oracle="""
WITH cap AS (
  SELECT MAX(o_totalprice) AS cap FROM orders
  WHERE o_orderdate < TIMESTAMP '1995-01-01'
),
upd AS (
  SELECT CASE WHEN o_orderdate >= TIMESTAMP '1997-06-01'
              THEN (SELECT cap FROM cap) ELSE o_totalprice END AS price,
         o_orderpriority
  FROM orders
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS grand_n,
       o_orderpriority AS pri,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(CAST(price AS DECIMAL(38,2))), 2) AS DOUBLE) AS revenue
FROM upd
GROUP BY o_orderpriority
ORDER BY pri
""",
)
def q174_sql_scalar_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    orders = _t(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="lake_sql_scalarset_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.ord_ss", orders.schema)
    years = sorted(
        r["y"]
        for r in orders.select(
            F.year("o_orderdate").alias("y")
        ).distinct().collect()
    )
    for y in years:
        t.append(orders.filter(F.year("o_orderdate") == y).repartition(2))
    cap = cat.create_table(
        "bench.cap_ss",
        spark.createDataFrame(
            [], orders.select(F.col("o_totalprice").alias("cap")).schema
        ).schema,
    )
    # the cap row itself comes from a MAX fold over the lake
    lake_sql(
        cat,
        "INSERT INTO bench.cap_ss SELECT MAX(o_totalprice) AS cap "
        "FROM bench.ord_ss WHERE o_orderdate < '1995-01-01'",
    )
    # SET scalar: folds from cap_ss manifests, inlines as a literal,
    # and the UPDATE's WHERE still range-prunes target files
    lake_sql(
        cat,
        "UPDATE bench.ord_ss SET o_totalprice = "
        "(SELECT MAX(cap) FROM bench.cap_ss) "
        "WHERE o_orderdate >= '1997-06-01'",
    )
    # select-list scalar: inlines from a COUNT fold
    return lake_sql(
        cat,
        "SELECT (SELECT COUNT(*) FROM bench.ord_ss) AS grand_n, "
        "o_orderpriority AS pri, COUNT(*) AS n, "
        "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2) "
        "AS DOUBLE) AS revenue "
        "FROM bench.ord_ss GROUP BY o_orderpriority ORDER BY pri",
    )


# ---------------------------------------------------------------------------
# q175 — key-set file pruning for SELECT `WHERE k IN (SELECT ...)`
# (r11, VERDICT r10 #3): the incremental-batch read shape — aggregate
# the fact slice whose keys appear in a recent-batch table. DML got
# this pruning in r8 (q161); reads declined to native Spark until now.
# The fact table is appended in l_orderkey-range buckets, so the
# uncorrelated IN-subquery's key range ([0, 1000)) lets
# scan_pruned_by_keys skip every out-of-range bucket via the eq-delete
# range+bloom tiers (planted file-count gate in
# tests/test_sql_in_prune.py; probe-domain type gate verified there
# too). A date conjunct composes: it keeps its own branch pruning and
# row filtering.
# ---------------------------------------------------------------------------
@register(
    "q175_sql_in_prune",
    oracle="""
SELECT l_returnflag AS rf,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
FROM lineitem
WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders
        WHERE o_orderkey < 1000 AND o_orderpriority = '1-URGENT'
      )
  AND l_shipdate >= TIMESTAMP '1995-01-01'
GROUP BY l_returnflag
ORDER BY rf
""",
)
def q175_sql_in_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="lake_sql_inprune_")
    cat = LocalLakeCatalog(spark, root).start()
    fact = cat.create_table("bench.li_ip", li.schema)
    hi = li.agg(F.max("l_orderkey")).first()[0] + 1
    step = max(hi // 4, 1)
    for lo in range(0, hi, step):
        fact.append(
            li.filter(
                (F.col("l_orderkey") >= lo) & (F.col("l_orderkey") < lo + step)
            ).repartition(2)
        )
    batch = cat.create_table("bench.ord_ip", orders.schema)
    batch.append(orders)
    return lake_sql(
        cat,
        "SELECT l_returnflag AS rf, COUNT(*) AS n, "
        "SUM(CAST(l_quantity AS BIGINT)) AS qty FROM bench.li_ip "
        "WHERE l_orderkey IN (SELECT o_orderkey FROM bench.ord_ip "
        "WHERE o_orderkey < 1000 AND o_orderpriority = '1-URGENT') "
        "AND l_shipdate >= '1995-01-01' "
        "GROUP BY l_returnflag ORDER BY rf",
    )


# ---------------------------------------------------------------------------
# q176 — multiple subquery conjuncts in one DML WHERE (r11, VERDICT
# r10 #5): the chained incremental-maintenance DELETE the r10 router
# refused ("at most one subquery conjunct") — prune BUILDING-segment
# orders (IN) excluding well-funded accounts (NOT IN) before a cutoff
# (range conjunct). Both key sets and the grammar remainder feed ONE
# merge pass: the target chains a semi + anti join, the surviving key
# tuples become the merge source, the range conjunct still prunes
# target files (target_branches) and gates rows (matched_condition).
# NULL-phase semantics (NULL-bearing NOT IN set voids the statement)
# are pinned in tests/test_sql_multi_subquery.py.
# ---------------------------------------------------------------------------
@register(
    "q176_sql_multi_subquery",
    oracle="""
SELECT o_orderpriority AS pri,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS revenue
FROM orders
WHERE NOT (
    o_custkey IN (SELECT c_custkey FROM customer
                  WHERE c_mktsegment = 'BUILDING')
    AND o_custkey NOT IN (SELECT c_custkey FROM customer
                          WHERE c_acctbal > 5000)
    AND o_orderdate < TIMESTAMP '1994-01-01'
)
GROUP BY o_orderpriority
ORDER BY pri
""",
)
def q176_sql_multi_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    root = tempfile.mkdtemp(prefix="lake_sql_multisub_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.ord_mq", orders.schema)
    years = sorted(
        r["y"]
        for r in orders.select(
            F.year("o_orderdate").alias("y")
        ).distinct().collect()
    )
    for y in years:
        t.append(orders.filter(F.year("o_orderdate") == y).repartition(2))
    c = cat.create_table("bench.cust_mq", cust.schema)
    c.append(cust)
    lake_sql(
        cat,
        "DELETE FROM bench.ord_mq "
        "WHERE o_custkey IN (SELECT c_custkey FROM bench.cust_mq "
        "WHERE c_mktsegment = 'BUILDING') "
        "AND o_custkey NOT IN (SELECT c_custkey FROM bench.cust_mq "
        "WHERE c_acctbal > 5000) "
        "AND o_orderdate < '1994-01-01'",
    )
    return lake_sql(
        cat,
        "SELECT o_orderpriority AS pri, COUNT(*) AS n, "
        "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,2))), 2) "
        "AS DOUBLE) AS revenue "
        "FROM bench.ord_mq GROUP BY o_orderpriority ORDER BY pri",
    )


# ---------------------------------------------------------------------------
# q177 — COUNT(DISTINCT) grouped fold (r11, VERDICT r10 #6): the
# corpus-diversity shape — per-language distinct source and distinct
# char-length counts over a ranged slice of the documents table.
# Write-time per-file EXACT value sets (`column_distincts`: integer
# leaves by default, `source` opted in via
# write.stats.distinct-columns) merge by union IN SPARK with the
# boundary scan leg's collect_set — exact, never an estimate; files
# without a fitting sketch (over write.stats.distinct-cap,
# pre-upgrade manifests) route to the scan leg.
# tests/test_count_distinct_fold.py proves the fold by deleting data
# files and pins the over-cap/opt-out/back-compat routes.
# ---------------------------------------------------------------------------
@register(
    "q177_sql_count_distinct_fold",
    oracle="""
SELECT lang,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(COUNT(DISTINCT n_chars) AS BIGINT) AS n_lengths,
       CAST(COUNT(*) AS BIGINT) AS n
FROM documents
WHERE doc_id >= 100
GROUP BY lang
ORDER BY lang
""",
)
def q177_sql_count_distinct_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    docs = _t(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="lake_sql_cdfold_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.docs_cd", docs.schema)
    t.set_property("write.stats.distinct-columns", "source")
    t.set_property("write.stats.distinct-cap", "4096")
    # several appends → the WHERE fully covers some files (fold) and
    # cuts one (boundary scan); halves union-merge in Spark
    n = docs.count()
    step = max(n // 4, 1)
    for lo in range(0, n, step):
        t.append(
            docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + step)
            ).repartition(2)
        )
    return lake_sql(
        cat,
        "SELECT lang, COUNT(DISTINCT source) AS n_sources, "
        "COUNT(DISTINCT n_chars) AS n_lengths, COUNT(*) AS n "
        "FROM bench.docs_cd WHERE doc_id >= 100 "
        "GROUP BY lang ORDER BY lang",
    )


# ---------------------------------------------------------------------------
# q178 — multiple IN-subquery conjuncts on a READ (r11): the
# cross-filter shape — lineitems whose order is URGENT (first key set)
# AND whose part is small-size (second key set), over the
# quartile-bucketed fact. Each term's range+bloom skip set UNIONS
# (an AND conjunct any term proves unhittable for a file kills the
# file), so the scan is at most as wide as the tightest term; both IN
# terms re-aim at resolved key views in the rebuilt statement
# (planted union-prune gate in tests/test_sql_in_prune.py).
# ---------------------------------------------------------------------------
@register(
    "q178_sql_multi_in_read",
    oracle="""
SELECT l_returnflag AS rf,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
FROM lineitem
WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders
        WHERE o_orderkey < 2000 AND o_orderpriority = '1-URGENT'
      )
  AND l_partkey IN (
        SELECT p_partkey FROM part WHERE p_size <= 20
      )
GROUP BY l_returnflag
ORDER BY rf
""",
)
def q178_sql_multi_in_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part")
    root = tempfile.mkdtemp(prefix="lake_sql_multiin_")
    cat = LocalLakeCatalog(spark, root).start()
    fact = cat.create_table("bench.li_mi", li.schema)
    hi = li.agg(F.max("l_orderkey")).first()[0] + 1
    step = max(hi // 4, 1)
    for lo in range(0, hi, step):
        fact.append(
            li.filter(
                (F.col("l_orderkey") >= lo) & (F.col("l_orderkey") < lo + step)
            ).repartition(2)
        )
    o = cat.create_table("bench.ord_mi", orders.schema)
    o.append(orders)
    p = cat.create_table("bench.part_mi", part.schema)
    p.append(part)
    return lake_sql(
        cat,
        "SELECT l_returnflag AS rf, COUNT(*) AS n, "
        "SUM(CAST(l_quantity AS BIGINT)) AS qty FROM bench.li_mi "
        "WHERE l_orderkey IN (SELECT o_orderkey FROM bench.ord_mi "
        "WHERE o_orderkey < 2000 AND o_orderpriority = '1-URGENT') "
        "AND l_partkey IN (SELECT p_partkey FROM bench.part_mi "
        "WHERE p_size <= 20) "
        "GROUP BY l_returnflag ORDER BY rf",
    )


# ---------------------------------------------------------------------------
# q179 — top-k read fast path from manifest stats (r12, VERDICT r11
# #3): the "latest N rows" dashboard read — ``ORDER BY ts DESC LIMIT
# k`` over a year-chunked ingest. ``plan_files_topk`` proves a value
# bound at least k rows beat by walking candidate files' MINs
# descending and accumulating non-null row counts, then keeps only
# files whose MAX can still reach the bound — the residual statement
# re-runs against the pruned view, so ordering, ties, the secondary
# key, and LIMIT are exact Spark semantics. A WHERE conjunct composes
# (full-cover counting). Planted kept-file-count gates + the decline
# ladder (MoR tombstones, float NaN hazard, alias shadowing, plain
# ASC over nullables, thin stats) in tests/test_topk_read.py.
# ---------------------------------------------------------------------------
@register(
    "q179_sql_topk_read",
    oracle="""
SELECT o_orderkey AS okey,
       CAST(o_orderdate AS TIMESTAMP) AS odate,
       o_totalprice AS price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1994-01-01'
ORDER BY o_orderdate DESC, o_orderkey ASC
LIMIT 50
""",
)
def q179_sql_topk_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    orders = _t(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="lake_sql_topk_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.ord_tk", orders.schema)
    years = sorted(
        r["y"]
        for r in orders.select(
            F.year("o_orderdate").alias("y")
        ).distinct().collect()
    )
    for y in years:
        t.append(orders.filter(F.year("o_orderdate") == y).repartition(2))
    return lake_sql(
        cat,
        "SELECT o_orderkey AS okey, o_orderdate AS odate, "
        "o_totalprice AS price FROM bench.ord_tk "
        "WHERE o_orderdate >= '1994-01-01' "
        "ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 50",
    )


# ---------------------------------------------------------------------------
# q180 — APPROX_COUNT_DISTINCT from write-time HLL sketches (r12,
# VERDICT r11 #7): per-file dense registers (write.stats.hll-columns
# opt-in, md5-hashed → engine-neutral) merge by bytewise max, one
# estimator call answers from metadata — the tier above the exact
# distinct sets for columns whose NDV overflows
# write.stats.distinct-cap. q57-style bounded-error gate: the driver
# hashes the exact count and a boolean asserting the sketch landed
# within 10% relative error (the sketch value itself is
# engine-specific). Metadata-answer proof (nuked data files), merge
# associativity, cap interaction, and the decline ladder are in
# tests/test_hll_fold.py.
# ---------------------------------------------------------------------------
@register(
    "q180_sql_approx_cd_fold",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS approx_within_10pct
FROM lineitem
""",
)
def q180_sql_approx_cd_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    li = _t(spark, sf_dir, "lineitem")
    root = tempfile.mkdtemp(prefix="lake_sql_hll_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.li_hll", li.schema)
    t.set_property("write.stats.hll-columns", "l_partkey")
    hi = li.agg(F.max("l_orderkey")).first()[0] + 1
    step = max(hi // 4, 1)
    for lo in range(0, hi, step):
        t.append(
            li.filter(
                (F.col("l_orderkey") >= lo) & (F.col("l_orderkey") < lo + step)
            ).repartition(2)
        )
    got = lake_sql(
        cat,
        "SELECT APPROX_COUNT_DISTINCT(l_partkey) AS a, COUNT(*) AS n "
        "FROM bench.li_hll",
    ).first()
    exact = li.select(F.countDistinct("l_partkey")).first()[0]
    return spark.createDataFrame(
        [(got["n"], exact, abs(got["a"] - exact) <= 0.10 * exact)],
        "n long, exact_parts long, approx_within_10pct boolean",
    )


# ---------------------------------------------------------------------------
# q181 — Iceberg v2 metadata export, driver-checked (r12, VERDICT r11
# #5): export a lake snapshot as a genuine Iceberg v2 tree
# (lake/iceberg_export.py), then answer the query FROM THE EXPORTED
# METADATA ALONE — total records summed over the manifest Avro's
# entries, and the global o_orderkey extremes decoded from the spec's
# single-value binary lower/upper bounds. The oracle recomputes the
# same three values from the raw table, so a wrong record count, a
# mis-serialized bound, or a mis-encoded Avro framing all flip the
# hash. JVM avro reference-reader cross-check + tombstone/type
# refusals live in tests/test_iceberg_export.py.
# ---------------------------------------------------------------------------
@register(
    "q181_iceberg_export",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS total_records,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_okey,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_okey,
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_status
FROM orders
""",
)
def q181_iceberg_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import struct
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.iceberg_export import export_iceberg_snapshot
    from icebergplus_spark.sources.avro_io import read_ocf_generic

    orders = _t(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="lake_ice_exp_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.ord_ice", orders.schema)
    hi = orders.agg(F.max("o_orderkey")).first()[0] + 1
    step = max(hi // 3, 1)
    for lo in range(0, hi, step):
        t.append(
            orders.filter(
                (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < lo + step)
            ).repartition(2)
        )
    meta_path = export_iceberg_snapshot(t, tempfile.mkdtemp(prefix="ice_"))
    with open(meta_path) as f:
        md = json.load(f)
    _, [mlist] = read_ocf_generic(md["snapshots"][0]["manifest-list"])
    _, entries = read_ocf_generic(mlist["manifest_path"])
    okey_id = t.field_ids["o_orderkey"]
    total = 0
    lo_v = hi_v = None
    for e in entries:
        d = e["data_file"]
        total += d["record_count"]
        lows = {b["key"]: b["value"] for b in d["lower_bounds"]}
        highs = {b["key"]: b["value"] for b in d["upper_bounds"]}
        flo = struct.unpack("<q", lows[okey_id])[0]
        fhi = struct.unpack("<q", highs[okey_id])[0]
        lo_v = flo if lo_v is None else min(lo_v, flo)
        hi_v = fhi if hi_v is None else max(hi_v, fhi)
    # the referenced parquet is directly readable by any engine —
    # prove it by answering the status cardinality FROM those files
    paths = [e["data_file"]["file_path"] for e in entries]
    n_status = (
        spark.read.parquet(*paths)
        .select(F.countDistinct("o_orderstatus"))
        .first()[0]
    )
    return local_rows_df(
        spark,
        [(total, lo_v, hi_v, n_status)],
        "total_records long, min_okey long, max_okey long, n_status long",
    )


# ---------------------------------------------------------------------------
# q182 — GROUPED APPROX_COUNT_DISTINCT fold (r12): the per-partition
# diversity dashboard — customers per order-priority — answered from
# write-time HLL sketches when the ingest is clustered by the group
# column (one append per priority → files single-valued in it, the
# same layout count_rows_by exploits). Registers merge per group by
# bytewise max on the driver (group count ≤ file count in the fold
# tier); COUNT(*) rides record_count. q57-style gate: exact per-group
# counts + booleans asserting every sketch landed within 10%.
# Multi-valued layouts / unsketched files fall to Spark's scan-side
# HLL++ (tests/test_hll_fold.py pins both routes + the nuked-files
# metadata proof).
# ---------------------------------------------------------------------------
@register(
    "q182_sql_grouped_acd_fold",
    oracle="""
SELECT o_orderpriority AS pri,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_cust,
       TRUE AS approx_within_10pct
FROM orders
GROUP BY o_orderpriority
ORDER BY pri
""",
)
def q182_sql_grouped_acd_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    orders = _t(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="lake_sql_gacd_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.ord_ga", orders.schema)
    t.set_property("write.stats.hll-columns", "o_custkey")
    pris = sorted(
        r[0]
        for r in orders.select("o_orderpriority").distinct().collect()
    )
    for p in pris:  # clustered ingest: files single-valued in the group col
        t.append(
            orders.filter(F.col("o_orderpriority") == p).repartition(2)
        )
    approx = {
        r["o_orderpriority"]: (r["a"], r["n"])
        for r in lake_sql(
            cat,
            "SELECT o_orderpriority, "
            "APPROX_COUNT_DISTINCT(o_custkey) AS a, COUNT(*) AS n "
            "FROM bench.ord_ga GROUP BY o_orderpriority",
        ).collect()
    }
    exact = {
        r["pri"]: r["e"]
        for r in orders.groupBy(F.col("o_orderpriority").alias("pri"))
        .agg(F.countDistinct("o_custkey").alias("e"))
        .collect()
    }
    return spark.createDataFrame(
        [
            (
                p,
                approx[p][1],
                exact[p],
                abs(approx[p][0] - exact[p]) <= 0.10 * exact[p],
            )
            for p in pris
        ],
        "pri string, n long, exact_cust long, approx_within_10pct boolean",
    ).orderBy("pri")


# ---------------------------------------------------------------------------
# q183 — Iceberg v2 IMPORT round-trip (r12): the reverse of q181 — a
# lake snapshot exported as genuine Iceberg v2 metadata is read BACK
# through `read_iceberg_snapshot` (metadata.json → manifest-list Avro
# → manifest Avro → the live parquet set, version-hint discovery) and
# aggregated; the oracle recomputes the same aggregate from the raw
# table, so any wrong path resolution, Avro decode, status filter, or
# schema projection flips the hash. Foreign-written-Avro import and
# the delete-manifest refusal are pinned in
# tests/test_iceberg_export.py.
# ---------------------------------------------------------------------------
@register(
    "q183_iceberg_import",
    oracle="""
SELECT o_orderstatus AS st,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_custkey AS BIGINT)) AS BIGINT) AS ck_sum
FROM orders
GROUP BY o_orderstatus
ORDER BY st
""",
)
def q183_iceberg_import(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.iceberg_export import (
        export_iceberg_snapshot,
        read_iceberg_snapshot,
    )

    orders = _t(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="lake_ice_imp_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.ord_imp", orders.schema)
    hi = orders.agg(F.max("o_orderkey")).first()[0] + 1
    step = max(hi // 3, 1)
    for lo in range(0, hi, step):
        t.append(
            orders.filter(
                (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < lo + step)
            ).repartition(2)
        )
    dest = tempfile.mkdtemp(prefix="ice_imp_")
    export_iceberg_snapshot(t, dest)
    back = read_iceberg_snapshot(spark, dest)  # version-hint discovery
    return (
        back.groupBy(F.col("o_orderstatus").alias("st"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_custkey").alias("ck_sum"),
        )
        .orderBy("st")
    )
