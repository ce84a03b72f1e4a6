"""SQL front-end: the engine's queries are equally expressible as
``spark.sql`` over registered views (SURVEY.md §2.B — Catalyst compiles
SQL and DataFrame code to the same plans). These entries prove the SQL
surface end-to-end with the same oracle discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from icebergplus_spark.registry import register
from icebergplus_spark.session import prepare_session
from icebergplus_spark.sources import register_views


def _sql(spark: SparkSession, sf_dir: str, tables: list[str], query: str) -> DataFrame:
    prepare_session(spark)
    register_views(spark, sf_dir, tables)
    return spark.sql(query)


# shipping-modes style: CASE buckets + two-level agg, pure SQL
_Q50 = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_totalprice >= 150000 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_totalprice <  150000 THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o_orderpriority
"""


@register("q50_sql_frontend", oracle=_Q50)
def q50_sql_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the SAME SQL text runs on Spark and on the DuckDB oracle
    return _sql(spark, sf_dir, ["orders", "lineitem"], _Q50)


_Q51 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register("q51_sql_top_supplier", oracle=_Q51)
def q51_sql_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CTE + scalar subquery in the WHERE clause (TPC-H Q15 shape)
    return _sql(spark, sf_dir, ["supplier", "lineitem"], _Q51)


# aggregate FILTER clause — identical syntax in Spark SQL and DuckDB, so
# the same text runs on both engines (conditional aggregation without
# CASE scaffolding; each FILTER is a separate accumulator in the same
# single-pass two-phase hash aggregate — no extra scan or shuffle)
_Q98 = """
SELECT l_returnflag,
       COUNT(*) AS n_all,
       COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
       CAST(SUM(l_quantity) FILTER (WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00') AS BIGINT) AS qty_recent,
       CAST(SUM(l_quantity) FILTER (WHERE l_tax > 0.03) AS BIGINT) AS qty_taxed
FROM lineitem
GROUP BY l_returnflag
"""


@register("q98_filter_agg", oracle=_Q98)
def q98_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the SAME SQL text runs on Spark and on the DuckDB oracle
    return _sql(spark, sf_dir, ["lineitem"], _Q98)


# GROUP BY ALL / ORDER BY ALL (modern SQL sugar both engines support —
# DuckDB introduced it, Spark 3.4+ adopted it): every non-aggregate
# select item becomes a grouping key. One shared text, both engines.
_Q126 = """
SELECT n_regionkey,
       c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS total_balance
FROM customer
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ALL
ORDER BY ALL
"""


@register("q126_group_by_all", oracle=_Q126)
def q126_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, ["customer", "nation"], _Q126)


# Multiset (bag) set operations — INTERSECT ALL / EXCEPT ALL keep
# duplicates (q14 covers the distinct variants); one shared text.
_Q127 = """
WITH a AS (SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
     b AS (SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 0)
SELECT 'intersect_all' AS op, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
UNION ALL
SELECT 'except_all' AS op, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
UNION ALL
SELECT 'union_all' AS op, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT k FROM a UNION ALL SELECT k FROM b)
"""


@register("q127_setops_all", oracle=_Q127)
def q127_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, ["customer"], _Q127)


# SQL UNPIVOT syntax (Spark 3.4+ statement form; q38 covers the
# DataFrame melt). DuckDB's UNPIVOT grammar differs, so the oracle is
# the explicit UNION ALL desugaring — same rows either way.
_Q130_SPARK = """
SELECT c_nationkey, metric, CAST(ROUND(val, 2) AS DOUBLE) AS val
FROM (
  SELECT c_nationkey,
         SUM(CAST(c_acctbal AS DECIMAL(38,2))) AS total_balance,
         CAST(COUNT(*) AS DECIMAL(38,2)) AS n_customers
  FROM customer
  GROUP BY c_nationkey
)
UNPIVOT (val FOR metric IN (total_balance, n_customers))
"""

_Q130_ORACLE = """
WITH agg AS (
  SELECT c_nationkey,
         SUM(CAST(c_acctbal AS DECIMAL(38,2))) AS total_balance,
         CAST(COUNT(*) AS DECIMAL(38,2)) AS n_customers
  FROM customer
  GROUP BY c_nationkey
)
SELECT c_nationkey, 'total_balance' AS metric,
       CAST(ROUND(total_balance, 2) AS DOUBLE) AS val FROM agg
UNION ALL
SELECT c_nationkey, 'n_customers',
       CAST(ROUND(n_customers, 2) AS DOUBLE) FROM agg
"""


@register("q130_sql_unpivot", oracle=_Q130_ORACLE)
def q130_sql_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, ["customer"], _Q130_SPARK)


# ---------------------------------------------------------------------------
# q138 — the round-4 SQL lifecycle under the oracle gate: a lake
# warehouse driven ENTIRELY through lake_sql — CTAS from a session
# view, a BEGIN/COMMIT multi-table transaction (INSERT + INSERT
# OVERWRITE in one atomic flip), a second transaction that aborts
# mid-batch (its first INSERT must be invisible too), then a joined
# read over the catalog tables. A hash match proves the SQL frontend's
# transactional statements produce exactly the state the oracle
# computes — including NOT containing the aborted transaction's rows.
# ---------------------------------------------------------------------------
@register(
    "q138_sql_txn_lifecycle",
    oracle="""
WITH big AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
  WHERE o_totalprice > 100000
),
fact AS (
  SELECT * FROM big WHERE o_orderkey % 3 = 0
),
dim AS (
  SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 2 = 0
)
SELECT d.c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(f.o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS sum_price
FROM fact f JOIN dim d ON f.o_custkey = d.c_custkey
GROUP BY d.c_mktsegment
""",
)
def q138_sql_txn_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    prepare_session(spark)
    register_views(spark, sf_dir, ["orders", "customer"])
    cat = LocalLakeCatalog(spark, tempfile.mkdtemp(prefix="lake_sqltxn_")).start()

    # CTAS from the session view
    lake_sql(
        cat,
        "CREATE TABLE bench.big AS "
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
        "WHERE o_totalprice > 100000",
    )
    lake_sql(
        cat,
        "CREATE TABLE bench.fact AS SELECT * FROM bench.big WHERE 1 = 0",
    )
    lake_sql(
        cat,
        "CREATE TABLE bench.dim AS "
        "SELECT c_custkey, c_mktsegment FROM customer WHERE 1 = 0",
    )

    # committed transaction: fact slice + dim replacement, one flip
    lake_sql(
        cat,
        """
        BEGIN TRANSACTION;
        INSERT INTO bench.fact SELECT * FROM bench.big WHERE o_orderkey % 3 = 0;
        INSERT OVERWRITE bench.dim
          SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 2 = 0;
        COMMIT
        """,
    )

    # failed transaction: a valid INSERT is buffered, then the batch
    # fails on a missing table — the buffered INSERT must never run
    # (all-or-nothing; the staged-then-aborted window is q131's gate)
    try:
        lake_sql(
            cat,
            """
            BEGIN;
            INSERT INTO bench.fact SELECT * FROM bench.big WHERE o_orderkey % 3 = 1;
            INSERT INTO bench.missing_table SELECT * FROM bench.big;
            COMMIT
            """,
        )
    except Exception:
        pass

    return lake_sql(
        cat,
        "SELECT d.c_mktsegment, COUNT(*) AS n_orders, "
        "CAST(ROUND(SUM(CAST(f.o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE) "
        "  AS sum_price "
        "FROM bench.fact f JOIN bench.dim d ON f.o_custkey = d.c_custkey "
        "GROUP BY d.c_mktsegment",
    )
