"""ANALYZE TABLE statistics: one-pass exact/approx column stats
persisted per-snapshot in table metadata (Iceberg puffin parity)."""

import pytest

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.sources import load_table


@pytest.fixture()
def table(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    cat = LocalLakeCatalog(spark, str(tmp_path)).start()
    t = cat.create_table("db.orders", orders.schema)
    return t.append(orders), orders


def test_exact_stats_match_data(table, spark):
    t, orders = table
    t = t.analyze(mode="exact")
    cols = t.statistics["columns"]
    assert t.statistics["mode"] == "exact"
    assert t.statistics_fresh
    import pyspark.sql.functions as F

    truth = orders.agg(
        F.countDistinct("o_custkey").alias("ndv"),
        F.min(F.col("o_totalprice")).cast("string").alias("mn"),
        F.max(F.col("o_totalprice")).cast("string").alias("mx"),
    ).collect()[0]
    assert cols["o_custkey"]["ndv"] == truth.ndv
    assert cols["o_totalprice"]["min"] == truth.mn
    assert cols["o_totalprice"]["max"] == truth.mx
    assert all(v["null_count"] == 0 for v in cols.values())


def test_approx_stats_within_hll_error(table):
    t, orders = table
    t = t.analyze(columns=["o_custkey"], mode="approx")
    assert t.statistics["mode"] == "approx"
    exact = orders.select("o_custkey").distinct().count()
    approx = t.statistics["columns"]["o_custkey"]["ndv"]
    assert abs(approx - exact) / exact < 0.1  # HLL++ default rsd 5%


def test_stats_go_stale_on_write(table, spark):
    t, orders = table
    t = t.analyze(mode="exact")
    assert t.statistics_fresh
    t = t.append(orders.limit(5))
    assert t.statistics is not None  # kept (snapshot-keyed, like puffin)
    assert not t.statistics_fresh  # but marked stale for the new snapshot
    rows = {r.column: r for r in t.metadata_df("statistics").collect()}
    assert not rows["o_custkey"].is_fresh


def test_auto_mode_picks_exact_for_small(table):
    t, _ = table
    t = t.analyze(columns=["o_orderstatus"])
    assert t.statistics["mode"] == "exact"
    assert t.statistics["columns"]["o_orderstatus"]["ndv"] <= 3


def test_unknown_column_rejected(table):
    t, _ = table
    with pytest.raises(ValueError, match="unknown columns"):
        t.analyze(columns=["nope"])
