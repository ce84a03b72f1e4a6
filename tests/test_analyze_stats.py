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


def test_top_k_heavy_hitters_single_pass(table):
    t, orders = table
    t = t.analyze(columns=["o_orderstatus", "o_orderpriority"], mode="exact", top_k=3)
    top = t.statistics["columns"]["o_orderstatus"]["top"]
    assert 1 <= len(top) <= 3
    # descending counts, and the top value matches a direct groupBy
    counts = [e["count"] for e in top]
    assert counts == sorted(counts, reverse=True)
    import pyspark.sql.functions as F

    truth = (
        orders.groupBy("o_orderstatus")
        .count()
        .orderBy(F.desc("count"), "o_orderstatus")
        .first()
    )
    assert top[0]["value"] == truth.o_orderstatus
    assert top[0]["count"] == truth["count"]
    # columns analyzed without top_k context don't carry a 'top'
    assert "top" in t.statistics["columns"]["o_orderpriority"]


def test_advise_join_strategies(spark, sf_dir, tmp_path):
    import pyspark.sql.functions as F

    from icebergplus_spark.functions.skew import advise_join

    orders = load_table(spark, sf_dir, "orders")
    cat = LocalLakeCatalog(spark, str(tmp_path / "adv")).start()

    # small table → broadcast (from snapshot bytes alone)
    small = cat.create_table("db.small", orders.schema).append(orders.limit(100))
    assert advise_join(small, "o_custkey")["strategy"] == "broadcast"

    # skewed table: one hot key with half the rows → salted, once the
    # heavy-hitter stats exist (tiny broadcast_bytes forces the branch)
    skewed_df = orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 2 == 0, F.lit(7)).otherwise(
            F.col("o_custkey")
        ),
    )
    skewed = cat.create_table("db.skewed", orders.schema).append(skewed_df)
    adv = advise_join(skewed, "o_custkey", broadcast_bytes=1)
    assert adv["strategy"] == "shuffle"  # stats not computed yet
    skewed = skewed.analyze(columns=["o_custkey"], top_k=1)
    adv = advise_join(skewed, "o_custkey", broadcast_bytes=1)
    assert adv["strategy"] == "salted"
    assert adv["salt_n"] >= 2
    # stale stats must not drive salting decisions
    skewed = skewed.append(orders.limit(1))
    adv = advise_join(skewed, "o_custkey", broadcast_bytes=1)
    assert adv["strategy"] == "shuffle"


def test_auto_maintain_refreshes_stale_stats(table):
    from icebergplus_spark.lake.maintenance import auto_maintain

    t, orders = table
    # not opted in → skipped
    rep = auto_maintain(t)
    assert rep["analyze"] == "skipped: analyze.auto not set"
    t = t.set_property("analyze.auto", "true").set_property(
        "analyze.columns", "o_custkey"
    )
    rep = auto_maintain(t)
    assert rep["analyze"] == {"analyzed": True, "columns": ["o_custkey"]}
    t = t.refresh()
    assert t.statistics_fresh
    # fresh stats → second pass skips
    rep = auto_maintain(t)
    assert rep["analyze"] == "skipped: statistics fresh"
    # a new commit staleness-triggers again, dry-run reports only
    t = t.append(orders.limit(1))
    rep = auto_maintain(t, dry_run=True)
    assert rep["analyze"] == "would re-analyze stale statistics"
    assert not t.refresh().statistics_fresh  # dry run touched nothing
