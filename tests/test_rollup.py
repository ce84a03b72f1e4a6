"""Continuous-aggregate tests: incremental refresh equals full
recompute, including late data landing in already-refreshed buckets."""

import pyspark.sql.functions as F
import pytest

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.lake.rollup import (
    full_recompute,
    refresh_rollup,
    rollup_table_schema,
)
from icebergplus_spark.sources import load_table


@pytest.fixture
def tables(spark, sf_dir, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    ev = load_table(spark, sf_dir, "events")
    source = cat.create_table("db.events_src", ev.schema)
    rollup = cat.create_table("db.events_rollup", rollup_table_schema())
    return ev, source, rollup


def _canon(df):
    return sorted(
        (str(r["bucket"]), r["event_type"], r["n_events"], round(r["sum_value"], 6))
        for r in df.collect()
    )


def test_incremental_refresh_matches_full_recompute(spark, tables):
    ev, source, rollup = tables
    # chunk 1: first third of the timeline
    source.append(ev.filter(F.col("ts") < "2024-01-10"))
    r1 = refresh_rollup(source, rollup)
    assert r1["refreshed_buckets"] > 0
    assert _canon(rollup.scan().drop("bucket_key")) == _canon(full_recompute(source))

    # chunk 2: rest of the timeline PLUS late rows in old buckets
    source.append(ev.filter(F.col("ts") >= "2024-01-10"))
    source.append(ev.filter(F.col("ts") < "2024-01-02"))  # late replay
    r2 = refresh_rollup(source, rollup)
    assert r2["from_snapshot"] == 1
    assert _canon(rollup.scan().drop("bucket_key")) == _canon(full_recompute(source))


def test_refresh_is_idempotent(spark, tables):
    ev, source, rollup = tables
    source.append(ev.limit(500))
    refresh_rollup(source, rollup)
    before = _canon(rollup.scan().drop("bucket_key"))
    again = refresh_rollup(source, rollup)  # nothing new
    assert again["refreshed_buckets"] == 0
    assert _canon(rollup.scan().drop("bucket_key")) == before


def test_rollup_stays_exact_under_source_deletes(spark, tables):
    """r5: invalidation comes from the CHANGELOG, so source DELETEs —
    which add no rows and were invisible to the append stream —
    invalidate their buckets, including a bucket deleted EMPTY (its
    rollup row must disappear, not stand stale)."""
    ev, source, rollup = tables
    source.append(ev.filter(F.col("ts") < "2024-01-10"))
    refresh_rollup(source, rollup)

    # partial-bucket delete: every 'error' event in a window
    source.delete_where({"value": (">", 50.0)})
    r = refresh_rollup(source, rollup)
    assert r["refreshed_buckets"] > 0
    assert _canon(rollup.scan().drop("bucket_key")) == _canon(full_recompute(source))

    # empty a whole (bucket, event_type) cell: delete one event_type
    # entirely — its rollup rows must be tombstoned
    from icebergplus_spark.lake.table import LakeTable  # noqa: F401

    source.delete_by_key(
        spark.createDataFrame([("signup",)], "event_type string")
    )
    r2 = refresh_rollup(source, rollup)
    assert r2["deleted_buckets"] > 0
    got = _canon(rollup.scan().drop("bucket_key"))
    assert got == _canon(full_recompute(source))
    assert all(row[1] != "signup" for row in got)

    # and an UPDATE (CoW rewrite) invalidates through the same path
    source.update_where({"value": ("<", 1.0)}, {"value": 2.5})
    refresh_rollup(source, rollup)
    assert _canon(rollup.scan().drop("bucket_key")) == _canon(full_recompute(source))


def test_rollup_exact_under_dv_mode_source(spark, tables):
    """Deletion-vector source table: the changelog's DV delta rows
    drive the same invalidation."""
    ev, source, rollup = tables
    source.set_property("delete.representation", "dv")
    source.append(ev.filter(F.col("ts") < "2024-01-05"))
    refresh_rollup(source, rollup)
    source.delete_where({"value": (">", 30.0)})
    refresh_rollup(source, rollup)
    assert _canon(rollup.scan().drop("bucket_key")) == _canon(full_recompute(source))


def test_generalized_materialized_aggregate_sql_surface(spark, sf_dir, tmp_path):
    """r5 generalized MV: CREATE MATERIALIZED VIEW persists the spec,
    REFRESH folds source changes in (changelog invalidation — exact
    under deletes, INCLUDING count(DISTINCT), because touched buckets
    are recomputed, never delta-merged), DROP removes it."""
    import pyspark.sql.functions as F2

    from icebergplus_spark.lake.sql_dml import lake_sql

    orders = load_table(spark, sf_dir, "orders")
    cat = LocalLakeCatalog(spark, str(tmp_path / "whmv")).start()
    src = cat.create_table("db.orders", orders.schema)
    src.append(orders.filter(F2.col("o_orderkey") % 2 == 0))
    lake_sql(
        cat,
        """CREATE MATERIALIZED VIEW db.monthly AS
SELECT DATE_TRUNC('month', o_orderdate) AS bucket, o_orderstatus,
       count(*) AS n, count(DISTINCT o_custkey) AS n_cust
FROM db.orders GROUP BY 1, 2""",
    )

    def recompute():
        return {
            tuple(map(str, r))
            for r in src.scan()
            .groupBy(
                F2.date_trunc("month", "o_orderdate").alias("bucket"),
                "o_orderstatus",
            )
            .agg(
                F2.expr("count(*)").alias("n"),
                F2.expr("count(DISTINCT o_custkey)").alias("n_cust"),
            )
            .collect()
        }

    def mv_state():
        return {
            tuple(map(str, r))
            for r in cat.load_table("db.monthly").scan().drop("bucket_key").collect()
        }

    assert mv_state() == recompute()
    src.append(orders.filter(F2.col("o_orderkey") % 2 == 1))
    src.delete({"o_totalprice": (">", 200000.0)})
    rep = lake_sql(cat, "REFRESH MATERIALIZED VIEW db.monthly")
    assert rep["refreshed_buckets"] > 0
    assert mv_state() == recompute()
    # idempotent
    rep2 = lake_sql(cat, "REFRESH MATERIALIZED VIEW db.monthly")
    assert rep2["refreshed_buckets"] == 0
    lake_sql(cat, "DROP MATERIALIZED VIEW db.monthly")
    assert not cat.table_exists("db.monthly")
    # refreshing a non-MV table is refused
    cat.create_table("db.plain", orders.schema)
    with pytest.raises(ValueError, match="not a materialized aggregate"):
        lake_sql(cat, "REFRESH MATERIALIZED VIEW db.plain")


def test_mv_staleness_and_auto_maintain_refresh(spark, sf_dir, tmp_path):
    """MV freshness is a first-class maintenance concern: staleness is
    metadata-only, refresh_stale_materialized_views ticks every MV in
    the catalog, and auto_maintain on the MV table folds in lagging
    source snapshots (dry_run reports without touching)."""
    import pyspark.sql.functions as F2

    from icebergplus_spark.lake import auto_maintain
    from icebergplus_spark.lake.rollup import (
        create_materialized_aggregate,
        list_materialized_views,
        mv_staleness,
        refresh_stale_materialized_views,
    )

    orders = load_table(spark, sf_dir, "orders")
    cat = LocalLakeCatalog(spark, str(tmp_path / "whmva")).start()
    src = cat.create_table("db.o", orders.schema)
    src.append(orders.filter(F2.col("o_orderkey") % 2 == 0))
    create_materialized_aggregate(
        cat,
        "db.o_monthly",
        "db.o",
        {
            "time_col": "o_orderdate",
            "window": "month",
            "group_cols": ["o_orderstatus"],
            "aggs": [("n", "count(*)")],
        },
    )
    assert list_materialized_views(cat) == ["db.o_monthly"]
    assert mv_staleness(cat, "db.o_monthly") > 0  # never refreshed
    assert refresh_stale_materialized_views(cat)["db.o_monthly"][
        "refreshed_buckets"
    ] > 0
    assert mv_staleness(cat, "db.o_monthly") == 0
    assert refresh_stale_materialized_views(cat) == {"db.o_monthly": "fresh"}

    # source advances → auto_maintain on the MV table folds it in
    src.append(orders.filter(F2.col("o_orderkey") % 2 == 1))
    mv = cat.load_table("db.o_monthly")
    rep = auto_maintain(mv, dry_run=True)
    assert "would fold in" in rep["refresh_materialized_view"]
    rep = auto_maintain(mv)
    assert rep["refresh_materialized_view"]["refreshed_buckets"] > 0
    # MV equals the recompute through the maintenance path
    want = {
        tuple(map(str, r))
        for r in src.scan()
        .groupBy(
            F2.date_trunc("month", "o_orderdate").alias("bucket"),
            "o_orderstatus",
        )
        .agg(F2.expr("count(*)").alias("n"))
        .collect()
    }
    got = {
        tuple(map(str, r))
        for r in cat.load_table("db.o_monthly").scan().drop("bucket_key").collect()
    }
    assert got == want
    assert auto_maintain(cat.load_table("db.o_monthly"), dry_run=True)[
        "refresh_materialized_view"
    ] == "fresh"


def test_show_materialized_views_sql(spark, sf_dir, tmp_path):
    import pyspark.sql.functions as F2

    from icebergplus_spark.lake.sql_dml import lake_sql

    orders = load_table(spark, sf_dir, "orders")
    cat = LocalLakeCatalog(spark, str(tmp_path / "whsh")).start()
    assert lake_sql(cat, "SHOW MATERIALIZED VIEWS").count() == 0
    src = cat.create_table("db.o", orders.schema)
    src.append(orders.limit(100))
    lake_sql(
        cat,
        """CREATE MATERIALIZED VIEW db.mv AS
SELECT DATE_TRUNC('month', o_orderdate) AS bucket, count(*) AS n
FROM db.o GROUP BY 1""",
    )
    row = lake_sql(cat, "SHOW MATERIALIZED VIEWS").collect()[0]
    assert (row.name, row.source, row.stale_snapshots) == ("db.mv", "db.o", 0)
    src.append(orders.limit(50))
    row = lake_sql(cat, "SHOW MATERIALIZED VIEWS").collect()[0]
    assert row.stale_snapshots == 1


def test_mv_model_based_random_histories(spark, tmp_path):
    """Model-based check: randomized append/delete/refresh histories —
    after EVERY refresh the MV equals the from-scratch recompute. A
    fixed seed keeps the run deterministic; the sequences cover delete-
    into-refreshed-bucket, bucket emptying, and back-to-back refreshes."""
    import random

    import pyspark.sql.functions as F2

    from icebergplus_spark.lake.rollup import (
        create_materialized_aggregate,
        refresh_materialized,
    )

    rng = random.Random(20260815)
    schema = spark.createDataFrame([], "ts timestamp, g string, x double").schema
    for trial in range(3):
        cat = LocalLakeCatalog(spark, str(tmp_path / f"whmb{trial}")).start()
        src = cat.create_table("db.s", schema)
        next_id = [0]

        def batch(n):
            rows = []
            for _ in range(n):
                d, h = rng.randint(1, 4), rng.randint(0, 5)
                rows.append(
                    (
                        f"2024-03-0{d} 0{h}:00:00",
                        rng.choice("abc"),
                        float(next_id[0]),
                    )
                )
                next_id[0] += 1
            return spark.createDataFrame(
                rows, "ts string, g string, x double"
            ).select(F2.col("ts").cast("timestamp"), "g", "x")

        src.append(batch(20))
        create_materialized_aggregate(
            cat,
            "db.mv",
            "db.s",
            {
                "time_col": "ts",
                "window": "hour",
                "group_cols": ["g"],
                "aggs": [("n", "count(*)"), ("sx", "round(sum(x), 2)")],
            },
        )
        refresh_materialized(cat, "db.mv")
        for _ in range(4):
            op = rng.choice(["append", "delete", "delete_g", "refresh"])
            if op == "append":
                src.append(batch(rng.randint(1, 15)))
            elif op == "delete":
                src.delete({"x": ("<", float(rng.randint(0, next_id[0])))})
            elif op == "delete_g":
                src.delete_by_key(
                    spark.createDataFrame([(rng.choice("abc"),)], "g string")
                )
            refresh_materialized(cat, "db.mv")
            got = {
                tuple(map(str, r))
                for r in cat.load_table("db.mv").scan().drop("bucket_key").collect()
            }
            want = {
                tuple(map(str, r))
                for r in src.scan()
                .groupBy(F2.date_trunc("hour", "ts").alias("bucket"), "g")
                .agg(
                    F2.expr("count(*)").alias("n"),
                    F2.expr("round(sum(x), 2)").alias("sx"),
                )
                .collect()
            }
            assert got == want, f"trial {trial} op {op}"


# ---------------------------------------------------------------------------
# r6 (VERDICT r5 #1): refresh must PRUNE data files outside the touched
# buckets — raw-column range predicates through scan_ranges, so one late
# delete in an old bucket costs one bucket-width of I/O, not a re-read
# of all history since that bucket.
# ---------------------------------------------------------------------------


def _day_df(spark, day, values, event_type="click"):
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, day, h % 24, 0, 0), event_type, float(v))
        for h, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double"
    ).coalesce(1)


def _plan_recorder(table):
    """Wrap the range planner to record (ranges, file_paths) — the
    refresh's touched-bucket scan plans through plan_files_ranges in
    ONE manifest pass (r6)."""
    calls = []
    orig = table.plan_files_ranges

    def wrapped(col, ranges, snapshot_id=None):
        out = orig(col, ranges, snapshot_id)
        calls.append((ranges, [f["file_path"] for f in out]))
        return out

    table.plan_files_ranges = wrapped
    return calls


def test_refresh_scans_only_touched_bucket_files(spark, tmp_path):
    """Planted: 3 day-files refreshed, then a LATE delete in day 1 plus
    an append in day 4. The second refresh's predicated plans must
    never touch the day-2/day-3 files (they sit between the touched
    ranges), and the rollup still equals the full recompute."""
    import json as _json

    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    source = cat.create_table(
        "db.ev_prune", _day_df(spark, 1, [1.0]).schema
    )
    rollup = cat.create_table("db.roll_prune", rollup_table_schema())
    source.append(_day_df(spark, 1, [1.0, 11.0, 3.0]))
    source.append(_day_df(spark, 2, [4.0, 5.0]))
    source.append(_day_df(spark, 3, [6.0, 7.0]))
    refresh_rollup(source, rollup, window="hour")
    assert _canon(rollup.scan().drop("bucket_key")) == _canon(
        full_recompute(source)
    )

    # late delete lands in day 1 only; new data lands in day 4 only
    source.delete_where({"value": ("=", 11.0)})
    source.append(_day_df(spark, 4, [8.0, 9.0]))

    # files whose ts range overlaps day 2 or day 3 must NOT be planned
    # by the refresh's range scans
    phys_ts = source._column_mapping["ts"]

    def day_of(path):
        for f in source.plan_files():
            if f["file_path"] == path:
                return _json.loads(f["column_mins"])[phys_ts][:10]
        return None

    calls = _plan_recorder(source)
    refresh_rollup(source, rollup, window="hour")
    assert calls, "refresh ran no range plans"
    planned_days = {
        day_of(p) for _ranges, paths in calls for p in paths
    }
    assert "2024-01-02" not in planned_days
    assert "2024-01-03" not in planned_days
    assert _canon(rollup.scan().drop("bucket_key")) == _canon(
        full_recompute(source)
    )


def test_scan_ranges_equals_or_filter(spark, tmp_path):
    """scan_ranges (one subtree, per-range pruned plan) must return the
    same rows as a full scan filtered by the OR of the ranges."""
    import datetime as dt

    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.sr", _day_df(spark, 1, [1.0]).schema)
    for d in (1, 2, 3, 5):
        t.append(_day_df(spark, d, [float(d), float(d) + 0.5]))
    ranges = [
        (dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)),
        (dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 6)),
    ]
    got = sorted(
        (str(r["ts"]), r["value"]) for r in t.scan_ranges("ts", ranges).collect()
    )
    cond = None
    full = t.scan()
    for lo, hi in ranges:
        c = (full["ts"] >= F.lit(lo)) & (full["ts"] < F.lit(hi))
        cond = c if cond is None else (cond | c)
    want = sorted((str(r["ts"]), r["value"]) for r in full.filter(cond).collect())
    assert got == want and len(got) == 4
    # and the planned file set skipped the day-2/3 files
    planned = {
        f["file_path"]
        for lo, hi in ranges
        for f in t.plan_files({"ts": [(">=", lo), ("<", hi)]})
    }
    assert len(planned) == 2, planned


def test_coalesce_ranges_and_bucket_upper():
    import datetime as dt

    from icebergplus_spark.lake.rollup import _bucket_upper, _coalesce_ranges

    h = lambda d, hh: dt.datetime(2024, 1, d, hh)
    # adjacent hours fuse; distant ones stay separate
    got = _coalesce_ranges([h(1, 0), h(1, 1), h(1, 2), h(3, 5)], "hour")
    assert got == [(h(1, 0), h(1, 3)), (h(3, 5), h(3, 6))]
    # max_ranges forces merging across the SMALLEST gap
    got = _coalesce_ranges([h(1, 0), h(1, 4), h(2, 0)], "hour", max_ranges=2)
    assert got == [(h(1, 0), h(1, 5)), (h(2, 0), h(2, 1))]
    # calendar windows advance by calendar arithmetic
    assert _bucket_upper(dt.datetime(2024, 12, 1), "month") == dt.datetime(2025, 1, 1)
    assert _bucket_upper(dt.datetime(2024, 10, 1), "quarter") == dt.datetime(2025, 1, 1)
    assert _bucket_upper(dt.datetime(2024, 1, 1), "year") == dt.datetime(2025, 1, 1)
    assert _bucket_upper(dt.datetime(2024, 2, 26), "week") == dt.datetime(2024, 3, 4)


def test_bucket_key_encoding_no_collisions(spark, tmp_path):
    """ADVICE r5: concat_ws dropped NULLs and didn't escape '|' — the
    encoded key must keep ('x', NULL) / (NULL, 'x') and ('a|b','c') /
    ('a','b|c') distinct."""
    from icebergplus_spark.lake.rollup import _mv_bucket_key

    import datetime as dt

    spec = {"group_cols": ["g1", "g2"]}
    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1), "x", None),
            (dt.datetime(2024, 1, 1), None, "x"),
            (dt.datetime(2024, 1, 1), "a|b", "c"),
            (dt.datetime(2024, 1, 1), "a", "b|c"),
        ],
        "bucket timestamp, g1 string, g2 string",
    )
    keys = [r["k"] for r in df.select(_mv_bucket_key(spec).alias("k")).collect()]
    assert len(set(keys)) == 4, keys


def test_mv_lag_threshold_scheduling(spark, sf_dir, tmp_path):
    """r6 (VERDICT r5 #6): mv.refresh.lag-threshold keys refresh on
    source LAG — a busy source amortizes many tiny refreshes into one;
    below the threshold both refresh_stale_materialized_views and
    auto_maintain leave the MV untouched."""
    import pyspark.sql.functions as F2

    from icebergplus_spark.lake import auto_maintain
    from icebergplus_spark.lake.rollup import (
        create_materialized_aggregate,
        mv_staleness,
        refresh_stale_materialized_views,
    )
    from icebergplus_spark.sources import load_table as _lt

    orders = _lt(spark, sf_dir, "orders")
    cat = LocalLakeCatalog(spark, str(tmp_path / "whlag")).start()
    src = cat.create_table("db.olag", orders.schema)
    src.append(orders.filter(F2.col("o_orderkey") % 3 == 0))
    create_materialized_aggregate(
        cat,
        "db.olag_monthly",
        "db.olag",
        {
            "time_col": "o_orderdate",
            "window": "month",
            "group_cols": [],
            "aggs": [("n", "count(*)")],
        },
    )
    refresh_stale_materialized_views(cat)  # baseline: fresh
    mv = cat.load_table("db.olag_monthly")
    mv.set_property("mv.refresh.lag-threshold", "3")

    # lag 1 and 2: below threshold — policy must NOT refresh
    src.append(orders.filter(F2.col("o_orderkey") % 3 == 1))
    out = refresh_stale_materialized_views(cat)
    assert out["db.olag_monthly"] == "fresh"
    assert mv_staleness(cat, "db.olag_monthly") == 1
    rep = auto_maintain(cat.load_table("db.olag_monthly"), dry_run=True)
    assert "below threshold" in str(rep["refresh_materialized_view"])

    src.append(orders.filter(F2.col("o_orderkey") % 3 == 2))
    assert refresh_stale_materialized_views(cat)["db.olag_monthly"] == "fresh"

    # lag 3: threshold reached — ONE refresh folds all three snapshots
    src.delete({"o_totalprice": (">", 400000.0)})
    out = refresh_stale_materialized_views(cat)
    assert out["db.olag_monthly"]["refreshed_buckets"] > 0
    assert mv_staleness(cat, "db.olag_monthly") == 0
    # and the amortized refresh is still EXACT
    want = (
        src.scan()
        .filter(F2.col("o_orderdate").isNotNull())
        .groupBy(F2.date_trunc("month", "o_orderdate").alias("bucket"))
        .count()
    )
    got = cat.load_table("db.olag_monthly").scan().select("bucket", "n")
    assert sorted((str(r["bucket"]), r["n"]) for r in got.collect()) == sorted(
        (str(r["bucket"]), r["count"]) for r in want.collect()
    )


def test_legacy_bucket_key_migrates_once_atomically(spark, tables):
    """r6: a rollup written with the legacy concat_ws bucket_key is
    rebuilt ONCE (atomic overwrite) on the next refresh — no duplicated
    buckets, exact result, format marker stamped; later refreshes skip
    the migration."""
    from icebergplus_spark.lake.rollup import (
        MV_KEY_FORMAT_KEY,
        ROLLUP_STATE_KEY,
        _aggregate,
    )

    ev, source, rollup = tables
    source.append(ev.filter(F.col("ts") < "2024-01-10"))
    legacy = _aggregate(source.scan(), "hour").withColumn(
        "bucket_key",
        F.concat_ws(
            "|",
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss"),
            F.col("event_type"),
        ),
    )
    rollup.append(legacy.select(*[f.name for f in rollup.schema.fields]))
    rollup._evolve(
        lambda m: m.__setitem__(
            ROLLUP_STATE_KEY, source.current_snapshot_id
        )
    )
    assert MV_KEY_FORMAT_KEY not in rollup._meta

    source.append(ev.filter(F.col("ts") >= "2024-01-10"))
    source.delete_where({"value": (">", 70.0)})
    refresh_rollup(source, rollup)
    rollup = rollup.refresh()
    assert rollup._meta.get(MV_KEY_FORMAT_KEY) == "v2"
    got = _canon(rollup.scan().drop("bucket_key"))
    assert got == _canon(full_recompute(source))
    # no duplicated (bucket, event_type) cells survived the migration
    keys = [(r[0], r[1]) for r in got]
    assert len(keys) == len(set(keys))
    # second refresh: no further migration (marker short-circuits)
    again = refresh_rollup(source, rollup)
    assert again["refreshed_buckets"] == 0


def test_refresh_prunes_on_transform_partitioned_source(spark, tmp_path):
    """r7 (VERDICT r6 #6): the planted pruning gate again, but with the
    MV source HIDDEN-PARTITIONED on days(ts). Partitioned writes route
    each day's rows into a Hive path and the raw ts footer stats are
    per-partition-file, so the refresh's raw-column ranges must prune
    exactly as on the unpartitioned source — days 2/3 untouched files
    never planned — and the rollup still equals the full recompute."""
    import json as _json

    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    source = cat.create_table(
        "db.ev_prune_days",
        _day_df(spark, 1, [1.0]).schema,
        partition_spec=["days(ts)"],
    )
    rollup = cat.create_table("db.roll_prune_days", rollup_table_schema())
    # one append carrying several days: the partitioned writer splits it
    # into per-day files (the realistic ingest shape)
    source.append(
        _day_df(spark, 1, [1.0, 11.0, 3.0])
        .union(_day_df(spark, 2, [4.0, 5.0]))
        .union(_day_df(spark, 3, [6.0, 7.0]))
    )
    refresh_rollup(source, rollup, window="hour")
    assert _canon(rollup.scan().drop("bucket_key")) == _canon(
        full_recompute(source)
    )

    # late delete in day 1 only; fresh data in day 4 only
    source.delete_where({"value": ("=", 11.0)})
    source.append(_day_df(spark, 4, [8.0, 9.0]))

    phys_ts = source._column_mapping["ts"]

    def day_of(path):
        for f in source.plan_files():
            if f["file_path"] == path:
                return _json.loads(f["column_mins"])[phys_ts][:10]
        return None

    calls = _plan_recorder(source)
    refresh_rollup(source, rollup, window="hour")
    assert calls, "refresh ran no range plans"
    planned_days = {
        day_of(p) for _ranges, paths in calls for p in paths
    }
    assert "2024-01-02" not in planned_days
    assert "2024-01-03" not in planned_days
    assert planned_days <= {"2024-01-01", "2024-01-04"}
    assert _canon(rollup.scan().drop("bucket_key")) == _canon(
        full_recompute(source)
    )


# ---------------------------------------------------------------------------
# r13: stats-driven invalidation + tiered fold (overwrite / insert-only /
# merge+tombstone), each tier proven equal to the full recompute and the
# commit shapes pinned.
# ---------------------------------------------------------------------------


def test_bucket_floor_matches_spark_date_trunc(spark):
    """_bucket_floor is the driver-side twin of Spark's date_trunc —
    a mismatch would mis-align invalidation ranges and silently skip
    changed buckets."""
    import datetime as dt

    from icebergplus_spark.lake.rollup import _bucket_floor

    samples = [
        dt.datetime(2024, 2, 29, 13, 47, 31, 123456),
        dt.datetime(2023, 12, 31, 23, 59, 59),
        dt.datetime(2024, 1, 1, 0, 0, 0),
        dt.datetime(2024, 7, 15, 6, 30, 0),
        dt.datetime(2021, 5, 3, 0, 0, 1),
    ]
    units = ["year", "quarter", "month", "week", "day", "hour", "minute", "second"]
    df = spark.createDataFrame([(t,) for t in samples], "ts timestamp")
    exprs = [F.date_trunc(u, "ts").alias(u) for u in units]
    for row, ts in zip(df.select(*exprs).collect(), samples):
        for u in units:
            assert row[u] == _bucket_floor(ts, u), (ts, u, row[u])


def test_full_invalidation_refresh_is_single_overwrite(spark, tables):
    """When a source delete invalidates (nearly) every bucket, the
    refresh lands as ONE overwrite commit — no merge + tombstone pair —
    and still equals the recompute, including tombstoning emptied
    cells."""
    ev, source, rollup = tables
    source.append(ev.filter(F.col("ts") < "2024-01-10"))
    refresh_rollup(source, rollup)
    # value > 20 is spread across every bucket; 'signup' cells with all
    # rows above the bar empty out entirely
    source.delete_where({"value": (">", 20.0)})
    n_ops_before = len(rollup.history())
    r = refresh_rollup(source, rollup)
    new_ops = [s["operation"] for s in rollup.history()[n_ops_before:]]
    assert new_ops == ["overwrite"], new_ops
    assert r["refreshed_buckets"] > 0
    assert _canon(rollup.scan().drop("bucket_key")) == _canon(full_recompute(source))


def test_disjoint_append_refresh_skips_dead_key_pass(spark, tables, monkeypatch):
    """A refresh whose touched ranges intersect no existing rollup file
    is a pure insert: exactly one merge commit, and the dead-key pass
    never runs (nothing stale can exist)."""
    ev, source, rollup = tables
    source.append(ev.filter(F.col("ts") < "2024-01-10"))
    refresh_rollup(source, rollup)
    source.append(
        ev.filter((F.col("ts") >= "2024-01-20") & (F.col("ts") < "2024-01-25"))
    )
    n_ops_before = len(rollup.history())

    def boom(*a, **kw):  # the dead-key pass must not reach delete_by_key
        raise AssertionError("dead-key tombstone ran on a pure-insert refresh")

    monkeypatch.setattr(type(rollup), "delete_by_key", boom)
    r = refresh_rollup(source, rollup)
    monkeypatch.undo()
    new_ops = [s["operation"] for s in rollup.history()[n_ops_before:]]
    assert new_ops == ["merge"], new_ops
    assert r["deleted_buckets"] == 0
    assert _canon(rollup.scan().drop("bucket_key")) == _canon(full_recompute(source))


def test_changed_files_covers_append_and_rewrite(spark, tables):
    """changed_files returns manifest entries (with stats) for files a
    window added, removed, or tombstone-reached — the superset bound
    behind stats invalidation."""
    ev, source, rollup = tables
    source.append(ev.filter(F.col("ts") < "2024-01-05"))
    snap1 = source.current_snapshot_id
    added = {f["file_path"] for f in source.plan_files()}
    got = {f["file_path"] for f in source.changed_files(0, snap1)}
    assert got == added
    # a CoW delete rewrites files: both pre- and post-images are changed
    pre_paths = {f["file_path"] for f in source.plan_files()}
    source.delete_where({"value": (">", 50.0)})
    post_paths = {f["file_path"] for f in source.plan_files()}
    got2 = {f["file_path"] for f in source.changed_files(snap1)}
    assert (pre_paths - post_paths) <= got2  # removed files present
    assert (post_paths - pre_paths) <= got2  # rewritten files present
    for f in source.changed_files(snap1):
        assert "column_mins" in f and f["column_mins"]


def test_refresh_changelog_fallback_matches_stats_path(spark, tables, monkeypatch):
    """Forcing the row-level changelog fallback (as if a changed file
    had no provable time stats) converges to the same rollup state."""
    import icebergplus_spark.lake.rollup as rmod

    ev, source, rollup = tables
    source.append(ev.filter(F.col("ts") < "2024-01-08"))
    refresh_rollup(source, rollup)
    source.delete_where({"value": (">", 60.0)})
    source.append(ev.filter((F.col("ts") >= "2024-01-08") & (F.col("ts") < "2024-01-12")))
    monkeypatch.setattr(rmod, "_changed_ts_spans", lambda *a, **kw: None)
    r = refresh_rollup(source, rollup)
    monkeypatch.undo()
    assert r["refreshed_buckets"] > 0
    assert _canon(rollup.scan().drop("bucket_key")) == _canon(full_recompute(source))
