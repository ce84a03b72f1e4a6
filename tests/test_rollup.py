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
