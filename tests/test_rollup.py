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
