"""Rewrite paths (compact/delete/merge) on partitioned tables must
preserve partition values and layout.

Regression tests for two bugs found by runtime probing: (1) rewrites
read data files without recovering identity-partition values from the
Hive path, silently NULLing the partition column; (2) one reader with
``basePath=data/`` across multiple ``snap-*`` dirs throws Spark's
CONFLICTING_DIRECTORY_STRUCTURES — reads must group by write dir."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.lake.maintenance import compact

SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("seg", StringType(), True),
    ]
)
BASE = dt.datetime(2024, 6, 1)


@pytest.fixture
def catalog(spark, tmp_path):
    return LocalLakeCatalog(spark, str(tmp_path / "warehouse")).start()


def _rows(spark, lo, hi):
    return spark.createDataFrame(
        [
            Row(id=i, ts=BASE + dt.timedelta(hours=8 * i), seg=f"s{i % 3}")
            for i in range(lo, hi)
        ],
        SCHEMA,
    )


def _collect(t, **kw):
    return sorted((r.id, str(r.ts), r.seg) for r in t.scan(**kw).collect())


def test_multi_snapshot_identity_partitioned_scan(spark, catalog):
    t = catalog.create_table("ns.ms", SCHEMA, partition_cols=["seg"])
    t.append(_rows(spark, 0, 12))
    t.append(_rows(spark, 12, 24))  # second snap-dir: the failing case
    rows = _collect(t)
    assert len(rows) == 24
    assert all(seg is not None for _, _, seg in rows)


def test_compact_preserves_identity_partitions(spark, catalog):
    t = catalog.create_table("ns.ci", SCHEMA, partition_cols=["seg"])
    t.append(_rows(spark, 0, 12))
    t.append(_rows(spark, 12, 24))
    before = _collect(t)
    res = compact(t)
    assert res["compacted"] > 0
    assert _collect(t) == before  # no NULLed partition column
    # layout survived → equality pruning still works
    assert len(t.plan_files({"seg": ("=", "s1")})) < len(t.plan_files())


def test_compact_preserves_hidden_partitions(spark, catalog):
    t = catalog.create_table("ns.ch", SCHEMA, partition_spec=["days(ts)"])
    t.append(_rows(spark, 0, 12))
    t.append(_rows(spark, 12, 24))
    before = _collect(t)
    compact(t)
    assert _collect(t) == before
    cut = dt.datetime(2024, 6, 5)
    pruned, total = len(t.plan_files({"ts": (">=", cut)})), len(t.plan_files())
    assert 0 < pruned < total  # transform pruning survives compaction
    assert t.scan({"ts": (">=", cut)}).count() == sum(
        1 for i in range(24) if BASE + dt.timedelta(hours=8 * i) >= cut
    )


def test_delete_and_merge_preserve_partitions(spark, catalog):
    t = catalog.create_table("ns.dm", SCHEMA, partition_cols=["seg"])
    t.append(_rows(spark, 0, 12))
    t.append(_rows(spark, 12, 24))
    t.delete({"id": ("<", 3)})
    rows = _collect(t)
    assert len(rows) == 21
    assert all(seg is not None for _, _, seg in rows)
    t.merge(_rows(spark, 20, 28), key="id")
    rows = _collect(t)
    assert len(rows) == 25
    assert all(seg is not None for _, _, seg in rows)


def test_dynamic_partition_overwrite(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from icebergplus_spark.lake import LocalLakeCatalog

    schema = StructType(
        [
            StructField("region", StringType(), True),
            StructField("v", LongType(), True),
        ]
    )
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.dpo", schema, partition_cols=["region"])
    t.append(
        spark.createDataFrame(
            [("eu", 1), ("eu", 2), ("us", 10), ("ap", 100)], schema
        ).coalesce(1)
    )
    before = {f["file_path"] for f in t.plan_files({"region": ("=", "us")})}
    before_ap = {f["file_path"] for f in t.plan_files({"region": ("=", "ap")})}

    # replace ONLY the eu partition
    t.overwrite_partitions(
        spark.createDataFrame([("eu", 7)], schema).coalesce(1)
    )
    got = sorted((r["region"], r["v"]) for r in t.scan().collect())
    assert got == [("ap", 100), ("eu", 7), ("us", 10)]
    # untouched partitions carry over the SAME files (no rewrite)
    assert {f["file_path"] for f in t.plan_files({"region": ("=", "us")})} == before
    assert {f["file_path"] for f in t.plan_files({"region": ("=", "ap")})} == before_ap
    assert t.history()[-1]["operation"] == "overwrite"

    # time travel still sees the pre-overwrite state
    prev = t.history()[-2]["snapshot_id"]
    old = sorted((r["region"], r["v"]) for r in t.scan(snapshot_id=prev).collect())
    assert old == [("ap", 100), ("eu", 1), ("eu", 2), ("us", 10)]

    # unpartitioned tables refuse (use overwrite())
    t2 = cat.create_table("db.dpo_flat", schema)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t2.overwrite_partitions(spark.createDataFrame([("eu", 1)], schema))
