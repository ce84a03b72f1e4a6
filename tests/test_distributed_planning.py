"""plan_files_distributed ≡ plan_files: the 100 TB planning path
(stats pruning as a Spark job over the manifest parquet) must keep
exactly the files the driver-side planner keeps — min/max, absent
stats, bloom probes, and hidden-partition transforms included."""

import datetime as dt

import pyspark.sql.functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from icebergplus_spark.lake import LocalLakeCatalog

SCHEMA = StructType(
    [
        StructField("k", IntegerType(), True),
        StructField("cat", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)


def _mk_table(spark, tmp_path, **kwargs):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.planned", SCHEMA, **kwargs)
    base = dt.datetime(2024, 1, 1)
    for batch in range(4):
        rows = [
            (
                batch * 100 + i,
                f"c{batch}",
                base + dt.timedelta(days=batch * 10 + i % 5),
            )
            for i in range(50)
        ]
        t.append(spark.createDataFrame(rows, SCHEMA).coalesce(1))
    return t


def _paths(entries):
    return sorted(e["file_path"] for e in entries)


def test_distributed_equals_driver_planning(spark, tmp_path):
    t = _mk_table(spark, tmp_path, bloom_cols=["cat"])
    predicate_grid = [
        None,
        {"k": (">=", 200)},
        {"k": ("<", 150)},
        {"k": ("<=", 100)},
        {"k": (">", 399)},
        {"k": ("=", 225)},
        {"cat": ("=", "c1")},
        {"cat": ("=", "zz_missing")},  # bloom prunes everything
        {"ts": (">=", "2024-01-20 00:00:00")},
        {"k": (">=", 100), "cat": ("=", "c2")},
    ]
    n_all = len(t.plan_files())
    assert n_all == 4
    for preds in predicate_grid:
        drv = _paths(t.plan_files(preds))
        dist = _paths(t.plan_files_distributed(preds))
        assert drv == dist, f"planner divergence for {preds}"
    # the selective predicates genuinely prune
    assert len(t.plan_files_distributed({"k": ("=", 225)})) == 1
    assert len(t.plan_files_distributed({"cat": ("=", "zz_missing")})) == 0


def test_distributed_planning_hidden_partitioning(spark, tmp_path):
    t = _mk_table(spark, tmp_path, partition_spec=["days(ts)"])
    for preds in [
        {"ts": (">=", "2024-01-20 00:00:00")},
        {"ts": ("<", "2024-01-05 00:00:00")},
        None,
    ]:
        drv = _paths(t.plan_files(preds))
        dist = _paths(t.plan_files_distributed(preds))
        assert drv == dist, f"planner divergence for {preds}"
    # transform pruning actually skips files: batches are 10 days apart
    # (each append writes one file per day partition, so compare against
    # the unpruned inventory, not the append count)
    n_all = len(t.plan_files_distributed())
    assert (
        0
        < len(t.plan_files_distributed({"ts": ("<", "2024-01-05 00:00:00")}))
        < n_all
    )


def test_distributed_planning_time_travel_and_empty(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh2")).start()
    t = cat.create_table("db.tt", SCHEMA)
    assert t.plan_files_distributed() == []  # empty table
    t.append(
        spark.createDataFrame(
            [(1, "a", dt.datetime(2024, 1, 1))], SCHEMA
        ).coalesce(1)
    )
    first = t.current_snapshot_id
    t.append(
        spark.createDataFrame(
            [(2, "b", dt.datetime(2024, 2, 1))], SCHEMA
        ).coalesce(1)
    )
    assert _paths(t.plan_files_distributed(snapshot_id=first)) == _paths(
        t.plan_files(snapshot_id=first)
    )
    assert len(t.plan_files_distributed(snapshot_id=first)) == 1


def test_distributed_planning_survives_rename(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    t.rename_column("k", "key")
    drv = _paths(t.plan_files({"key": (">=", 200)}))
    dist = _paths(t.plan_files_distributed({"key": (">=", 200)}))
    assert drv == dist and 0 < len(dist) < 4


def test_plan_files_auto_switches_to_distributed(spark, tmp_path, monkeypatch):
    """plan_files delegates to the executor-side planner past the
    manifest-entry threshold (table property), with identical results."""
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.table import LakeTable

    schema = StructType(
        [StructField("k", IntegerType()), StructField("v", StringType())]
    )
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.t", schema)
    for i in range(3):
        t.append(
            spark.createDataFrame(
                [(i * 10 + j, f"r{j}") for j in range(10)], schema
            ).coalesce(1)
        )
    driver_result = sorted(
        f["file_path"] for f in t.plan_files({"k": (">=", 15)})
    )

    calls = []
    orig = LakeTable.plan_files_distributed

    def spy(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(LakeTable, "plan_files_distributed", spy)
    t.set_property("planning.distributed-threshold", "0")  # force switch
    auto_result = sorted(
        f["file_path"] for f in t.plan_files({"k": (">=", 15)})
    )
    assert calls, "distributed planner was not engaged"
    assert auto_result == driver_result
