"""Catalog-level table moves: rename (Iceberg Catalog.renameTable
parity) and zero-copy clone (Iceberg `snapshot` procedure parity), plus
the gc.enabled guard that keeps clone maintenance from deleting files
the source still owns, and snapshot-rate-limited streaming reads."""

import glob
import os

import pytest
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.lake.maintenance import expire_snapshots, remove_orphan_files
from icebergplus_spark.streaming.lake_source import read_lake_stream

SCHEMA = StructType(
    [StructField("k", IntegerType(), True), StructField("s", StringType(), True)]
)


def _rows(df):
    return sorted((r["k"], r["s"]) for r in df.collect())


def test_rename_table(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.old_name", SCHEMA)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA).coalesce(1))

    renamed = cat.rename_table("db.old_name", "db.new_name")
    assert renamed.identifier == "db.new_name"
    assert _rows(renamed.scan()) == [(1, "a"), (2, "b")]
    assert not cat.table_exists("db.old_name")
    assert "db.new_name" in cat.list_tables()
    # location unchanged (identifier is a pointer, not a path)
    assert renamed.table_dir == t.table_dir
    with pytest.raises(KeyError):
        cat.load_table("db.old_name")
    with pytest.raises(ValueError):
        cat.rename_table("db.new_name", "db.new_name")


def test_clone_table_zero_copy_and_divergence(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    src = cat.create_table("db.src", SCHEMA)
    src.append(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA).coalesce(1))
    src.append(spark.createDataFrame([(3, "c")], SCHEMA).coalesce(1))

    clone = cat.clone_table("db.src", "db.sandbox")
    assert _rows(clone.scan()) == [(1, "a"), (2, "b"), (3, "c")]
    # zero-copy: the clone dir holds metadata only, no data parquet
    clone_data = [
        p
        for p in glob.glob(os.path.join(clone.table_dir, "**", "*.parquet"), recursive=True)
        if os.sep + "metadata" + os.sep not in p
    ]
    assert clone_data == []
    # full lineage inherited (metadata-only): time travel still works
    # and file birth snapshots stay correct for tombstone semantics
    assert len(clone.history()) == 2
    assert clone.scan(snapshot_id=1).count() == 2

    # divergence: writes to one side never show on the other
    src.append(spark.createDataFrame([(4, "d")], SCHEMA).coalesce(1))
    assert _rows(clone.refresh().scan()) == [(1, "a"), (2, "b"), (3, "c")]
    clone.append(spark.createDataFrame([(9, "z")], SCHEMA).coalesce(1))
    assert _rows(clone.scan()) == [(1, "a"), (2, "b"), (3, "c"), (9, "z")]
    assert _rows(src.refresh().scan()) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    # the clone's own writes land under the clone's directory
    clone_data = [
        p
        for p in glob.glob(os.path.join(clone.table_dir, "**", "*.parquet"), recursive=True)
        if os.sep + "metadata" + os.sep not in p
    ]
    assert len(clone_data) > 0


def test_clone_carries_mor_tombstones(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    src = cat.create_table("db.src2", SCHEMA)
    src.append(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], SCHEMA).coalesce(1))
    src.delete_where({"k": ("=", 2)})
    clone = cat.clone_table("db.src2", "db.clone2")
    assert _rows(clone.scan()) == [(1, "a"), (3, "c")]


def test_clone_preserves_equality_tombstone_semantics(spark, tmp_path):
    """applies_before needs true birth snapshots: an upserted key's OLD
    version must stay deleted in the clone, while the replacement row
    (born after the tombstone) survives."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    src = cat.create_table("db.src4", SCHEMA)
    src.append(spark.createDataFrame([(1, "old"), (2, "keep")], SCHEMA).coalesce(1))
    src.upsert(spark.createDataFrame([(1, "new")], SCHEMA).coalesce(1), "k")
    assert _rows(src.scan()) == [(1, "new"), (2, "keep")]
    clone = cat.clone_table("db.src4", "db.clone4")
    assert _rows(clone.scan()) == [(1, "new"), (2, "keep")]


def test_clone_gc_guard(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    src = cat.create_table("db.src3", SCHEMA)
    src.append(spark.createDataFrame([(1, "a")], SCHEMA).coalesce(1))
    clone = cat.clone_table("db.src3", "db.clone3")
    clone.append(spark.createDataFrame([(2, "b")], SCHEMA).coalesce(1))
    assert clone.properties["gc.enabled"] == "false"
    with pytest.raises(ValueError, match="gc.enabled"):
        expire_snapshots(clone, keep_last=1)
    with pytest.raises(ValueError, match="gc.enabled"):
        remove_orphan_files(clone, older_than_s=0)
    # the hazard is bidirectional: the SOURCE's files are shared with
    # the clone, so source-side file-deleting maintenance refuses while
    # the clone registration stands...
    with pytest.raises(ValueError, match="clones"):
        expire_snapshots(src, keep_last=1)
    with pytest.raises(ValueError, match="clones"):
        remove_orphan_files(src, older_than_s=0)
    assert src.refresh().properties["clones"] == "db.clone3"
    # ...and resumes once the operator drops the registration
    src.unset_property("clones")
    assert expire_snapshots(src, keep_last=1)["expired"] == 0


def test_stream_rate_limit_bounds_batches(spark, tmp_path):
    import time

    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.rl", SCHEMA)
    for i in range(4):
        t.append(spark.createDataFrame([(i, f"v{i}")], SCHEMA).coalesce(1))

    # The FIRST planned batch of a run is unthrottled (the runner asks
    # for the latest offset before the start offset is known; capping
    # from a guess could stall a checkpoint restore). From the second
    # batch on, each micro-batch advances at most one snapshot — append
    # a fresh backlog while the query runs to observe that.
    stream = read_lake_stream(spark, t.table_dir, max_snapshots_per_trigger=1)
    q = (
        stream.writeStream.format("memory")
        .queryName("rl_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_rl"))
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT COUNT(*) FROM rl_out").first()[0] == 4:
                break
            time.sleep(0.5)
        # steady state reached; add a 3-snapshot backlog in one go
        for i in range(4, 7):
            t.append(spark.createDataFrame([(i, f"v{i}")], SCHEMA).coalesce(1))
        while time.time() < deadline:
            if spark.sql("SELECT COUNT(*) FROM rl_out").first()[0] == 7:
                break
            time.sleep(0.5)
        out = spark.sql("SELECT * FROM rl_out")
        # nothing lost...
        assert sorted(r["k"] for r in out.collect()) == list(range(7))
        # ...and the steady-state backlog drained one snapshot (= one
        # row here) per micro-batch, never more
        later = [
            p["numInputRows"]
            for p in q.recentProgress[1:]
            if p["numInputRows"] and p["numInputRows"] > 0
        ]
        assert len(later) >= 3
        assert all(n == 1 for n in later)
    finally:
        q.stop()


def test_purge_refused_while_clones_exist(spark, tmp_path):
    """drop_table(purge=True) on a clone-shared source would delete
    files the clones still read — refused until the clones are gone."""
    import pytest
    from pyspark.sql.types import IntegerType, StructField, StructType

    from icebergplus_spark.lake import LocalLakeCatalog

    schema = StructType([StructField("x", IntegerType(), True)])
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh_purge")).start()
    src = cat.create_table("db.src", schema)
    src.append(spark.createDataFrame([(1,)], schema))
    cat.clone_table("db.src", "db.cl")
    with pytest.raises(ValueError, match="clones"):
        cat.drop_table("db.src", purge=True)
    cat.drop_table("db.src")  # non-purge drop keeps shared files: allowed
    assert cat.load_table("db.cl").scan().count() == 1
