"""Merge-on-read deletes (Iceberg v2 delete-file parity): position
deletes (`delete_where`), equality deletes (`delete_by_key`), scan-time
tombstone application, sequence semantics (append-after-delete), rewrite
interop (compact/merge/cow-delete must not resurrect rows), and the
commit counters the reference's MetricsReporter names
(totalPositionalDeletes / totalDeleteFiles / totalEqualityDeletes,
IntegrationTest.java:106-117)."""

import os

import pytest
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from icebergplus_spark.lake import (
    LocalLakeCatalog,
    compact,
    expire_snapshots,
    remove_orphan_files,
)

SCHEMA = StructType(
    [StructField("k", IntegerType(), True), StructField("v", StringType(), True)]
)


@pytest.fixture(params=["position", "dv"])
def table(spark, tmp_path, request):
    """Whole battery runs under BOTH row-level delete representations:
    classic v2 position-delete files and v3 deletion vectors
    (``delete.representation=dv``, lake/dv.py)."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.mor", SCHEMA)
    if request.param == "dv":
        t.set_property("delete.representation", "dv")
    t.append(spark.createDataFrame([(i, f"a{i}") for i in range(5)], SCHEMA).coalesce(1))
    t.append(spark.createDataFrame([(i, f"b{i}") for i in range(5, 10)], SCHEMA).coalesce(1))
    return t


def _keys(t):
    return sorted(r["k"] for r in t.scan().collect())


def test_position_delete_no_rewrite(table):
    before_paths = {f["file_path"] for f in table.plan_files()}
    pre_delete = table.current_snapshot_id

    table.delete_where({"k": ("<", 3)})
    assert _keys(table) == [3, 4, 5, 6, 7, 8, 9]
    # MOR: data files untouched — that's the write-side win
    assert {f["file_path"] for f in table.plan_files()} == before_paths
    snap = table.snapshot()
    assert snap["operation"] == "delete"
    assert snap["summary"]["total-position-deletes"] == 3
    assert snap["summary"]["total-delete-files"] >= 1
    # time travel behind the delete still sees everything
    assert len(table.scan(snapshot_id=pre_delete).collect()) == 10


def test_position_delete_stacks_and_double_delete_is_noop(table):
    table.delete_where({"k": ("<", 3)})
    table.delete_where({"k": (">=", 8)})
    assert _keys(table) == [3, 4, 5, 6, 7]
    assert table.snapshot()["summary"]["total-position-deletes"] == 5
    # re-deleting already-tombstoned rows adds no snapshot (nothing matched)
    n = len(table.history())
    table.delete_where({"k": ("<", 3)})
    assert len(table.history()) == n
    assert _keys(table) == [3, 4, 5, 6, 7]


def test_delete_files_metadata_table(spark, table):
    assert table.metadata_df("delete_files").count() == 0
    table.delete_where({"k": ("<", 3)})
    table.delete_by_key(
        spark.createDataFrame([(9,)], StructType([StructField("k", IntegerType(), True)]))
    )
    rows = table.metadata_df("delete_files").collect()
    mode = (table.properties or {}).get("delete.representation", "position")
    by_content = {r["content"] for r in rows}
    assert by_content == {mode, "equality"}
    assert sum(r["record_count"] for r in rows if r["content"] == mode) == 3


def test_predicate_scan_with_tombstones(table):
    table.delete_where({"k": ("=", 6)})
    got = sorted(
        r["k"] for r in table.scan(predicates={"k": (">=", 5)}).collect()
    )
    assert got == [5, 7, 8, 9]


def test_equality_delete_and_sequence_semantics(spark, table):
    keys = spark.createDataFrame([(2,), (7,)], StructType([StructField("k", IntegerType(), True)]))
    table.delete_by_key(keys)
    assert _keys(table) == [0, 1, 3, 4, 5, 6, 8, 9]
    assert table.snapshot()["summary"]["total-equality-deletes"] == 2
    # append the same key AFTER the delete: the new row survives
    # (applies_before ≈ Iceberg sequence numbers)
    table.append(spark.createDataFrame([(2, "new2")], SCHEMA).coalesce(1))
    assert _keys(table) == [0, 1, 2, 3, 4, 5, 6, 8, 9]
    assert [r["v"] for r in table.scan().collect() if r["k"] == 2] == ["new2"]


def test_commit_metrics_report_delete_counters(spark, tmp_path):
    from icebergplus_spark.lake import MetricsReporter, MetricsSink

    sink = MetricsSink()
    cat = LocalLakeCatalog(spark, str(tmp_path / "whm")).start()
    cat.set_metrics_reporter(MetricsReporter(sink))
    t = cat.create_table("db.metr", SCHEMA)
    t.append(spark.createDataFrame([(i, "x") for i in range(4)], SCHEMA).coalesce(1))
    t.delete_where({"k": ("<", 2)})

    def val(name):
        return sum(
            c.value for (n, _), c in sink._counters.items() if n == name
        )

    assert val("iceberg.commitReport.totalPositionalDeletes") == 2
    assert val("iceberg.commitReport.totalDeleteFiles") >= 1


def test_rewrites_do_not_resurrect(spark, table):
    table.delete_where({"k": ("=", 1)})
    # copy-on-write delete of a different range reads through tombstones
    table.delete({"k": (">=", 8)})
    assert _keys(table) == [0, 2, 3, 4, 5, 6, 7]
    # upsert over a file containing a tombstoned row
    table.merge(spark.createDataFrame([(2, "upd")], SCHEMA), key="k")
    assert _keys(table) == [0, 2, 3, 4, 5, 6, 7]
    assert [r["v"] for r in table.scan().collect() if r["k"] == 2] == ["upd"]


def test_compact_applies_and_purges_tombstones(spark, table):
    table.delete_where({"k": ("<", 4)})
    res = compact(table, target_file_size=64 * 1024 * 1024, purge_deletes=True)
    assert res["purged_deletes"] is True
    snap = table.snapshot()
    assert snap["delete_manifests"] == []
    assert snap["summary"]["total-position-deletes"] == 0
    assert _keys(table) == [4, 5, 6, 7, 8, 9]
    # total records in manifest reflect the physical purge
    assert snap["summary"]["total-records"] == 6


def test_expire_and_orphans_keep_live_delete_files(table):
    table.delete_where({"k": ("<", 2)})
    snap = table.snapshot()
    dm = snap["delete_manifests"]
    assert dm
    # delete files survive vacuum + orphan sweep while referenced
    expire_snapshots(table, keep_last=1)
    assert remove_orphan_files(table, older_than_s=0)["deleted"] == 0
    assert _keys(table) == [2, 3, 4, 5, 6, 7, 8, 9]
    # after a purging compaction + expiry, the delete files are gone
    compact(table, target_file_size=64 * 1024 * 1024, purge_deletes=True)
    expire_snapshots(table, keep_last=1)
    import pyarrow.parquet as pq

    for m in dm:
        for e in (
            pq.read_table(os.path.join(table._meta_dir, m)).to_pylist()
            if os.path.exists(os.path.join(table._meta_dir, m))
            else []
        ):
            assert not os.path.exists(e["file_path"])


def test_mor_delete_on_partitioned_table(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "whp")).start()
    t = cat.create_table("db.morp", SCHEMA, partition_cols=["v"])
    t.append(
        spark.createDataFrame(
            [(i, "even" if i % 2 == 0 else "odd") for i in range(10)], SCHEMA
        )
    )
    t.delete_where({"k": ("<", 4)})
    assert _keys(t) == [4, 5, 6, 7, 8, 9]
    # partition pruning still composes with tombstones
    odd = sorted(r["k"] for r in t.scan(predicates={"v": ("=", "odd")}).collect())
    assert odd == [5, 7, 9]


def test_atomic_upsert_single_snapshot(spark, tmp_path):
    """upsert commits tombstone + rows in ONE snapshot: history grows by
    exactly one entry, the key's old version is gone, and the changelog
    for that snapshot shows the delete and the insert together."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from icebergplus_spark.lake import LocalLakeCatalog

    schema = StructType(
        [StructField("k", LongType(), True), StructField("v", StringType(), True)]
    )
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.au", schema)
    t.append(spark.createDataFrame([(1, "old"), (2, "keep")], schema).coalesce(1))
    n_before = len(t.history())

    t.upsert(spark.createDataFrame([(1, "new"), (3, "add")], schema).coalesce(1), "k")
    assert len(t.history()) == n_before + 1  # ONE commit for delete+insert
    assert t.history()[-1]["operation"] == "upsert"
    got = {r["k"]: r["v"] for r in t.scan().collect()}
    assert got == {1: "new", 2: "keep", 3: "add"}

    # rows appended AFTER the upsert with the same key survive its
    # tombstone (applies_before semantics)
    t.append(spark.createDataFrame([(1, "newer")], schema).coalesce(1))
    vs = sorted(r["v"] for r in t.scan().filter("k = 1").collect())
    assert vs == ["new", "newer"]

    # changelog of the upsert snapshot: old version out, new rows in
    cl = t.scan_changelog(from_snapshot_id=n_before, to_snapshot_id=n_before + 1)
    changes = {(r["_change_type"], r["k"], r["v"]) for r in cl.collect()}
    assert ("delete", 1, "old") in changes
    assert ("insert", 1, "new") in changes
    assert ("insert", 3, "add") in changes
