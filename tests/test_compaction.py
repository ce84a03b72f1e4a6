"""Compaction + snapshot expiry tests (BASELINE.json spark_approach):
content-preserving rewrite, file-count reduction, vacuum semantics."""

import os

import pyspark.sql.functions as F

import pytest
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from icebergplus_spark.lake import LocalLakeCatalog, compact, expire_snapshots

SCHEMA = StructType(
    [StructField("k", IntegerType(), True), StructField("v", StringType(), True)]
)


@pytest.fixture
def small_file_table(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.smallfiles", SCHEMA)
    # 5 appends × 2 files each = 10 small files
    for i in range(5):
        df = spark.createDataFrame(
            [(i * 100 + j, f"val{i}-{j}") for j in range(50)], SCHEMA
        )
        t.append(df.repartition(2))
    return t


def test_compact_preserves_content_and_reduces_files(spark, small_file_table):
    t = small_file_table
    before_files = t.plan_files()
    before_rows = sorted((r["k"], r["v"]) for r in t.scan().collect())
    assert len(before_files) == 10

    summary = compact(t, target_file_size=64 * 1024 * 1024)
    assert summary["compacted"] == 10
    after_files = t.plan_files()
    assert len(after_files) < len(before_files)
    after_rows = sorted((r["k"], r["v"]) for r in t.scan().collect())
    assert after_rows == before_rows  # content identical
    assert t.snapshot()["operation"] == "replace"

    # old snapshot still readable (time travel through the rewrite)
    assert t.scan(snapshot_id=5).count() == 250


def test_compact_noop_when_nothing_small(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh2")).start()
    t = cat.create_table("db.one", SCHEMA)
    t.append(spark.createDataFrame([(1, "a")], SCHEMA).coalesce(1))
    assert compact(t)["compacted"] == 0


def test_expire_snapshots_vacuums_dead_files(spark, small_file_table):
    t = small_file_table
    compact(t)
    old_paths = {
        f["file_path"] for f in t.plan_files(snapshot_id=5)
    }
    live_paths = {f["file_path"] for f in t.plan_files()}
    dead = old_paths - live_paths
    assert dead  # compaction orphaned the small files

    result = expire_snapshots(t, keep_last=1)
    assert result["expired"] == 5
    assert all(not os.path.exists(p) for p in dead)
    assert all(os.path.exists(p) for p in live_paths)
    assert len(t.history()) == 1
    assert t.scan().count() == 250  # current view unaffected


def test_sorted_compaction_improves_pruning(spark, tmp_path):
    from icebergplus_spark.lake import LocalLakeCatalog, compact

    cat = LocalLakeCatalog(spark, str(tmp_path / "whs")).start()
    t = cat.create_table("db.sorted", SCHEMA)
    # interleaved appends: every file spans the whole key range → a key
    # predicate can prune nothing
    for i in range(4):
        t.append(
            spark.createDataFrame(
                [(j, f"v{j}") for j in range(i, 1000, 4)], SCHEMA
            ).coalesce(1)
        )
    assert len(t.plan_files({"k": ("<", 100)})) == 4  # no pruning possible

    summary = compact(t, target_file_size=2048, sort_by=["k"])
    assert summary["compacted"] == 4
    files_after = t.plan_files()
    assert len(files_after) > 1  # multiple range-clustered outputs
    pruned = t.plan_files({"k": ("<", 100)})
    assert len(pruned) < len(files_after)  # clustering bought pruning
    assert sorted(r["k"] for r in t.scan().collect()) == list(range(1000))


def test_compaction_after_rename_reads_physical_names(spark, tmp_path):
    from icebergplus_spark.lake import LocalLakeCatalog, compact

    cat = LocalLakeCatalog(spark, str(tmp_path / "whr")).start()
    t = cat.create_table("db.renamed", SCHEMA)
    t.append(spark.createDataFrame([(1, "a")], SCHEMA).coalesce(1))
    t.append(spark.createDataFrame([(2, "b")], SCHEMA).coalesce(1))
    t = t.rename_column("v", "label")
    compact(t)
    rows = sorted((r["k"], r["label"]) for r in t.scan().collect())
    assert rows == [(1, "a"), (2, "b")]


def test_zorder_compaction_prunes_on_both_columns(spark, tmp_path):
    from pyspark.sql.types import IntegerType, StructField, StructType

    from icebergplus_spark.lake import LocalLakeCatalog, compact

    xy = StructType(
        [StructField("x", IntegerType(), True), StructField("y", IntegerType(), True)]
    )
    cat = LocalLakeCatalog(spark, str(tmp_path / "whz")).start()
    t = cat.create_table("db.zorder", xy)
    # interleaved appends over a 32x32 grid: every file spans the full
    # range of BOTH columns, so neither predicate can prune anything
    for i in range(4):
        rows = [(x, y) for x in range(32) for y in range(32) if (x + y) % 4 == i]
        t.append(spark.createDataFrame(rows, xy).coalesce(1))
    assert len(t.plan_files({"x": ("<", 8)})) == 4
    assert len(t.plan_files({"y": ("<", 8)})) == 4

    with pytest.raises(ValueError):
        compact(t, sort_by=["x"], zorder_by=["y"])

    # small target → ~8 output files: z-range cuts then land on
    # BOTH dimensions (3 files would cut only the leading bit's dim)
    summary = compact(t, target_file_size=700, zorder_by=["x", "y"])
    assert summary["compacted"] == 4
    files_after = t.plan_files()
    assert len(files_after) >= 4
    # z-clustering narrows min/max on BOTH dimensions (sort_by would
    # narrow only the leading column)
    assert len(t.plan_files({"x": ("<", 8)})) < len(files_after)
    assert len(t.plan_files({"y": ("<", 8)})) < len(files_after)
    # content preserved
    assert t.scan().count() == 1024
    assert t.scan().select(F.sum("x").alias("s")).collect()[0]["s"] == sum(
        x for x in range(32) for _ in range(32)
    )


def test_zorder_equal_depth_beats_width_under_skew(spark, tmp_path):
    """Under heavy value skew, equal-width z-cells collapse nearly every
    row into one cell (clustering degenerates); sampled equal-depth cut
    points keep cells evenly populated, so file [min,max] stats stay
    narrow in the dense region and prune more files there."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    from icebergplus_spark.lake import LocalLakeCatalog, compact

    schema = StructType(
        [StructField("a", LongType(), True), StructField("b", LongType(), True)]
    )
    # 99% of values in [0, 100), 1% huge outliers up to 10^9: equal-width
    # binning between min/max puts the dense mass in a single cell.
    rows = spark.range(0, 100000).select(
        F.when(F.col("id") % 100 == 0, F.col("id") * 50000)
        .otherwise(F.col("id") % 100)
        .alias("a"),
        F.when(F.col("id") % 100 == 1, F.col("id") * 50000)
        .otherwise((F.col("id") * 7) % 100)
        .alias("b"),
    )

    def pruned_count(binning):
        cat = LocalLakeCatalog(spark, str(tmp_path / f"wh_{binning}")).start()
        t = cat.create_table(f"db.skew_{binning}", schema)
        for i in range(4):  # 4 small files so compaction has work
            t.append(rows.filter(F.col("a") % 4 == i).coalesce(1))
        compact(
            t,
            target_file_size=8 * 1024,
            small_file_threshold=1 << 30,
            zorder_by=["a", "b"],
            zorder_binning=binning,
        )
        total = len(t.plan_files())
        # Predicate at the top of the dense region: depth binning gives
        # the dense mass its own z-quadrants, so low-quadrant files have
        # max(a) well below 95 and prune; width binning collapses all
        # dense values into one z-cell, so every file mixes the full
        # dense range and max(a) ~ 99 everywhere — nothing prunes.
        kept = len(t.plan_files({"a": (">=", 95)}))
        return total - kept, total

    depth_pruned, depth_total = pruned_count("depth")
    width_pruned, width_total = pruned_count("width")
    assert depth_total > 2 and width_total > 2  # real multi-file layout
    assert depth_pruned > width_pruned, (
        f"equal-depth pruned {depth_pruned}/{depth_total}, "
        f"equal-width pruned {width_pruned}/{width_total}"
    )


def test_where_scoped_compaction_touches_only_matching_files(spark, small_file_table):
    """OPTIMIZE ... WHERE parity: files outside the predicate scope are
    never rewritten — same path, same bytes — while in-scope small files
    bin-pack; content is unchanged either way."""
    t = small_file_table.refresh()
    rows_before = sorted((r.k, r.v) for r in t.scan().collect())
    files_before = {f["file_path"]: f["file_size_bytes"] for f in t.plan_files()}

    # scope: k < 200 → the first two appends' files (k in [0..150])
    report = compact(t, where={"k": ("<", 200)})
    t = t.refresh()
    assert report["files_before"] > report["files_after"]

    files_after = {f["file_path"]: f["file_size_bytes"] for f in t.plan_files()}
    out_of_scope_before = {
        p for p, _ in files_before.items()
        if p in files_after  # survived untouched
    }
    # every out-of-scope file (k >= 200 only) must survive byte-identical
    import json as _json

    for f in t.plan_files():
        p = f["file_path"]
        if p in files_before:
            mins = _json.loads(f["column_mins"])
            assert mins.get("k", 0) >= 200 or f["file_size_bytes"] == files_before[p]
            assert files_after[p] == files_before[p]
    # at least one original file survived (the out-of-scope partitions)
    assert out_of_scope_before
    # and the table content is byte-for-byte the same
    assert sorted((r.k, r.v) for r in t.scan().collect()) == rows_before
