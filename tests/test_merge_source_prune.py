"""SOURCE-side MERGE file pruning (r12, VERDICT r11 #4): when the
MERGE source is itself a lake table and the statement has no INSERT
clause, only source files whose key stats intersect the TARGET's key
domain are read. Battery: planted source-file-count gates (Python API
and SQL MERGE), result equivalence vs the unpruned merge, the INSERT
clause guard (SQL never prunes the source then), the probe-domain
type gate, float-key decline (NaN==NaN matches in Spark but is
invisible to stats), multi-key intersection, empty-domain decline,
and nothing-pruned decline."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.lake.sql_dml import lake_sql

T = StructType(
    [
        StructField("k", LongType(), True),
        StructField("v", DoubleType(), True),
        StructField("tag", StringType(), True),
    ]
)


def _mk(spark, tmp_path):
    """Target holds keys [0, 40); source holds keys [0, 200) in five
    40-key chunk files — only the first chunk can match."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    tgt = cat.create_table("db.tgt", T)
    tgt.append(
        spark.createDataFrame(
            [(i, float(i), "t") for i in range(40)], T
        ).coalesce(2)
    )
    src = cat.create_table("db.src", T)
    for lo in range(0, 200, 40):
        src.append(
            spark.createDataFrame(
                [(lo + i, -1.0, "s") for i in range(40)], T
            ).coalesce(1)
        )
    return cat, tgt, src


def test_planted_source_file_count(spark, tmp_path):
    _, tgt, src = _mk(spark, tmp_path)
    assert len(src.plan_files()) == 5
    pruned = src.scan_pruned_for_merge(tgt, ["k"])
    assert pruned is not None
    files = {
        r[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    assert len(files) == 1  # only the [0,40) chunk intersects


def test_sql_merge_result_matches_unpruned(spark, tmp_path):
    cat, tgt, src = _mk(spark, tmp_path)
    lake_sql(
        cat,
        "MERGE INTO db.tgt t USING db.src s ON t.k = s.k "
        "WHEN MATCHED AND s.k >= 10 THEN UPDATE SET t.v = s.v",
    )
    rows = sorted(
        (r["k"], r["v"]) for r in tgt.refresh().scan().collect()
    )
    want = sorted(
        [(i, float(i)) for i in range(10)]
        + [(i, -1.0) for i in range(10, 40)]
    )
    assert rows == want


def test_sql_merge_delete_matches(spark, tmp_path):
    cat, tgt, src = _mk(spark, tmp_path)
    lake_sql(
        cat,
        "MERGE INTO db.tgt t USING db.src s ON t.k = s.k "
        "WHEN MATCHED AND s.k < 5 THEN DELETE",
    )
    left = sorted(r["k"] for r in tgt.refresh().scan().collect())
    assert left == list(range(5, 40))


def test_insert_clause_never_prunes_source(spark, tmp_path):
    """With WHEN NOT MATCHED INSERT, every source row matters — the
    SQL path must NOT prune, and all 200 keys must land."""
    cat, tgt, src = _mk(spark, tmp_path)
    lake_sql(
        cat,
        "MERGE INTO db.tgt t USING db.src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET t.v = s.v "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    assert tgt.refresh().scan().count() == 200


def test_type_gate_declines(spark, tmp_path):
    """A STRING-keyed probe against a BIGINT target column can't be
    mirrored by raw-value stat compares — decline."""
    cat, tgt, _ = _mk(spark, tmp_path)
    S = StructType(
        [StructField("k", StringType(), True), StructField("v", DoubleType(), True)]
    )
    s2 = cat.create_table("db.src_str", S)
    for c in range(2):
        s2.append(
            spark.createDataFrame(
                [(str(i + 100 * c), 0.0) for i in range(5)], S
            ).coalesce(1)
        )
    assert s2.scan_pruned_for_merge(tgt, ["k"]) is None


def test_float_key_declines(spark, tmp_path):
    """Float merge keys: NaN == NaN matches in Spark but is invisible
    to footer stats — never prune on them."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "whf")).start()
    S = StructType(
        [StructField("k", DoubleType(), True), StructField("v", LongType(), True)]
    )
    tgt = cat.create_table("db.ftgt", S)
    tgt.append(spark.createDataFrame([(1.0, 1), (2.0, 2)], S))
    src = cat.create_table("db.fsrc", S)
    for c in range(2):
        src.append(
            spark.createDataFrame(
                [(float(i + 10 * c), 0) for i in range(5)], S
            ).coalesce(1)
        )
    assert src.scan_pruned_for_merge(tgt, ["k"]) is None


def test_multi_key_intersects(spark, tmp_path):
    """Each usable key prunes independently (AND of equalities): a
    source file out of domain on EITHER key drops."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "whm")).start()
    S = StructType(
        [
            StructField("a", LongType(), True),
            StructField("b", LongType(), True),
            StructField("v", LongType(), True),
        ]
    )
    tgt = cat.create_table("db.mtgt", S)
    tgt.append(
        spark.createDataFrame([(i, i, 0) for i in range(10)], S).coalesce(1)
    )
    src = cat.create_table("db.msrc", S)
    # chunk 1: a in domain, b out; chunk 2: both in; chunk 3: a out
    src.append(
        spark.createDataFrame([(i, 100 + i, 1) for i in range(10)], S).coalesce(1)
    )
    src.append(
        spark.createDataFrame([(i, i, 1) for i in range(10)], S).coalesce(1)
    )
    src.append(
        spark.createDataFrame([(100 + i, i, 1) for i in range(10)], S).coalesce(1)
    )
    pruned = src.scan_pruned_for_merge(tgt, ["a", "b"])
    assert pruned is not None
    files = {
        r[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    assert len(files) == 1


def test_declines_when_nothing_pruned_or_empty_target(spark, tmp_path):
    cat, tgt, src = _mk(spark, tmp_path)
    # same-domain source (all files intersect) → None, unpruned path
    same = cat.create_table("db.same", T)
    for c in range(2):
        same.append(
            spark.createDataFrame(
                [(i + 20 * c, 0.0, "s") for i in range(20)], T
            ).coalesce(1)
        )
    assert same.scan_pruned_for_merge(tgt, ["k"]) is None
    # empty target → decline (unknowable domain)
    empty = cat.create_table("db.empty", T)
    assert src.scan_pruned_for_merge(empty, ["k"]) is None


def test_single_file_source_declines(spark, tmp_path):
    cat, tgt, _ = _mk(spark, tmp_path)
    one = cat.create_table("db.one", T)
    one.append(
        spark.createDataFrame([(999, 0.0, "s")], T).coalesce(1)
    )
    assert one.scan_pruned_for_merge(tgt, ["k"]) is None


def test_branch_pruned_noop_merge_runs_zero_jobs(spark, tmp_path):
    """r13 (guide §1.2): target_branches prune is driver metadata, so a
    merge whose branch list rules out EVERY file must no-op before the
    source probe ever runs — zero Spark jobs, no snapshot churn — on
    both the CoW and the MoR path."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from icebergplus_spark.lake import LocalLakeCatalog

    schema = StructType(
        [
            StructField("k", IntegerType(), True),
            StructField("ts", IntegerType(), True),
        ]
    )

    def jmax():
        j = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
        return max(j) if j else -1

    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    for name, dv in (("db.cow", False), ("db.mor", True)):
        t = cat.create_table(name, schema)
        if dv:
            t.set_property("delete.representation", "dv")
        t.append(
            spark.createDataFrame([(i, 100 + i) for i in range(8)], schema)
        )
        snap_before = t.current_snapshot_id
        src = spark.createDataFrame([(2, 0), (5, 0)], schema).select("k")
        j0 = jmax()
        t.merge_into(
            src,
            on="k",
            when_matched_delete=True,
            when_not_matched_insert=False,
            matched_condition=F.col("ts") < 50,
            target_branches=[{"ts": ("<", 50)}],
        )
        assert jmax() == j0, f"{name}: branch-pruned no-op merge ran a job"
        assert t.current_snapshot_id == snap_before, f"{name}: snapshot churn"
        assert t.scan().count() == 8, f"{name}: rows changed"


def test_merge_probe_handles_binary_keys(spark, tmp_path):
    """r13 review: the raw-first probe tier hashes key tuples
    driver-side, which PySpark's bytearray/list values for
    binary/array keys cannot join — those types must decline the raw
    tier (back to the shuffled-dedup tier) and the merge itself must
    stay correct."""
    from pyspark.sql.types import (
        BinaryType,
        StringType,
        StructField,
        StructType,
    )

    from icebergplus_spark.lake import LocalLakeCatalog

    schema = StructType(
        [
            StructField("k", BinaryType(), True),
            StructField("v", StringType(), True),
        ]
    )
    cat = LocalLakeCatalog(spark, str(tmp_path / "whb")).start()
    t = cat.create_table("db.bin", schema)
    rows = [(bytes([i]), f"v{i}") for i in range(6)]
    t.append(spark.createDataFrame(rows, schema))
    src = spark.createDataFrame([(bytes([2]), "x"), (bytes([4]), "x")], schema)
    t.merge_into(
        src, on="k", when_matched_delete=True, when_not_matched_insert=False
    )
    left = sorted(bytes(r["k"])[0] for r in t.scan().collect())
    assert left == [0, 1, 3, 5]
