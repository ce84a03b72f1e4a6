"""NaN-sound float-column stats (r12, ADVICE r11 medium): parquet
footer min/max OMIT NaN (measured: pyarrow writes min=max=1.0 for
{1.0, NaN} with null_count=0) while Spark and DuckDB order NaN GREATER
than every real value. The engine harvests per-file NaN counts
(column_nan_counts) in the shared write-time column read, so float
pruning stays ENGAGED on NaN-free files and stays SOUND on NaN-bearing
ones; min/max/COUNT(DISTINCT) folds exclude float columns outright."""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.lake.sql_dml import lake_sql
from icebergplus_spark.lake.table import (
    _file_fully_matches,
    _file_matches,
)

T = StructType(
    [
        StructField("k", LongType(), True),
        StructField("v", DoubleType(), True),
    ]
)

NAN = float("nan")


def _mk(spark, tmp_path, with_nan=True):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.t", T)
    lo = [(i, float(i)) for i in range(10)]  # v in [0, 9]
    if with_nan:
        lo.append((99, NAN))
    t.append(spark.createDataFrame(lo, T).coalesce(1))
    t.append(
        spark.createDataFrame(
            [(100 + i, 100.0 + i) for i in range(10)], T
        ).coalesce(1)
    )
    return cat, t


def test_nan_counts_harvested(spark, tmp_path):
    import json

    _, t = _mk(spark, tmp_path)
    files = sorted(t.plan_files(), key=lambda f: f["file_path"])
    nans = [
        json.loads(f.get("column_nan_counts") or "{}").get("v")
        for f in t.plan_files()
    ]
    assert sorted(nans) == [0, 1]


def test_spark_orders_nan_greatest(spark):
    """The semantic premise: NaN > any real in Spark comparisons."""
    row = spark.sql(
        "SELECT double('NaN') > 1e308 AS gt, "
        "double('NaN') = double('NaN') AS eq"
    ).first()
    assert row["gt"] is True and row["eq"] is True


def test_gt_keeps_nan_file_and_rows_survive(spark, tmp_path):
    """v > 50 matches the NaN row (Spark ordering) — the NaN file's
    footer max is 9.0, so a naive max-prune would drop it."""
    cat, t = _mk(spark, tmp_path)
    kept = t.plan_files({"v": (">", 50.0)})
    assert len(kept) == 2  # NaN file kept despite max=9.0
    got = lake_sql(cat, "SELECT k FROM db.t WHERE v > 50.0").collect()
    ks = sorted(r[0] for r in got)
    assert 99 in ks and ks == [99] + list(range(100, 110))


def test_gt_prunes_nanfree_file(spark, tmp_path):
    """Without NaN, the harvest proves nan_count=0 and the max-side
    prune engages — float range pruning is not lost (r10 merge
    range-conjunct contract)."""
    _, t = _mk(spark, tmp_path, with_nan=False)
    kept = t.plan_files({"v": (">", 50.0)})
    assert len(kept) == 1


def test_opt_out_is_conservative(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.noharvest", T)
    t.set_property("write.stats.nan-counts", "false")
    t.append(
        spark.createDataFrame([(i, float(i)) for i in range(5)], T).coalesce(1)
    )
    t.append(
        spark.createDataFrame(
            [(10 + i, 100.0 + i) for i in range(5)], T
        ).coalesce(1)
    )
    # unknown NaN counts -> max-side prunes keep everything (sound)
    assert len(t.plan_files({"v": (">", 50.0)})) == 2
    # min-side prunes never had the hazard and still engage
    assert len(t.plan_files({"v": ("<", 50.0)})) == 1


def test_full_match_proofs_gate_on_nan(spark, tmp_path):
    _, t = _mk(spark, tmp_path)
    by_nan = {}
    import json

    for f in t.plan_files():
        n = json.loads(f.get("column_nan_counts") or "{}").get("v")
        by_nan[n] = f
    nan_file, clean_file = by_nan[1], by_nan[0]
    # {0..9, NaN} file: "v <= 9" is NOT fully matched (NaN fails <=)
    assert not _file_fully_matches(nan_file, {"v": ("<=", 9.0)})
    # ... but "v >= 0" IS (NaN >= 0 is true in Spark ordering)
    assert _file_fully_matches(nan_file, {"v": (">=", 0.0)})
    # clean file: nan_count==0 re-enables the <= proof
    assert _file_fully_matches(clean_file, {"v": ("<=", 109.0)})


def test_ne_prune_gates_on_nan(spark, tmp_path):
    """A constant-by-stats float file {5.0, NaN} must NOT prune for
    v != 5.0 — the NaN row satisfies it."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.ne", T)
    t.append(
        spark.createDataFrame([(1, 5.0), (2, NAN)], T).coalesce(1)
    )
    row = t.plan_files()[0]
    assert _file_matches(row, {"v": ("!=", 5.0)})
    got = lake_sql(cat, "SELECT k FROM db.ne WHERE v != 5.0").collect()
    assert [r[0] for r in got] == [2]
    # and a truly constant NaN-free file still prunes
    t2 = cat.create_table("db.ne2", T)
    t2.append(spark.createDataFrame([(1, 5.0), (2, 5.0)], T).coalesce(1))
    assert not _file_matches(t2.plan_files()[0], {"v": ("!=", 5.0)})


def test_count_fold_with_float_predicate_stays_exact(spark, tmp_path):
    """count_rows_by under a float predicate: the NaN file can never be
    claimed fully covered by v <= 9, so the count routes it to the
    scan leg and stays exact (NaN row excluded, per Spark ordering
    NaN <= 9 is false)."""
    cat, t = _mk(spark, tmp_path)
    got = lake_sql(
        cat, "SELECT COUNT(*) AS n FROM db.t WHERE v <= 9.0"
    ).first()["n"]
    assert got == 10  # the ten real rows; NaN row excluded


def test_distributed_keep_condition_equivalence(spark, tmp_path):
    """The Catalyst keep-condition tier must classify float files
    exactly like the driver tier — NaN file kept for max-side ops,
    clean file pruned."""
    _, t = _mk(spark, tmp_path)
    snap = t.snapshot()
    files = t._manifest_df(snap)
    phys = {"v": (">", 50.0)}
    kept = files.filter(t._stats_keep_condition(phys)).count()
    assert kept == len(t.plan_files({"v": (">", 50.0)})) == 2
