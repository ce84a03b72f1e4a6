"""Grouped SUM/AVG manifest folds (r10, VERDICT r9 #8): parquet
footers carry no column sums, so the engine harvests exact per-file
INTEGER sums into its own manifest at write time (``column_sums``) and
``agg_by`` folds SUM — and AVG, as SUM + non-null COUNT divided after
the merge — in the same two-tier design as MIN/MAX/COUNT. Battery:
the nuked-data-files fold proof, fold+scan half merging, NULL
semantics, pre-upgrade back-compat (manifests without sums take the
scan leg), the harvest opt-out property, the integer-only gate, and
the executor tier."""

import os

import pytest
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
        StructField("g", StringType(), True),
        StructField("x", LongType(), True),
        StructField("d", DoubleType(), True),
    ]
)

Q = (
    "SELECT g, SUM(x) AS s, AVG(x) AS av, COUNT(*) AS n "
    "FROM db.t GROUP BY g ORDER BY g"
)


def _mk(spark, tmp_path, prop=None):
    c = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = c.create_table("db.t", T)
    if prop:
        t.set_property(*prop)
    # one file per group; group a carries a NULL x
    t.append(
        spark.createDataFrame(
            [("a", i, float(i)) for i in range(1, 5)] + [("a", None, 0.0)],
            T,
        ).coalesce(1)
    )
    t.append(
        spark.createDataFrame(
            [("b", i * 10, float(i)) for i in range(1, 5)], T
        ).coalesce(1)
    )
    return c, t


EXPECT = [("a", 10, 2.5, 5), ("b", 100, 25.0, 4)]


def _got(cat):
    return [
        (r["g"], r["s"], r["av"], r["n"])
        for r in lake_sql(cat, Q).collect()
    ]


def test_sum_avg_grouped_fold_matches_scan(spark, tmp_path):
    cat, t = _mk(spark, tmp_path)
    assert _got(cat) == EXPECT


def test_fold_answers_with_data_files_deleted(spark, tmp_path):
    """THE planted proof: with every data file gone, grouped SUM/AVG/
    COUNT still answer from the manifest's write-time sums."""
    cat, t = _mk(spark, tmp_path)
    for f in t.plan_files():
        os.remove(f["file_path"])
    assert _got(cat) == EXPECT


def test_all_null_group_sums_to_null(spark, tmp_path):
    """A group whose every x is NULL: SUM NULL, AVG NULL, COUNT(*)
    counts rows — and it still folds (absence + all-null stats read as
    a NULL contribution)."""
    cat, t = _mk(spark, tmp_path)
    t.append(
        spark.createDataFrame(
            [("z", None, 0.0), ("z", None, 0.0)], T
        ).coalesce(1)
    )
    for f in cat.load_table("db.t").plan_files():
        os.remove(f["file_path"])
    got = _got(cat)
    assert got == EXPECT + [("z", None, None, 2)]


def test_pre_upgrade_manifest_takes_scan_leg(spark, tmp_path):
    """Back-compat: files written with sum harvesting OFF (the
    pre-upgrade manifest shape — column_sums absent/empty) fold
    nothing; the scan leg still answers exactly. Mixed old+new
    manifests in one snapshot merge schemas cleanly."""
    cat, t = _mk(
        spark, tmp_path, prop=("write.stats.column-sums", "false")
    )
    import json

    assert all(
        not json.loads(f.get("column_sums") or "{}")
        for f in t.plan_files()
    )
    assert _got(cat) == EXPECT  # scan leg, exact
    # flip harvesting ON and append a third group → mixed manifests
    t.set_property("write.stats.column-sums", "true")
    t2 = cat.load_table("db.t")
    t2.append(
        spark.createDataFrame([("c", 7, 0.0), ("c", 8, 0.0)], T).coalesce(1)
    )
    assert _got(cat) == EXPECT + [("c", 15, 7.5, 2)]
    # the planted half-proof: delete only the NEW file — groups a/b
    # scan (their files intact), c folds from its harvested sum
    new_file = [
        f["file_path"]
        for f in cat.load_table("db.t").plan_files({"g": ("=", "c")})
    ]
    for p in new_file:
        os.remove(p)
    assert _got(cat) == EXPECT + [("c", 15, 7.5, 2)]


def test_sum_fold_integer_only(spark, tmp_path):
    """SUM/AVG over a double column never folds (scan-order rounding):
    agg_by raises; the SQL path declines to the generic exact scan."""
    cat, t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="integer columns only"):
        t.agg_by("g", [("SUM", "d", "sd")])
    got = {
        r["g"]: r["sd"]
        for r in lake_sql(
            cat, "SELECT g, SUM(d) AS sd FROM db.t GROUP BY g ORDER BY g"
        ).collect()
    }
    assert got["a"] == pytest.approx(10.0) and got["b"] == pytest.approx(10.0)


def test_sum_fold_distributed_tier(spark, tmp_path):
    """Past planning.distributed-threshold the classification runs
    over manifest parquet on executors — same answers, data files
    deleted to plant the fold."""
    cat, t = _mk(spark, tmp_path)
    t.set_property("planning.distributed-threshold", "1")
    for f in cat.load_table("db.t").plan_files():
        os.remove(f["file_path"])
    got = [
        (r["g"], r["s"], r["av"], r["n"])
        for r in cat.load_table("db.t")
        .agg_by(
            "g",
            [("SUM", "x", "s"), ("AVG", "x", "av"), ("COUNT", None, "n")],
        )
        .orderBy("g")
        .collect()
    ]
    assert got == EXPECT


def test_sum_fold_with_where_boundary(spark, tmp_path):
    """A WHERE that fully covers one file and cuts the other: the
    covered file folds, the boundary file scans, halves merge exactly."""
    cat, t = _mk(spark, tmp_path)
    got = [
        (r["g"], r["s"], r["av"])
        for r in lake_sql(
            cat,
            "SELECT g, SUM(x) AS s, AVG(x) AS av FROM db.t "
            "WHERE x >= 2 GROUP BY g ORDER BY g",
        ).collect()
    ]
    # a: 2+3+4=9 over 3 rows; b: fully covered (10..40)=100 over 4
    assert got == [("a", 9, 3.0), ("b", 100, 25.0)]


def test_scalar_sum_avg_fold(spark, tmp_path):
    """Zero-group (scalar) shape: SELECT SUM/AVG/COUNT FROM t answers
    from the manifest — planted by deleting the data files."""
    cat, t = _mk(spark, tmp_path)
    for f in t.plan_files():
        os.remove(f["file_path"])
    r = lake_sql(
        cat,
        "SELECT SUM(x) AS s, AVG(x) AS av, COUNT(*) AS n FROM db.t",
    ).collect()
    assert [(x["s"], x["av"], x["n"]) for x in r] == [(110, 13.75, 9)]
    # unaliased spelling matches Spark's default naming
    df = lake_sql(cat, "SELECT SUM(x), AVG(x) FROM db.t")
    assert df.columns == ["sum(x)", "avg(x)"]


def test_scalar_sum_where_fully_covered_folds(spark, tmp_path):
    """A WHERE fully covering one file folds it; the NULL-bearing file
    is a genuine boundary (NULL fails every comparison) and scans."""
    cat, t = _mk(spark, tmp_path)
    r = lake_sql(
        cat, "SELECT SUM(x) AS s, COUNT(*) AS n FROM db.t WHERE x >= 1"
    ).collect()
    assert [(x["s"], x["n"]) for x in r] == [(110, 8)]


def test_scalar_sum_never_written_and_empty(spark, tmp_path):
    """SQL global-aggregate shape over a never-written table: ONE row,
    COUNT 0, SUM NULL."""
    c = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    c.create_table("db.e", T)
    r = lake_sql(c, "SELECT SUM(x) AS s, COUNT(*) AS n FROM db.e").collect()
    assert [(x["s"], x["n"]) for x in r] == [(None, 0)]


def test_scalar_sum_subquery_composes_with_inliner(spark, tmp_path):
    """(SELECT SUM(x) FROM t) as a scalar subquery: the inliner runs it
    through the fold and the outer statement rides the literal."""
    cat, t = _mk(spark, tmp_path)
    r = lake_sql(
        cat,
        "SELECT COUNT(*) AS n FROM db.t "
        "WHERE x < (SELECT SUM(x) FROM db.t)",
    ).collect()
    assert [x["n"] for x in r] == [8]  # every non-null x < 110


def test_count_col_folds(spark, tmp_path):
    """COUNT(col) — the non-null count — folds from record_count minus
    the null stat, scalar and grouped, planted by deleting files."""
    cat, t = _mk(spark, tmp_path)
    for f in t.plan_files():
        os.remove(f["file_path"])
    r = lake_sql(
        cat, "SELECT COUNT(x) AS nn, COUNT(*) AS n FROM db.t"
    ).collect()
    assert [(x["nn"], x["n"]) for x in r] == [(8, 9)]
    g = lake_sql(
        cat,
        "SELECT g, COUNT(x) AS nn, COUNT(*) AS n FROM db.t "
        "GROUP BY g ORDER BY g",
    ).collect()
    assert [(x["g"], x["nn"], x["n"]) for x in g] == [
        ("a", 4, 5), ("b", 4, 4)
    ]
    # Spark-exact unaliased naming
    assert lake_sql(cat, "SELECT COUNT(x) FROM db.t").columns == ["count(x)"]
