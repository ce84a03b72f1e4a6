"""Scalar-subquery WHERE inlining (r10, VERDICT r9 #5): the
high-watermark incremental-consumer shape ``SELECT ... WHERE ts >
(SELECT MAX(ts) FROM checkpoint)``. The scalar is answered by the
subquery's own fast path (a MIN/MAX manifest fold reads ZERO data
files when stats cover — planted by deleting the checkpoint's data
files) and inlined as a literal so the OUTER statement rides the
pruned fast paths (planted file-count gate). NULL/empty, multi-row,
correlated, and unfoldable-type shapes all pinned."""

from datetime import datetime

import pytest
from pyspark.sql.types import (
    IntegerType,
    StructField,
    StructType,
    TimestampType,
)

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.lake.sql_dml import UnsupportedSQL, lake_sql

EV = StructType(
    [
        StructField("k", IntegerType(), True),
        StructField("ts", TimestampType(), True),
    ]
)
CP = StructType([StructField("wm", TimestampType(), True)])


@pytest.fixture()
def cat(spark, tmp_path):
    c = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    ev = c.create_table("db.ev", EV)
    # two files: days 1..4 and days 10..13
    ev.append(
        spark.createDataFrame(
            [(i, datetime(2024, 1, i)) for i in range(1, 5)], EV
        ).coalesce(1)
    )
    ev.append(
        spark.createDataFrame(
            [(i, datetime(2024, 1, i)) for i in range(10, 14)], EV
        ).coalesce(1)
    )
    # wm strictly above the low file's max ts: stats carry a tz suffix
    # ('2024-01-04T00:00:00+00:00'), so a boundary-EQUAL literal keeps
    # the file conservatively (sound); a strictly-lower file prunes
    cp = c.create_table("db.cp", CP)
    cp.append(spark.createDataFrame([(datetime(2024, 1, 5),)], CP))
    c.create_table("db.cp_empty", CP)
    return c


def _recording(t, method):
    calls = []
    orig = getattr(t, method)

    def wrapped(*a, **kw):
        out = orig(*a, **kw)
        calls.append([f["file_path"] for f in out])
        return out

    setattr(t, method, wrapped)
    return calls


def _patched(cat):
    ev, cp = cat.load_table("db.ev"), cat.load_table("db.cp")
    handles = {"db.ev": ev, "db.cp": cp}
    orig = cat.load_table
    cat.load_table = lambda ident: handles.get(ident) or orig(ident)
    return ev, cp


def test_watermark_read_plans_only_boundary_files(spark, cat):
    """THE planted proof: the inlined literal reaches the outer scan's
    planner — only the high file (one of two) is planned."""
    ev, cp = _patched(cat)
    calls = _recording(ev, "plan_files_any")
    got = sorted(
        r["k"]
        for r in lake_sql(
            cat,
            "SELECT k FROM db.ev WHERE ts > (SELECT MAX(wm) FROM db.cp)",
        ).collect()
    )
    assert got == [10, 11, 12, 13]
    assert len(calls) == 1 and len(calls[0]) == 1, calls


def test_scalar_folds_from_manifest(spark, cat):
    """The scalar itself is a MIN/MAX fold: with the checkpoint's data
    files DELETED, the watermark still answers from manifest stats (a
    real scan would fail)."""
    import os

    ev, cp = _patched(cat)
    for f in cp.plan_files():
        os.remove(f["file_path"])
    got = sorted(
        r["k"]
        for r in lake_sql(
            cat,
            "SELECT k FROM db.ev WHERE ts > (SELECT MAX(wm) FROM db.cp)",
        ).collect()
    )
    assert got == [10, 11, 12, 13]


def test_empty_checkpoint_scalar_is_null(spark, cat):
    """SQL scalar-subquery semantics: an empty result is NULL — the
    comparison yields NULL and the read matches nothing."""
    got = lake_sql(
        cat,
        "SELECT k FROM db.ev WHERE ts > (SELECT MAX(wm) FROM db.cp_empty)",
    ).collect()
    assert got == []


def test_dml_scalar_prunes_and_composes_with_in(spark, cat):
    """DELETE with an inlined scalar keeps the grammar prune (the high
    file carries over byte-identical), and the scalar composes with a
    [NOT] IN conjunct through the compound router."""
    ev, cp = _patched(cat)
    high = {f["file_path"] for f in ev.plan_files({"k": (">=", 10)})}
    assert len(high) == 1
    lake_sql(
        cat, "DELETE FROM db.ev WHERE ts <= (SELECT MAX(wm) FROM db.cp)"
    )
    after = {f["file_path"] for f in ev.plan_files()}
    assert high <= after
    assert sorted(
        r["k"] for r in lake_sql(cat, "SELECT k FROM db.ev").collect()
    ) == [10, 11, 12, 13]
    keys = cat.create_table(
        "db.sk", StructType([StructField("kk", IntegerType(), True)])
    )
    keys.append(spark.createDataFrame([(10,), (11,)], "kk int"))
    lake_sql(
        cat,
        "DELETE FROM db.ev WHERE k IN (SELECT kk FROM db.sk) "
        "AND ts <= (SELECT MAX(ts) FROM db.ev)",
    )
    assert sorted(
        r["k"] for r in lake_sql(cat, "SELECT k FROM db.ev").collect()
    ) == [12, 13]


def test_multirow_subquery_declines(spark, cat):
    """A subquery yielding two rows is NOT a scalar — the span is left
    untouched: the DML grammar refuses loudly (never picks a row), the
    read path falls to Spark's own scalar-subquery runtime error."""
    keys = cat.create_table(
        "db.mk", StructType([StructField("kk", IntegerType(), True)])
    )
    keys.append(spark.createDataFrame([(1,), (2,)], "kk int"))
    with pytest.raises(UnsupportedSQL):
        lake_sql(cat, "DELETE FROM db.ev WHERE k = (SELECT kk FROM db.mk)")
    with pytest.raises(Exception):
        lake_sql(
            cat, "SELECT k FROM db.ev WHERE k = (SELECT kk FROM db.mk)"
        ).collect()


def test_correlated_scalar_falls_to_native(spark, cat):
    """A correlated scalar can't run standalone — the inliner declines
    and Spark's native correlated-scalar execution returns exact
    rows."""
    got = sorted(
        r["k"]
        for r in lake_sql(
            cat,
            "SELECT k FROM db.ev e "
            "WHERE e.ts > (SELECT MAX(wm) FROM db.cp c WHERE c.wm < e.ts)",
        ).collect()
    )
    # rows with SOME wm < ts: every day-10+ row and days 2..4 (wm=Jan 4
    # only qualifies where wm < ts, and then ts > MAX(...)=Jan 4 ...);
    # compute the reference natively for exactness
    ev, cp = _patched(cat)
    ev.to_view("ev_corr_ref")
    cp.to_view("cp_corr_ref")
    want = sorted(
        r["k"]
        for r in ev.spark.sql(
            "SELECT k FROM ev_corr_ref e WHERE e.ts > "
            "(SELECT MAX(wm) FROM cp_corr_ref c WHERE c.wm < e.ts)"
        ).collect()
    )
    assert got == want and got


def test_string_scalar_inlines_quoted(spark, cat):
    """String scalars re-quote with '' escaping."""
    s = cat.create_table(
        "db.sv",
        StructType(
            [
                StructField("k", IntegerType(), True),
                StructField("v", __import__("pyspark").sql.types.StringType(), True),
            ]
        ),
    )
    s.append(
        spark.createDataFrame([(1, "a'b"), (2, "zz")], "k int, v string")
    )
    got = lake_sql(
        cat,
        "SELECT k FROM db.sv WHERE v = (SELECT MAX(v) FROM db.sv)",
    ).collect()
    assert [r["k"] for r in got] == [2]
    got2 = lake_sql(
        cat,
        "SELECT k FROM db.sv WHERE v = (SELECT MIN(v) FROM db.sv)",
    ).collect()
    assert [r["k"] for r in got2] == [1]
