"""Scalar subqueries beyond WHERE (r11, VERDICT r10 #2): UPDATE SET
assignments and select-list items inline uncorrelated single-row
single-column subqueries as typed literals, so the scalar answers from
the inner table's OWN fast path (manifest folds — proven here by
deleting the inner table's data files). Battery: the fold proof, typed
temporal literals, txn-block SET, the paren-aware SET/WHERE split
(subquery WHERE + string literals containing the word), loud declines
(multi-row, correlated), and the unaliased-select-item naming decline.
"""

import os

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.localrel import local_rows_df
from icebergplus_spark.lake.sql_dml import UnsupportedSQL, lake_sql

T = StructType(
    [
        StructField("id", LongType(), True),
        StructField("v", DoubleType(), True),
        StructField("s", StringType(), True),
    ]
)
CAP = StructType([StructField("cap", LongType(), True)])


def _mk(spark, tmp_path):
    c = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = c.create_table("db.t", T)
    t.append(
        local_rows_df(spark, 
            [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c")], T
        )
    )
    cap = c.create_table("db.cap", CAP)
    cap.append(local_rows_df(spark, [(77,), (55,)], CAP))
    return c, t, cap


def _vals(cat):
    return {
        r["id"]: r["v"] for r in lake_sql(cat, "SELECT id, v FROM db.t").collect()
    }


def test_update_set_scalar_subquery(spark, tmp_path):
    cat, t, _ = _mk(spark, tmp_path)
    lake_sql(cat, "UPDATE db.t SET v = (SELECT MAX(cap) FROM db.cap) WHERE id >= 2")
    assert _vals(cat) == {1: 10.0, 2: 77.0, 3: 77.0}


def test_update_set_scalar_folds_from_manifest(spark, tmp_path):
    """THE planted proof: the SET scalar (a MAX over the cap table)
    still answers with every cap data file deleted — the value comes
    from the manifest fold, not a scan."""
    cat, t, cap = _mk(spark, tmp_path)
    for f in cap.plan_files():
        os.remove(f["file_path"])
    lake_sql(cat, "UPDATE db.t SET v = (SELECT MAX(cap) FROM db.cap) WHERE id >= 2")
    assert _vals(cat) == {1: 10.0, 2: 77.0, 3: 77.0}


def test_update_set_scalar_in_expression(spark, tmp_path):
    """The span may sit inside a bigger SET expression."""
    cat, _, _ = _mk(spark, tmp_path)
    lake_sql(cat, "UPDATE db.t SET v = v + (SELECT MIN(cap) FROM db.cap) WHERE id = 1")
    assert _vals(cat) == {1: 65.0, 2: 20.0, 3: 30.0}


def test_update_set_where_split_handles_subquery_and_literals(spark, tmp_path):
    """The SET/WHERE split is paren-aware and literal-masked: a
    subquery's inner WHERE and a string literal containing ' where '
    must not truncate the SET text (the old non-greedy regex split at
    the first raw WHERE token)."""
    cat, _, _ = _mk(spark, tmp_path)
    lake_sql(
        cat,
        "UPDATE db.t SET v = (SELECT MAX(cap) FROM db.cap WHERE cap < 60) "
        "WHERE id = 3",
    )
    assert _vals(cat)[3] == 55.0
    lake_sql(cat, "UPDATE db.t SET s = 'x where y' WHERE id = 1")
    got = {
        r["id"]: r["s"] for r in lake_sql(cat, "SELECT id, s FROM db.t").collect()
    }
    assert got[1] == "x where y" and got[2] == "b"


def test_update_set_scalar_in_transaction(spark, tmp_path):
    cat, _, _ = _mk(spark, tmp_path)
    lake_sql(
        cat,
        "BEGIN; UPDATE db.t SET v = (SELECT MIN(cap) FROM db.cap) "
        "WHERE id = 1; COMMIT;",
    )
    assert _vals(cat)[1] == 55.0


def test_update_set_multirow_subquery_refused(spark, tmp_path):
    cat, _, _ = _mk(spark, tmp_path)
    with pytest.raises(UnsupportedSQL, match="uncorrelated scalar"):
        lake_sql(cat, "UPDATE db.t SET v = (SELECT cap FROM db.cap)")


def test_update_set_correlated_subquery_refused(spark, tmp_path):
    cat, _, _ = _mk(spark, tmp_path)
    with pytest.raises(UnsupportedSQL, match="uncorrelated scalar"):
        lake_sql(
            cat,
            "UPDATE db.t SET v = (SELECT MAX(cap) FROM db.cap WHERE cap = t.id)",
        )


def test_update_set_empty_scalar_is_null(spark, tmp_path):
    """Empty scalar subquery = NULL, SQL's scalar semantics."""
    cat, _, _ = _mk(spark, tmp_path)
    lake_sql(
        cat,
        "UPDATE db.t SET v = (SELECT MAX(cap) FROM db.cap WHERE cap > 99) "
        "WHERE id = 1",
    )
    assert _vals(cat)[1] is None


def test_select_list_scalar_inlines(spark, tmp_path):
    cat, _, _ = _mk(spark, tmp_path)
    rows = lake_sql(
        cat,
        "SELECT (SELECT COUNT(*) FROM db.cap) AS ncap, id FROM db.t "
        "WHERE id = 1",
    ).collect()
    assert rows == [(2, 1)] or (rows[0]["ncap"], rows[0]["id"]) == (2, 1)


def test_select_list_scalar_folds_from_manifest(spark, tmp_path):
    cat, _, cap = _mk(spark, tmp_path)
    for f in cap.plan_files():
        os.remove(f["file_path"])
    rows = lake_sql(
        cat,
        "SELECT (SELECT MAX(cap) FROM db.cap) AS mx, id FROM db.t WHERE id = 1",
    ).collect()
    assert (rows[0]["mx"], rows[0]["id"]) == (77, 1)


def test_select_list_timestamp_scalar_keeps_type(spark, tmp_path):
    """Temporal scalars inline as TIMESTAMP/DATE-typed literals — a
    bare quoted string would flip the output column to STRING."""
    from datetime import datetime

    cat, _, _ = _mk(spark, tmp_path)
    ts_schema = StructType([StructField("ts", TimestampType(), True)])
    ts = cat.create_table("db.ts", ts_schema)
    ts.append(
        spark.createDataFrame([(datetime(2020, 1, 2, 3, 4, 5),)], ts_schema)
    )
    df = lake_sql(
        cat, "SELECT (SELECT MAX(ts) FROM db.ts) AS wm, id FROM db.t WHERE id = 1"
    )
    assert dict(df.dtypes)["wm"] == "timestamp"
    assert df.collect()[0]["wm"] == datetime(2020, 1, 2, 3, 4, 5)


def test_select_list_unaliased_item_declines(spark, tmp_path):
    """An ENTIRE unaliased select item keeps Spark's scalarsubquery()
    output name — inlining would rename it, so the span declines to
    the native path."""
    cat, _, _ = _mk(spark, tmp_path)
    df = lake_sql(cat, "SELECT (SELECT COUNT(*) FROM db.cap) FROM db.t WHERE id = 1")
    assert df.columns == ["scalarsubquery()"]
    assert df.collect()[0][0] == 2


def test_select_list_span_inside_unaliased_item_declines(spark, tmp_path):
    """r12 (ADVICE r11): an unaliased item that merely CONTAINS a span
    — ``(SELECT COUNT(*) FROM s) + 1`` — must decline too: inlining
    would change Spark's auto-generated column name from
    ``(scalarsubquery() + 1)`` to the literal's rendering, a schema
    divergence from the native path."""
    cat, _, _ = _mk(spark, tmp_path)
    df = lake_sql(
        cat,
        "SELECT (SELECT COUNT(*) FROM db.cap) + 1 FROM db.t WHERE id = 1",
    )
    assert df.columns == ["(scalarsubquery() + 1)"]
    assert df.collect()[0][0] == 3
    # ... while the SAME expression WITH an alias still inlines (the
    # literal answers from db.cap's own fold even with its data gone)
    cat2, _, cap2 = _mk(spark, tmp_path / "w2")
    for f in cap2.plan_files():
        os.remove(f["file_path"])
    df2 = lake_sql(
        cat2,
        "SELECT (SELECT COUNT(*) FROM db.cap) + 1 AS n1 "
        "FROM db.t WHERE id = 1",
    )
    assert df2.columns == ["n1"] and df2.collect()[0][0] == 3


def test_update_set_many_scalar_spans_all_inline(spark, tmp_path):
    """r12 (ADVICE r11): the inliner loops to fixpoint — a SET clause
    with more than eight scalar subqueries (the old replacement cap)
    must still inline every span instead of refusing."""
    cat, t, _ = _mk(spark, tmp_path)
    span = "(SELECT MIN(cap) FROM db.cap)"  # 55
    expr = " + ".join([span] * 10)
    lake_sql(cat, f"UPDATE db.t SET v = {expr} WHERE id = 1")
    assert _vals(cat)[1] == 550.0


def test_select_derived_table_untouched(spark, tmp_path):
    """(SELECT ...) after FROM is a derived table, never inlined."""
    cat, _, _ = _mk(spark, tmp_path)
    rows = lake_sql(
        cat, "SELECT n FROM (SELECT COUNT(*) AS n FROM db.t) x"
    ).collect()
    assert rows[0]["n"] == 3


def test_select_in_subquery_untouched(spark, tmp_path):
    """IN (SELECT ...) keeps set semantics — the span guard skips it
    even when the subquery happens to be single-row."""
    cat, _, _ = _mk(spark, tmp_path)
    rows = lake_sql(
        cat,
        "SELECT id FROM db.t WHERE id IN (SELECT COUNT(*) FROM db.cap) "
        "ORDER BY id",
    ).collect()
    assert [r["id"] for r in rows] == [2]


def test_merge_matched_update_set_scalar(spark, tmp_path):
    """Scalar subqueries inline in MERGE's WHEN MATCHED UPDATE SET."""
    cat, _, _ = _mk(spark, tmp_path)
    src = spark.createDataFrame([(1,), (2,)], "id bigint")
    src.createOrReplaceTempView("m_src")
    lake_sql(
        cat,
        "MERGE INTO db.t t USING m_src s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET v = (SELECT MAX(cap) FROM db.cap)",
    )
    assert _vals(cat) == {1: 77.0, 2: 77.0, 3: 30.0}


def test_merge_by_source_update_set_scalar(spark, tmp_path):
    cat, _, _ = _mk(spark, tmp_path)
    src = spark.createDataFrame([(1,), (2,)], "id bigint")
    src.createOrReplaceTempView("m_src2")
    lake_sql(
        cat,
        "MERGE INTO db.t t USING m_src2 s ON t.id = s.id "
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET "
        "v = (SELECT MIN(cap) FROM db.cap)",
    )
    assert _vals(cat) == {1: 10.0, 2: 20.0, 3: 55.0}


def test_merge_set_multirow_scalar_refused(spark, tmp_path):
    cat, _, _ = _mk(spark, tmp_path)
    src = spark.createDataFrame([(1,)], "id bigint")
    src.createOrReplaceTempView("m_src3")
    with pytest.raises(UnsupportedSQL, match="uncorrelated scalar"):
        lake_sql(
            cat,
            "MERGE INTO db.t t USING m_src3 s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET v = (SELECT cap FROM db.cap)",
        )
