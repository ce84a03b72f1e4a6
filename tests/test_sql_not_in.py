"""NOT IN (SELECT ...) DML (r9, VERDICT r8 #3) — the three-valued NULL
semantics battery. SQL's trap: ANY NULL in the key set makes
``col NOT IN (...)`` never TRUE (the whole statement is a no-op), and a
NULL target key evaluates NULL (row kept / not updated). Routed as an
anti-join through merge_into's BY SOURCE clauses — never a driver-side
key collect. Plus loud refusals for EXISTS/correlated shapes and the
new ``when_not_matched_by_source_update`` merge clause itself."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.lake.sql_dml import UnsupportedSQL, lake_sql

T = StructType(
    [
        StructField("k", IntegerType(), True),
        StructField("v", StringType(), True),
    ]
)
KEYS = StructType([StructField("kk", IntegerType(), True)])


@pytest.fixture()
def cat(spark, tmp_path):
    c = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = c.create_table("db.t", T)
    # k 1..8 plus one NULL-key row
    t.append(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(1, 9)] + [(None, "vnull")], T
        )
    )
    ks = c.create_table("db.keys", KEYS)
    ks.append(spark.createDataFrame([(2,), (4,), (6,)], KEYS))
    ksn = c.create_table("db.keys_null", KEYS)
    ksn.append(spark.createDataFrame([(2,), (None,), (6,)], KEYS))
    return c


def _rows(cat):
    return sorted(
        (
            (r["k"], r["v"])
            for r in lake_sql(cat, "SELECT k, v FROM db.t").collect()
        ),
        key=lambda p: (p[0] is None, p[0], p[1]),
    )


def test_delete_not_in_basic(spark, cat):
    """Deletes exactly the non-NULL keys outside the set; the NULL-key
    row evaluates NULL → kept."""
    lake_sql(
        cat, "DELETE FROM db.t WHERE k NOT IN (SELECT kk FROM db.keys)"
    )
    assert _rows(cat) == [
        (2, "v2"), (4, "v4"), (6, "v6"), (None, "vnull"),
    ]


def test_delete_not_in_null_key_set_is_noop(spark, cat):
    """ANY NULL in the key set ⇒ NOT IN is never TRUE ⇒ the DELETE
    removes nothing (the classic silent-wrong trap, done right)."""
    before = _rows(cat)
    lake_sql(
        cat,
        "DELETE FROM db.t WHERE k NOT IN (SELECT kk FROM db.keys_null)",
    )
    assert _rows(cat) == before and len(before) == 9


def test_update_not_in_basic(spark, cat):
    """Updates exactly the non-NULL keys outside the set; matched rows
    and the NULL-key row untouched."""
    lake_sql(
        cat,
        "UPDATE db.t SET v = 'OUT' "
        "WHERE k NOT IN (SELECT kk FROM db.keys)",
    )
    assert _rows(cat) == [
        (1, "OUT"), (2, "v2"), (3, "OUT"), (4, "v4"),
        (5, "OUT"), (6, "v6"), (7, "OUT"), (8, "OUT"),
        (None, "vnull"),
    ]


def test_update_not_in_null_key_set_is_noop(spark, cat):
    before = _rows(cat)
    lake_sql(
        cat,
        "UPDATE db.t SET v = 'OUT' "
        "WHERE k NOT IN (SELECT kk FROM db.keys_null)",
    )
    assert _rows(cat) == before


def test_update_not_in_set_expression_sees_target_row(spark, cat):
    lake_sql(
        cat,
        "UPDATE db.t SET v = concat(v, '!') "
        "WHERE k NOT IN (SELECT kk FROM db.keys)",
    )
    got = dict(_rows(cat))
    assert got[1] == "v1!" and got[2] == "v2" and got[8] == "v8!"


def test_uncorrelated_exists_is_a_constant_gate(spark, cat):
    """r10: uncorrelated EXISTS is supported as a constant gate — a
    non-empty probe makes the statement fire (here: whole-table
    UPDATE), an EXISTS over a filtered-to-empty set makes it a no-op."""
    lake_sql(
        cat,
        "UPDATE db.t SET v = 'x' "
        "WHERE EXISTS (SELECT 1 FROM db.keys WHERE kk = 2)",
    )
    assert {v for _, v in _rows(cat)} == {"x"}
    before = _rows(cat)
    lake_sql(
        cat,
        "DELETE FROM db.t "
        "WHERE EXISTS (SELECT 1 FROM db.keys WHERE kk = 999)",
    )
    assert _rows(cat) == before


def test_unsupported_exists_shapes_still_refuse_loudly(spark, cat):
    """Non-equality correlation, and EXISTS inside an OR (not a whole
    top-level conjunct), keep loud refusals — never a silent wrong
    rewrite."""
    before = _rows(cat)
    for stmt, pat in (
        (
            "DELETE FROM db.t WHERE EXISTS "
            "(SELECT 1 FROM db.keys s WHERE s.kk < db.t.k)",
            "correlated EXISTS",
        ),
        (
            "DELETE FROM db.t WHERE k = 1 OR EXISTS "
            "(SELECT 1 FROM db.keys)",
            "EXISTS",
        ),
    ):
        with pytest.raises(UnsupportedSQL, match=pat):
            lake_sql(cat, stmt)
    assert _rows(cat) == before


def test_correlated_in_subquery_fails_loudly(spark, cat):
    """A correlated IN-subquery (references the target) cannot resolve
    standalone — it surfaces an error, never a silent wrong delete."""
    before = _rows(cat)
    with pytest.raises(Exception):
        lake_sql(
            cat,
            "DELETE FROM db.t WHERE k IN "
            "(SELECT kk FROM db.keys WHERE kk = db.t.k)",
        )
    assert _rows(cat) == before


def test_merge_by_source_update_clause_cow(spark, cat):
    """The new merge_into clause directly: unmatched target rows get
    the SET expressions, matched rows don't; exclusive with the BY
    SOURCE delete."""
    t = cat.load_table("db.t")
    src = spark.createDataFrame([(2,), (4,)], "k int")
    t.merge_into(
        src,
        on="k",
        when_not_matched_insert=False,
        when_not_matched_by_source_update={"v": F.lit("stale")},
        not_matched_by_source_condition=F.col("k").isNotNull(),
    )
    got = dict(_rows(cat))
    assert got[2] == "v2" and got[4] == "v4"
    assert all(got[k] == "stale" for k in (1, 3, 5, 6, 7, 8))
    assert got[None] == "vnull"  # condition-gated: NULL key untouched
    with pytest.raises(ValueError, match="exclusive"):
        t.merge_into(
            src,
            on="k",
            when_not_matched_by_source_delete=True,
            when_not_matched_by_source_update={"v": F.lit("x")},
        )


def test_not_in_delete_mor_tombstones(spark, tmp_path):
    """Merge-on-read route: the NOT IN delete lands as DV tombstones
    (no data-file rewrite), and the scan applies them."""
    c = LocalLakeCatalog(spark, str(tmp_path / "wh2")).start()
    t = c.create_table("db.m", T)
    t.set_property("delete.representation", "dv")
    t.append(
        spark.createDataFrame([(i, f"v{i}") for i in range(1, 7)], T)
    )
    files_before = {f["file_path"] for f in t.plan_files()}
    ks = c.create_table("db.mkeys", KEYS)
    ks.append(spark.createDataFrame([(1,), (2,), (3,)], KEYS))
    lake_sql(
        c, "DELETE FROM db.m WHERE k NOT IN (SELECT kk FROM db.mkeys)"
    )
    t2 = c.load_table("db.m")
    assert sorted(r["k"] for r in t2.scan().collect()) == [1, 2, 3]
    # original data files untouched — the delete is tombstones
    assert files_before <= {f["file_path"] for f in t2.plan_files()}


def test_merge_sql_by_source_update_clause(spark, cat):
    """SQL surface for the r9 clause: WHEN NOT MATCHED BY SOURCE THEN
    UPDATE SET — target rows without a source match get the SET
    expressions (target-only namespace), matched rows stay."""
    got = lake_sql(
        cat,
        "MERGE INTO db.t AS t "
        "USING (SELECT kk AS k FROM db.keys) AS s ON t.k = s.k "
        "WHEN NOT MATCHED BY SOURCE AND t.k IS NOT NULL "
        "THEN UPDATE SET v = concat(t.v, '~')",
    )
    rows = dict(_rows(cat))
    assert rows[2] == "v2" and rows[4] == "v4" and rows[6] == "v6"
    assert rows[1] == "v1~" and rows[8] == "v8~"
    assert rows[None] == "vnull"  # condition-gated

    # source references are refused loudly (no source row matched)
    with pytest.raises(UnsupportedSQL, match="cannot reference"):
        lake_sql(
            cat,
            "MERGE INTO db.t AS t "
            "USING (SELECT kk AS k FROM db.keys) AS s ON t.k = s.k "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = s.k",
        )
    # and DELETE + UPDATE BY SOURCE together refuse
    with pytest.raises(UnsupportedSQL, match="multiple"):
        lake_sql(
            cat,
            "MERGE INTO db.t AS t "
            "USING (SELECT kk AS k FROM db.keys) AS s ON t.k = s.k "
            "WHEN NOT MATCHED BY SOURCE THEN DELETE "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'x'",
        )


def test_not_in_empty_key_set_hits_every_row(spark, cat):
    """Review r9: `x NOT IN (empty set)` is TRUE for EVERY row — NULL
    keys included (the expression never consults x). DELETE empties the
    table; UPDATE rewrites all rows."""
    lake_sql(
        cat,
        "UPDATE db.t SET v = 'ALL' "
        "WHERE k NOT IN (SELECT kk FROM db.keys WHERE kk > 1000)",
    )
    rows = _rows(cat)
    assert len(rows) == 9 and all(v == "ALL" for _, v in rows)
    lake_sql(
        cat,
        "DELETE FROM db.t "
        "WHERE k NOT IN (SELECT kk FROM db.keys WHERE kk > 1000)",
    )
    assert _rows(cat) == []  # the NULL-key row went too


def test_exists_inside_string_literal_not_refused(spark, cat):
    """Review r9: the EXISTS guard must scan the literal-masked text —
    a string literal containing 'EXISTS (' is grammar-path data."""
    lake_sql(
        cat,
        "UPDATE db.t SET v = 'EXISTS (archived)' WHERE k = 3",
    )
    lake_sql(cat, "DELETE FROM db.t WHERE v = 'EXISTS (archived)'")
    assert all(k != 3 for k, _ in _rows(cat))


def test_with_headed_subquery_in_dml(spark, cat):
    """r9: [NOT] IN subqueries may be WITH-headed — the CTE machinery
    runs inside the key-set dispatch."""
    lake_sql(
        cat,
        "DELETE FROM db.t WHERE k NOT IN ("
        "WITH ks AS (SELECT kk FROM db.keys) SELECT kk FROM ks)",
    )
    assert [k for k, _ in _rows(cat)] == [2, 4, 6, None]


def test_update_without_where_updates_every_row(spark, cat):
    """r9: standard-SQL whole-table UPDATE — no WHERE, every row gets
    the SET expressions (NULL keys included), via the BY SOURCE update
    with an empty source."""
    lake_sql(cat, "UPDATE db.t SET v = concat('x', coalesce(v, '?'))")
    rows = _rows(cat)
    assert len(rows) == 9 and all(v.startswith("x") for _, v in rows)
    assert dict(rows)[None] == "xvnull"


def test_update_grammar_regressions(spark, cat):
    """Review r9: dangling WHERE / trailing garbage raise the grammar's
    own error, never a raw Catalyst ParseException; whole-table UPDATE
    works inside transactions; HAVING aliases are case-insensitive."""
    for bad in (
        "UPDATE db.t SET v = 'x' WHERE",
        "UPDATE db.t SET v = 'x' RETURNING *",
    ):
        with pytest.raises(UnsupportedSQL):
            lake_sql(cat, bad)
    # a literal containing a clause keyword is data, not a clause
    lake_sql(cat, "UPDATE db.t SET v = 'WHERE x' WHERE k = 1")
    assert dict(_rows(cat))[1] == "WHERE x"
    lake_sql(
        cat,
        "BEGIN; UPDATE db.t SET v = 'txn'; COMMIT",
    )
    rows = _rows(cat)
    assert all(v == "txn" for _, v in rows) and len(rows) == 9


def test_delete_without_where_removes_every_row(spark, cat):
    """r9: standard-SQL whole-table DELETE — the empty conjunction
    matches every row; history stays time-travelable (snapshot op
    'delete', not a truncate overwrite)."""
    t = cat.load_table("db.t")
    before_snap = t.current_snapshot_id
    lake_sql(cat, "DELETE FROM db.t")
    assert _rows(cat) == []
    t = cat.load_table("db.t")
    assert t.snapshot()["operation"] == "delete"
    assert sorted(
        r["k"] for r in t.scan(snapshot_id=before_snap).collect()
        if r["k"] is not None
    ) == list(range(1, 9))


def _jmax(spark):
    j = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    return max(j) if j else -1


def test_not_in_probe_stats_fast_path_zero_jobs(spark, tmp_path):
    """r13: when file stats prove the subquery column AND the target
    key column NULL-free, the NOT IN null probe answers from driver
    metadata — zero Spark jobs; a NULL-bearing key set (stats show a
    null) still takes the exact aggregate and reports has_null."""
    from icebergplus_spark.lake.sql_dml import _subquery_keys

    c = LocalLakeCatalog(spark, str(tmp_path / "whp")).start()
    t = c.create_table("db.c", T)
    t.append(spark.createDataFrame([(i, f"v{i}") for i in range(1, 7)], T))
    ks = c.create_table("db.ck", KEYS)
    ks.append(spark.createDataFrame([(2,), (4,)], KEYS))
    ksn = c.create_table("db.ckn", KEYS)
    ksn.append(spark.createDataFrame([(2,), (None,)], KEYS))

    j0 = _jmax(spark)
    _, has_null, empty = _subquery_keys(
        c, t, "k", "SELECT kk FROM db.ck", probe=True
    )
    assert _jmax(spark) == j0, "stats-proven probe ran a Spark job"
    assert has_null is False and empty is False

    _, has_null, _ = _subquery_keys(
        c, t, "k", "SELECT kk FROM db.ckn", probe=True
    )
    assert has_null is True, "NULL-bearing set must report has_null"


def test_not_in_empty_set_through_anti_join_path(spark, tmp_path):
    """r13: the stats fast path cannot see emptiness, so an
    ACTUALLY-EMPTY key set now routes through the BY SOURCE anti-join
    instead of the grammar-only fold — NOT IN {} is TRUE for every
    row, so the two must delete identically (the tier requires a
    NULL-free target key column, so the isNotNull gate is inert)."""
    c = LocalLakeCatalog(spark, str(tmp_path / "whe")).start()
    t = c.create_table("db.c", T)
    t.append(spark.createDataFrame([(i, f"v{i}") for i in range(1, 7)], T))
    ks = c.create_table("db.ck", KEYS)
    ks.append(spark.createDataFrame([(2,), (4,)], KEYS))
    lake_sql(
        c,
        "DELETE FROM db.c WHERE k NOT IN "
        "(SELECT kk FROM db.ck WHERE kk > 100) AND k >= 4",
    )
    assert sorted(
        r["k"] for r in c.load_table("db.c").scan().collect()
    ) == [1, 2, 3], "NOT IN {} must delete every remainder-matching row"
