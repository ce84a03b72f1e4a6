"""Residual / null / prefix predicates in the SQL grammar (r8, VERDICT
r7 #1): ``!=``/``<>``, ``IS [NOT] NULL``, and ``LIKE 'prefix%'`` through
the lake_sql DELETE/UPDATE/SELECT surface. IS NULL / IS NOT NULL prune
from ``column_null_counts`` (stats every manifest row already carries),
LIKE-prefix rewrites EXACTLY to a ``[prefix, next)`` range (pruning AND
row-matching), ``!=`` executes as parse + residual filter, pruning only
provably-constant files. Planted scanned-file-count gates mirror
tests/test_sql_range_predicates.py."""

import pytest
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.localrel import local_rows_df
from icebergplus_spark.lake.sql_dml import (
    UnsupportedSQL,
    _inc_prefix,
    _like_terms,
    _parse_where_or,
    lake_sql,
)

SCHEMA = StructType(
    [
        StructField("k", IntegerType(), True),
        StructField("tag", StringType(), True),
        StructField("val", DoubleType(), True),
    ]
)

# four files with distinct null/value signatures so every prune in this
# battery has real work to do:
#   f1: tags all null          (isnull keeps, notnull prunes)
#   f2: tags 'alpha'..'alps'   (no nulls; prefix 'al%')
#   f3: mixed null / 'beta'    (boundary for both null tests)
#   f4: constant tag 'ok'      (the != 'ok' prunable shape)
FILES = (
    (range(0, 4), [None, None, None, None]),
    (range(4, 8), ["alpha", "alpine", "alps", "altair"]),
    (range(8, 12), [None, "beta", None, "beta"]),
    (range(12, 16), ["ok", "ok", "ok", "ok"]),
)


def _rows(ks, tags):
    return [(k, tag, float(k)) for k, tag in zip(ks, tags)]


@pytest.fixture()
def table(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.res", SCHEMA)
    for ks, tags in FILES:
        t.append(local_rows_df(spark, _rows(ks, tags), SCHEMA))
    return cat, t


def _ks(t):
    return sorted(r["k"] for r in t.scan().collect())


def _recording(t, method):
    calls = []
    orig = getattr(t, method)

    def wrapped(*a, **kw):
        out = orig(*a, **kw)
        calls.append([f["file_path"] for f in out])
        return out

    setattr(t, method, wrapped)
    return calls


# -- parser units -----------------------------------------------------------


def test_parser_residual_shapes():
    assert _parse_where_or("tag != 'x'") == [{"tag": ("!=", "x")}]
    # <> normalizes to != so downstream sees one spelling
    assert _parse_where_or("tag <> 'x'") == [{"tag": ("!=", "x")}]
    assert _parse_where_or("tag IS NULL") == [{"tag": ("isnull", None)}]
    assert _parse_where_or("tag IS NOT NULL OR k = 1") == [
        {"tag": ("notnull", None)}, {"k": ("=", 1)}
    ]
    with pytest.raises(UnsupportedSQL):
        _parse_where_or("tag NOT LIKE 'a%'")


def test_like_terms_exact_rewrite():
    assert _like_terms("abc%") == [(">=", "abc"), ("<", "abd")]
    assert _like_terms("%") == [("notnull", None)]
    assert _like_terms("abc") == [("=", "abc")]  # no wildcard
    with pytest.raises(UnsupportedSQL):
        _like_terms("%abc")  # suffix — not prunable
    with pytest.raises(UnsupportedSQL):
        _like_terms("a_c%")  # _ wildcard
    with pytest.raises(UnsupportedSQL):
        _like_terms(r"a\%b%")  # escape


def test_inc_prefix_carries_and_saturates():
    assert _inc_prefix("ab") == "ac"
    # max code point carries to the previous char
    assert _inc_prefix("a" + chr(0x10FFFF)) == "b"
    # all-max prefix: no upper bound needed — >= prefix alone is exact
    assert _inc_prefix(chr(0x10FFFF) * 2) is None
    # surrogate block skipped
    assert _inc_prefix("a퟿") == "a"


def test_dangling_bool_keyword_raises():
    # ADVICE r7: a truncated WHERE ('a = 1 OR' after a clause-boundary
    # cut) must raise, not silently plan only the surviving branch
    for bad in ("k = 1 OR", "OR k = 1", "k = 1 AND", "k = 1 AND AND k = 2"):
        with pytest.raises(UnsupportedSQL):
            _parse_where_or(bad)


# -- DML semantics ----------------------------------------------------------


def test_sql_delete_is_null(table):
    cat, t = table
    lake_sql(cat, "DELETE FROM db.res WHERE tag IS NULL")
    assert _ks(cat.load_table("db.res")) == [4, 5, 6, 7, 9, 11, 12, 13,
                                             14, 15]


def test_sql_delete_not_null_and_neq(table):
    cat, t = table
    lake_sql(cat, "DELETE FROM db.res WHERE tag IS NOT NULL AND tag != 'ok'")
    assert _ks(cat.load_table("db.res")) == [0, 1, 2, 3, 8, 10, 12, 13,
                                             14, 15]


def test_sql_delete_like_prefix(table):
    cat, t = table
    lake_sql(cat, "DELETE FROM db.res WHERE tag LIKE 'al%'")
    # all of f2 (alpha/alpine/alps/altair) matches the 'al' prefix
    assert _ks(cat.load_table("db.res")) == [0, 1, 2, 3] + list(
        range(8, 16)
    )


def test_sql_update_neq(table):
    cat, t = table
    lake_sql(cat, "UPDATE db.res SET val = -1 WHERE tag <> 'beta'")
    got = {r["k"]: r["val"] for r in cat.load_table("db.res").scan().collect()}
    # nulls fail != (SQL three-valued logic) — untouched; 'beta' rows
    # (k 9, 11) equal the literal — untouched
    assert got[0] == 0.0 and got[8] == 8.0 and got[9] == 9.0
    assert got[4] == -1.0 and got[12] == -1.0 and got[11] == 11.0


def test_sql_select_shapes_match_generic(table):
    cat, t = table
    for where in (
        "tag IS NULL",
        "tag IS NOT NULL",
        "tag != 'ok'",
        "tag LIKE 'al%'",
        "tag LIKE 'al%' OR tag IS NULL",
        "k < 10 AND tag IS NOT NULL",
    ):
        got = sorted(
            r["k"]
            for r in lake_sql(
                cat, f"SELECT k FROM db.res WHERE {where}"
            ).collect()
        )
        want = sorted(
            r["k"]
            for r in t.scan().createOrReplaceTempView("res_ref")
            or t.spark.sql(f"SELECT k FROM res_ref WHERE {where}").collect()
        )
        assert got == want, where


# -- planted scanned-file-count gates ---------------------------------------


def test_is_null_prunes_zero_null_files(spark, tmp_path):
    """DELETE WHERE tag IS NULL must plan ONLY f1 and f3 (the files
    with a nonzero tag null count) — f2 and f4 are provably null-free
    from column_null_counts alone."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.pn", SCHEMA)
    for ks, tags in FILES:
        t.append(local_rows_df(spark, _rows(ks, tags), SCHEMA))
    assert len(t.plan_files()) == 4
    calls = _recording(t, "plan_files")
    cat.load_table = lambda ident: t
    lake_sql(cat, "DELETE FROM db.pn WHERE tag IS NULL")
    pruned = [c for c in calls if 0 < len(c) < 4]
    assert pruned and len(pruned[0]) == 2, f"calls: {calls}"


def test_not_null_prunes_all_null_file(spark, tmp_path):
    """IS NOT NULL prunes the provably all-null file (f1) and keeps the
    rest — null_count == record_count is the proof."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.pnn", SCHEMA)
    for ks, tags in FILES:
        t.append(local_rows_df(spark, _rows(ks, tags), SCHEMA))
    calls = _recording(t, "plan_files")
    cat.load_table = lambda ident: t
    lake_sql(cat, "DELETE FROM db.pnn WHERE tag IS NOT NULL")
    pruned = [c for c in calls if 0 < len(c) < 4]
    assert pruned and len(pruned[0]) == 3, f"calls: {calls}"


def test_like_prefix_prunes_by_range(spark, tmp_path):
    """LIKE 'al%' becomes the ['al','am') range: only f2 (alpha..altair)
    intersects — f3's 'beta' min and f4's constant 'ok' are above it,
    f1 is all-null (min/max absent)."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.pl", SCHEMA)
    for ks, tags in FILES:
        t.append(local_rows_df(spark, _rows(ks, tags), SCHEMA))
    calls = _recording(t, "plan_files")
    cat.load_table = lambda ident: t
    lake_sql(cat, "DELETE FROM db.pl WHERE tag LIKE 'al%'")
    pruned = [c for c in calls if 0 < len(c) < 4]
    assert pruned and len(pruned[0]) == 1, f"calls: {calls}"
    assert _ks(cat.load_table("db.pl")) == list(range(0, 4)) + list(
        range(8, 16)
    )


def test_neq_prunes_constant_file(spark, tmp_path):
    """!= 'ok' prunes the constant file f4 (min == 'ok' == max proves
    every live row equals the literal) AND the all-null file f1 (no
    comparison matches a NULL cell) — two files remain."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.pq", SCHEMA)
    for ks, tags in FILES:
        t.append(local_rows_df(spark, _rows(ks, tags), SCHEMA))
    calls = _recording(t, "plan_files")
    cat.load_table = lambda ident: t
    lake_sql(cat, "DELETE FROM db.pq WHERE tag != 'ok'")
    pruned = [c for c in calls if 0 < len(c) < 4]
    assert pruned and len(pruned[0]) == 2, f"calls: {calls}"
    # nulls fail != — only f2's and f3's non-null non-'ok' rows deleted
    assert _ks(cat.load_table("db.pq")) == [0, 1, 2, 3, 8, 10] + list(
        range(12, 16)
    )


def test_select_like_fast_path_prunes(spark, tmp_path):
    """SELECT fast path with a LIKE prefix goes through plan_files_any
    once and reads only the intersecting file."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.ps", SCHEMA)
    for ks, tags in FILES:
        t.append(local_rows_df(spark, _rows(ks, tags), SCHEMA))
    calls = _recording(t, "plan_files_any")
    cat.load_table = lambda ident: t
    got = sorted(
        r["k"]
        for r in lake_sql(
            cat, "SELECT k FROM db.ps WHERE tag LIKE 'al%'"
        ).collect()
    )
    assert got == [4, 5, 6, 7]
    assert len(calls) == 1 and len(calls[0]) == 1


def test_like_on_non_string_column_falls_back(spark, tmp_path):
    """LIKE on a non-string column: the range rewrite would compare
    natively while Spark's LIKE casts to string — the fast path must
    DECLINE (generic path, exact semantics), and DML must raise."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.pnum", SCHEMA)
    rows = [(1, "a", 1.0), (15, "b", 2.0), (102, "c", 3.0), (2, "d", 4.0)]
    t.append(local_rows_df(spark, rows, SCHEMA))
    calls = _recording(t, "plan_files_any")
    cat.load_table = lambda ident: t
    got = sorted(
        r["k"]
        for r in lake_sql(
            cat, "SELECT k FROM db.pnum WHERE k LIKE '1%'"
        ).collect()
    )
    assert got == [1, 15, 102]  # Spark LIKE semantics: string cast
    assert calls == []  # fast path declined — no pruned plan
    with pytest.raises(UnsupportedSQL):
        lake_sql(cat, "DELETE FROM db.pnum WHERE k LIKE '1%'")


def test_count_not_null_metadata_fold(spark, tmp_path):
    """COUNT(*) WHERE tag IS NOT NULL: zero-null files prove full
    coverage from stats, the all-null file proves zero contribution —
    only the mixed file needs a boundary scan."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.pc", SCHEMA)
    for ks, tags in FILES:
        t.append(local_rows_df(spark, _rows(ks, tags), SCHEMA))
    cat.load_table = lambda ident: t
    [row] = lake_sql(
        cat, "SELECT COUNT(*) AS n FROM db.pc WHERE tag IS NOT NULL"
    ).collect()
    assert row["n"] == 10  # f2 (4) + f3 (2 non-null) + f4 (4)
    [row] = lake_sql(
        cat, "SELECT COUNT(*) AS n FROM db.pc WHERE tag IS NULL"
    ).collect()
    assert row["n"] == 6  # f1 (4) + f3 (2 nulls)


def test_delete_in_subquery(spark, tmp_path):
    """r8: DELETE ... WHERE col IN (SELECT ...) routes the key set to
    the equality-delete path (delete_by_key — never collected to the
    driver); the subquery gets full SELECT machinery."""
    from pyspark.sql.types import LongType

    cat = LocalLakeCatalog(spark, str(tmp_path / "whs")).start()
    t = cat.create_table("db.main", SCHEMA)
    for ks, tags in FILES:
        t.append(local_rows_df(spark, _rows(ks, tags), SCHEMA))
    side = cat.create_table(
        "db.side",
        StructType([StructField("kk", IntegerType(), True)]),
    )
    side.append(
        spark.createDataFrame([(2,), (9,), (14,), (99,)], "kk int")
    )
    lake_sql(
        cat,
        "DELETE FROM db.main WHERE k IN "
        "(SELECT kk FROM db.side WHERE kk < 50)",
    )
    assert _ks(cat.load_table("db.main")) == [
        k for k in range(16) if k not in (2, 9, 14)
    ]
    # multi-column subquery is a loud error, not a silent guess
    with pytest.raises(UnsupportedSQL, match="one column"):
        lake_sql(
            cat,
            "DELETE FROM db.main WHERE k IN (SELECT k, tag FROM db.main)",
        )


def test_in_subquery_compound_where_raises_cleanly(spark, tmp_path):
    """r8 self-review: 'k IN (SELECT...) OR m IN (SELECT...)' must NOT
    be swallowed by the greedy IN-subquery capture — it falls to the
    grammar path and raises the clean UnsupportedSQL, never a raw
    Spark ParseException on mangled text."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "whc")).start()
    t = cat.create_table("db.cmp", SCHEMA)
    t.append(spark.createDataFrame(_rows(range(4), ["a"] * 4), SCHEMA))
    with pytest.raises(UnsupportedSQL, match="unsupported WHERE term"):
        lake_sql(
            cat,
            "DELETE FROM db.cmp WHERE k IN (SELECT k FROM db.cmp) "
            "OR val IN (SELECT val FROM db.cmp)",
        )


def test_decimal_literal_comparisons_exact(spark, tmp_path):
    """r8 self-review: quoted literals against DECIMAL columns coerce
    to Decimal — '100.05' > '5' must be TRUE (numeric), not False
    (lexicographic); the prune keeps the file and the residual compares
    numerically."""
    from decimal import Decimal

    from pyspark.sql.types import DecimalType

    schema = StructType(
        [
            StructField("k", IntegerType(), True),
            StructField("price", DecimalType(10, 2), True),
        ]
    )
    cat = LocalLakeCatalog(spark, str(tmp_path / "whd")).start()
    t = cat.create_table("db.decp", schema)
    t.append(
        local_rows_df(spark, 
            [(1, Decimal("100.05")), (2, Decimal("2.00"))], schema
        )
    )
    got = sorted(
        r["k"]
        for r in lake_sql(
            cat, "SELECT k FROM db.decp WHERE price > '5'"
        ).collect()
    )
    assert got == [1]
    lake_sql(cat, "DELETE FROM db.decp WHERE price > '5'")
    assert _ks(cat.load_table("db.decp")) == [2]


def test_update_in_subquery(spark, tmp_path):
    """r8: UPDATE ... WHERE col IN (SELECT ...) routes the key set to a
    stats-targeted MERGE (insert clause off) — every matching row
    updates, keys outside the table are ignored."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "whu")).start()
    t = cat.create_table("db.upd", SCHEMA)
    for ks, tags in FILES:
        t.append(local_rows_df(spark, _rows(ks, tags), SCHEMA))
    side = cat.create_table(
        "db.keys", StructType([StructField("kk", IntegerType(), True)])
    )
    side.append(
        spark.createDataFrame([(1,), (9,), (9,), (404,)], "kk int")
    )
    lake_sql(
        cat,
        "UPDATE db.upd SET val = -5, tag = 'hit' WHERE k IN "
        "(SELECT kk FROM db.keys)",
    )
    got = {
        r["k"]: (r["val"], r["tag"])
        for r in cat.load_table("db.upd").scan().collect()
    }
    assert got[1] == (-5.0, "hit") and got[9] == (-5.0, "hit")
    assert got[0] == (0.0, None) and got[12] == (12.0, "ok")
    assert len(got) == 16  # key 404 inserted NOTHING
