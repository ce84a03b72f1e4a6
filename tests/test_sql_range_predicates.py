"""SQL-reachable range predicates (r7, VERDICT r6 #1): closed ranges
(repeated-column conjunctions → AND-lists), BETWEEN, and top-level
OR-of-conjunctions through the lake_sql DELETE/UPDATE/SELECT surface —
plus planted scanned-file-count checks proving the single-pass union
planner (`plan_files_any`) actually skips files on both bounds of every
range, mirroring tests/test_rollup.py's MV-refresh pruning gate."""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.localrel import local_rows_df
from icebergplus_spark.lake.sql_dml import (
    UnsupportedSQL,
    _parse_where,
    _parse_where_or,
    _split_bool,
    _strip_parens,
    lake_sql,
)

SCHEMA = StructType(
    [
        StructField("k", IntegerType(), True),
        StructField("ts", TimestampType(), True),
        StructField("val", DoubleType(), True),
        StructField("tag", StringType(), True),
    ]
)


def _day_rows(day, ks):
    return [
        (k, dt.datetime(2024, 1, day, 6 + (k % 12)), float(k), f"d{day}")
        for k in ks
    ]


@pytest.fixture(params=["cow", "dv"])
def table(spark, tmp_path, request):
    """One file per day, four days — real pruning work for every range;
    whole battery under both copy-on-write and deletion-vector modes."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.rng", SCHEMA)
    if request.param == "dv":
        t.set_property("delete.representation", "dv")
    for day, ks in ((1, range(0, 5)), (2, range(5, 10)),
                    (3, range(10, 15)), (4, range(15, 20))):
        t.append(local_rows_df(spark, _day_rows(day, ks), SCHEMA))
    return cat, t


def _ks(t):
    return sorted(r["k"] for r in t.scan().collect())


# -- parser units -----------------------------------------------------------


def test_parser_closed_range_and_lists():
    assert _parse_where("ts >= '2024-01-02' AND ts < '2024-01-03'") == {
        "ts": [(">=", "2024-01-02"), ("<", "2024-01-03")]
    }
    assert _parse_where("k BETWEEN 3 AND 7") == {"k": [(">=", 3), ("<=", 7)]}
    # three constraints on one column stack in order
    assert _parse_where("k > 0 AND k >= 1 AND k < 9")["k"] == [
        (">", 0), (">=", 1), ("<", 9)
    ]


def test_parser_or_branches_and_quoting():
    assert _parse_where_or("(k >= 1 AND k < 5) OR (k >= 10 AND k < 20)") == [
        {"k": [(">=", 1), ("<", 5)]},
        {"k": [(">=", 10), ("<", 20)]},
    ]
    # AND/OR inside string literals never split; parens in literals inert
    assert _split_bool("tag = 'a OR b' OR k = 2", "OR") == [
        "tag = 'a OR b'", "k = 2"
    ]
    assert _parse_where("tag = 'x AND (y)'") == {"tag": ("=", "x AND (y)")}
    assert _strip_parens("((k > 1))") == "k > 1"
    assert _strip_parens("(k > 1) AND (k < 3)") == "(k > 1) AND (k < 3)"
    with pytest.raises(UnsupportedSQL):
        _parse_where("k IN (1, 2)")
    # r8: LIKE parses to a raw term (table-aware expansion later)
    assert _parse_where_or("k = 1 OR tag LIKE 'x%'") == [
        {"k": ("=", 1)}, {"tag": ("like", "x%")}
    ]


# -- DELETE / UPDATE through statement text ---------------------------------


def test_sql_closed_range_delete(table):
    cat, t = table
    lake_sql(cat, "DELETE FROM db.rng WHERE k >= 3 AND k < 7")
    assert _ks(cat.load_table("db.rng")) == [0, 1, 2] + list(range(7, 20))


def test_sql_or_of_ranges_delete(table):
    cat, t = table
    lake_sql(
        cat,
        "DELETE FROM db.rng WHERE (k >= 1 AND k < 4) OR (k >= 16 AND k < 18)",
    )
    assert _ks(cat.load_table("db.rng")) == [0, 4, 5, 6, 7, 8, 9, 10, 11,
                                             12, 13, 14, 15, 18, 19]


def test_sql_between_update_and_or_update(table):
    cat, t = table
    lake_sql(cat, "UPDATE db.rng SET val = -1 WHERE k BETWEEN 5 AND 8")
    got = {r["k"]: r["val"] for r in cat.load_table("db.rng").scan().collect()}
    assert all(got[k] == -1.0 for k in (5, 6, 7, 8))
    assert got[4] == 4.0 and got[9] == 9.0
    lake_sql(
        cat,
        "UPDATE db.rng SET tag = 'hit' "
        "WHERE (k >= 0 AND k < 2) OR (k >= 18 AND k < 20)",
    )
    tags = {r["k"]: r["tag"] for r in cat.load_table("db.rng").scan().collect()}
    assert all(tags[k] == "hit" for k in (0, 1, 18, 19))
    assert tags[2] == "d1" and tags[17] == "d4"


def test_sql_timestamp_range_delete_intraday_bounds(table):
    """Space-form SQL timestamp literals with INTRA-day bounds: the
    coercion to datetime (sql_dml._coerce_time_literals) is what keeps
    the stat comparison chronological — without it a 'T'-form stat
    above a same-day space-form literal mis-prunes."""
    cat, t = table
    # day 2 rows sit at hours 06..17; delete its 08:00-14:00 slice
    doomed = [
        r["k"] for r in t.scan().collect()
        if dt.datetime(2024, 1, 2, 8) <= r["ts"] < dt.datetime(2024, 1, 2, 14)
    ]
    assert doomed, "fixture must place rows inside the window"
    lake_sql(
        cat,
        "DELETE FROM db.rng WHERE ts >= '2024-01-02 08:00:00' "
        "AND ts < '2024-01-02 14:00:00'",
    )
    assert _ks(cat.load_table("db.rng")) == sorted(
        set(range(20)) - set(doomed)
    )


# -- planted scanned-file-count gates ---------------------------------------


def _recording(t, method):
    calls = []
    orig = getattr(t, method)

    def wrapped(*a, **kw):
        out = orig(*a, **kw)
        calls.append([f["file_path"] for f in out])
        return out

    setattr(t, method, wrapped)
    return calls


def test_closed_range_delete_prunes_both_bounds(spark, tmp_path):
    """DELETE WHERE k >= 6 AND k < 9 must plan ONLY the day-2 file —
    the lower bound skips day 1, the upper bound skips days 3 and 4
    (the single-sided form would scan 3 of 4 files)."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.p", SCHEMA)
    for day, ks in ((1, range(0, 5)), (2, range(5, 10)),
                    (3, range(10, 15)), (4, range(15, 20))):
        t.append(local_rows_df(spark, _day_rows(day, ks), SCHEMA))
    tags_of = {
        f["file_path"]: day
        for day, f in zip((1, 2, 3, 4), sorted(
            t.plan_files(), key=lambda f: f["file_path"]))
    }
    assert len(t.plan_files()) == 4
    calls = _recording(t, "plan_files")

    def fake_load(ident):
        return t

    cat.load_table = fake_load  # keep the recorder on THIS handle
    lake_sql(cat, "DELETE FROM db.p WHERE k >= 6 AND k < 9")
    # first recorded call is the targeted plan (the all-files plan takes
    # no predicate and is also recorded — find the pruned one)
    pruned = [c for c in calls if 0 < len(c) < 4]
    assert pruned, f"no pruned plan recorded: {calls}"
    assert len(pruned[0]) == 1
    assert _ks(cat.load_table("db.p")) == [0, 1, 2, 3, 4, 5, 9] + list(
        range(10, 20)
    )


def test_or_delete_plans_once_and_prunes(spark, tmp_path):
    """OR of two day-ranges must go through plan_files_any exactly ONCE
    (single manifest pass) and plan exactly the two matching files."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.p2", SCHEMA)
    for day, ks in ((1, range(0, 5)), (2, range(5, 10)),
                    (3, range(10, 15)), (4, range(15, 20))):
        t.append(local_rows_df(spark, _day_rows(day, ks), SCHEMA))
    calls = _recording(t, "plan_files_any")
    cat.load_table = lambda ident: t
    lake_sql(
        cat,
        "DELETE FROM db.p2 WHERE (k >= 1 AND k < 3) OR (k >= 16 AND k < 19)",
    )
    assert len(calls) == 1, f"expected ONE union plan, got {len(calls)}"
    assert len(calls[0]) == 2  # day-1 and day-4 files only


def test_select_fast_path_prunes_scan(spark, tmp_path):
    """The SELECT fast path must read only files intersecting some OR
    branch, and return exactly what the generic (unpruned) path does."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.p3", SCHEMA)
    for day, ks in ((1, range(0, 5)), (2, range(5, 10)),
                    (3, range(10, 15)), (4, range(15, 20))):
        t.append(local_rows_df(spark, _day_rows(day, ks), SCHEMA))
    calls = _recording(t, "plan_files_any")
    cat.load_table = lambda ident: t
    q = (
        "SELECT tag, COUNT(*) AS n FROM db.p3 "
        "WHERE (k >= 0 AND k < 5) OR (k >= 15 AND k < 20) "
        "GROUP BY tag ORDER BY tag"
    )
    got = [(r["tag"], r["n"]) for r in lake_sql(cat, q).collect()]
    assert got == [("d1", 5), ("d4", 5)]
    assert len(calls) == 1 and len(calls[0]) == 2

    # richer statements (join/subquery/unknown column) fall back to the
    # generic path — same results, no fast-path plan
    calls.clear()
    q2 = (
        "SELECT a.tag, COUNT(*) AS n FROM db.p3 a "
        "JOIN db.p3 b ON a.k = b.k WHERE a.k >= 0 AND a.k < 3 GROUP BY a.tag"
    )
    got2 = lake_sql(cat, q2).collect()
    assert not calls
    assert [(r["tag"], r["n"]) for r in got2] == [("d1", 3)]


def test_python_api_or_branches_equivalence(spark, tmp_path):
    """The list-of-dicts predicate form on the Python API: delete and
    update_where OR branches equal the filter-based recompute."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.p4", SCHEMA)
    df = spark.createDataFrame(
        _day_rows(1, range(0, 10)) + _day_rows(2, range(10, 20)), SCHEMA
    )
    t.append(df)
    t.update_where(
        [{"k": [(">=", 2), ("<", 4)]}, {"k": ("=", 15)}], {"val": F.lit(-5.0)}
    )
    zeroed = sorted(
        r["k"] for r in t.scan().filter("val = -5.0").collect()
    )
    assert zeroed == [2, 3, 15]
    t.delete([{"k": [(">=", 0), ("<", 5)]}, {"k": [(">=", 18), ("<", 20)]}])
    assert _ks(t) == list(range(5, 18))
    with pytest.raises(ValueError, match="dict"):
        t.delete([("k", 1)])  # malformed branch list rejected loudly


def test_sql_delete_honors_write_delete_mode(spark, tmp_path):
    """r7: Iceberg ``write.delete.mode`` parity — with
    merge-on-read set, a SQL DELETE routes to the tombstone path (no
    data file rewritten), and the OR grammar still works there."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.wm", SCHEMA)
    t.set_property("delete.representation", "dv")
    t.set_property("write.delete.mode", "merge-on-read")
    for day, ks in ((1, range(0, 5)), (2, range(5, 10))):
        t.append(local_rows_df(spark, _day_rows(day, ks), SCHEMA))
    before_paths = {f["file_path"] for f in t.plan_files()}
    lake_sql(
        cat, "DELETE FROM db.wm WHERE (k >= 1 AND k < 3) OR (k >= 8 AND k < 10)"
    )
    t = cat.load_table("db.wm")
    assert _ks(t) == [0, 3, 4, 5, 6, 7]
    # merge-on-read: data files untouched, tombstones applied at scan
    assert {f["file_path"] for f in t.plan_files()} == before_paths
    assert t.snapshot()["operation"] == "delete"
    assert t.snapshot()["summary"]["total-position-deletes"] == 4


def test_parser_in_list_expansion():
    """r7: IN-lists expand to equality branches (cross-producted with
    the rest of the conjunction), quoted commas/escapes survive, the
    expansion cap raises, and the single-conjunction surface rejects."""
    from icebergplus_spark.lake.sql_dml import _parse_where_or as pwo

    assert pwo("k IN (1, 2)") == [{"k": ("=", 1)}, {"k": ("=", 2)}]
    assert pwo("k IN (1, 2) AND tag = 'x'") == [
        {"tag": ("=", "x"), "k": ("=", 1)},
        {"tag": ("=", "x"), "k": ("=", 2)},
    ]
    assert pwo("tag IN ('a,b', 'c''d')") == [
        {"tag": ("=", "a,b")}, {"tag": ("=", "c'd")}
    ]
    with pytest.raises(UnsupportedSQL, match="expansion"):
        pwo("k IN (%s)" % ",".join(str(i) for i in range(65)))
    with pytest.raises(UnsupportedSQL, match="single-conjunction"):
        _parse_where("k IN (1, 2)")


def test_sql_in_list_delete_update_select(table):
    """IN through every DML verb, under both delete representations."""
    cat, t = table
    lake_sql(cat, "DELETE FROM db.rng WHERE k IN (0, 7, 19)")
    assert _ks(cat.load_table("db.rng")) == sorted(
        set(range(20)) - {0, 7, 19}
    )
    lake_sql(cat, "UPDATE db.rng SET tag = 'in' WHERE k IN (1, 18)")
    tags = {r["k"]: r["tag"] for r in cat.load_table("db.rng").scan().collect()}
    assert tags[1] == "in" and tags[18] == "in" and tags[2] == "d1"
    got = lake_sql(
        cat,
        "SELECT COUNT(*) AS n FROM db.rng WHERE k IN (1, 2, 3)",
    ).first()["n"]
    assert got == 3


def test_in_list_prunes_equality_branches(spark, tmp_path):
    """A 2-value IN over day-sliced files must union-plan ONCE and keep
    only the two files whose ranges contain the values."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.pin", SCHEMA)
    for day, ks in ((1, range(0, 5)), (2, range(5, 10)),
                    (3, range(10, 15)), (4, range(15, 20))):
        t.append(local_rows_df(spark, _day_rows(day, ks), SCHEMA))
    calls = _recording(t, "plan_files_any")
    cat.load_table = lambda ident: t
    lake_sql(cat, "DELETE FROM db.pin WHERE k IN (2, 17)")
    assert len(calls) == 1 and len(calls[0]) == 2
    assert _ks(cat.load_table("db.pin")) == sorted(set(range(20)) - {2, 17})


def test_count_rows_metadata_path_and_or_branches(spark, tmp_path):
    """r7: count_rows answers aligned predicates from MANIFEST stats
    (zero data-file reads — planted via a _read_live recorder), scans
    only boundary files otherwise, takes OR branches, and degrades to
    the exact scan under tombstones."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.cnt", SCHEMA)
    for day, ks in ((1, range(0, 5)), (2, range(5, 10)),
                    (3, range(10, 15)), (4, range(15, 20))):
        t.append(local_rows_df(spark, _day_rows(day, ks), SCHEMA))
    reads = []
    orig = t._read_live
    t._read_live = lambda *a, **kw: (reads.append(a[0]) or orig(*a, **kw))

    # aligned to file boundaries: answered purely from metadata
    assert t.count_rows({"k": [(">=", 5), ("<", 10)]}) == 5
    assert reads == [], f"metadata count read data files: {reads}"
    # OR of two aligned ranges: still zero data reads
    assert t.count_rows(
        [{"k": [(">=", 0), ("<", 5)]}, {"k": [(">=", 15), ("<", 20)]}]
    ) == 10
    assert reads == []
    # misaligned: exactly the one boundary file is scanned
    assert t.count_rows({"k": [(">=", 5), ("<", 8)]}) == 3
    assert len(reads) == 1 and len(reads[0]) == 1
    # tombstones force the exact scan fallback — still right
    t.delete_where({"k": ("=", 6)})
    assert t.count_rows({"k": [(">=", 5), ("<", 10)]}) == 4


def test_sql_count_star_fast_path(spark, tmp_path):
    """SELECT COUNT(*) under the stats grammar routes to count_rows;
    aliased and unaliased names match Spark's, results match the
    generic SQL path, and GROUP BY falls through untouched."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.csql", SCHEMA)
    for day, ks in ((1, range(0, 5)), (2, range(5, 10)),
                    (3, range(10, 15)), (4, range(15, 20))):
        t.append(local_rows_df(spark, _day_rows(day, ks), SCHEMA))
    counts = []
    orig = t.count_rows
    t.count_rows = lambda *a, **kw: (counts.append(a) or orig(*a, **kw))
    cat.load_table = lambda ident: t
    df = lake_sql(
        cat,
        "SELECT COUNT(*) AS n FROM db.csql "
        "WHERE (k >= 0 AND k < 5) OR k IN (17, 18)",
    )
    assert df.columns == ["n"] and df.first()["n"] == 7
    assert len(counts) == 1  # the fast path fired
    # unaliased: Spark's `count(1)` column name
    df2 = lake_sql(cat, "SELECT COUNT(*) FROM db.csql WHERE k >= 10")
    assert df2.columns == ["count(1)"] and df2.first()[0] == 10
    # GROUP BY is not this shape — generic path, no count_rows call
    n_before = len(counts)
    df3 = lake_sql(
        cat,
        "SELECT tag, COUNT(*) AS n FROM db.csql WHERE k >= 0 GROUP BY tag",
    )
    assert len(counts) == n_before
    assert df3.count() == 4


def test_between_inside_literals_and_parens():
    """Review r7: the BETWEEN rewrite used to be quote-blind and could
    corrupt a string literal containing the word BETWEEN; it is now
    recognized only as a term after the quote-aware AND split."""
    from icebergplus_spark.lake.sql_dml import _parse_where_or as pwo

    # literal containing BETWEEN survives verbatim
    assert pwo("tag = 'x BETWEEN 1 AND 2'") == [
        {"tag": ("=", "x BETWEEN 1 AND 2")}
    ]
    # parenthesized full form (AND split doesn't fire inside parens)
    assert pwo("(k BETWEEN 3 AND 7) AND val >= 1") == [
        {"k": [(">=", 3), ("<=", 7)], "val": (">=", 1.0)}
    ] or pwo("(k BETWEEN 3 AND 7) AND val >= 1") == [
        {"k": [(">=", 3), ("<=", 7)], "val": (">=", 1)}
    ]
    # string bounds with embedded AND
    assert pwo("tag BETWEEN 'a AND b' AND 'z'") == [
        {"tag": [(">=", "a AND b"), ("<=", "z")]}
    ]
    # two BETWEENs in one conjunction
    assert pwo("k BETWEEN 1 AND 2 AND val BETWEEN 3 AND 4") == [
        {"k": [(">=", 1), ("<=", 2)], "val": [(">=", 3), ("<=", 4)]}
    ]


def test_select_fast_path_intraday_literals_no_lost_rows(spark, tmp_path):
    """Review r7 (top finding): the SELECT fast path must coerce
    space-form timestamp literals before stats pruning — an intra-day
    upper bound against 'T'-form isoformat stats would silently DROP a
    file whose rows match."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.sel", SCHEMA)
    for day, ks in ((1, range(0, 5)), (2, range(5, 10))):
        t.append(local_rows_df(spark, _day_rows(day, ks), SCHEMA))
    cat.load_table = lambda ident: t
    # day-2 rows sit at hours 11..15; a 13:00 upper bound is intra-day
    expect = sorted(
        r["k"] for r in t.scan().collect()
        if r["ts"] < dt.datetime(2024, 1, 2, 13)
    )
    got = lake_sql(
        cat,
        "SELECT k FROM db.sel WHERE ts < '2024-01-02 13:00:00' ORDER BY k",
    )
    assert [r["k"] for r in got.collect()] == expect
    assert any(k >= 5 for k in expect), "window must cross into day 2"


def test_count_rows_tombstone_fallback_still_prunes(spark, tmp_path):
    """Review r7: under tombstones count_rows degrades to a scan — but
    a stats-PRUNED scan, not a whole-table read."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.cnt2", SCHEMA)
    for day, ks in ((1, range(0, 5)), (2, range(5, 10)),
                    (3, range(10, 15)), (4, range(15, 20))):
        t.append(local_rows_df(spark, _day_rows(day, ks), SCHEMA))
    t.delete_where({"k": ("=", 6)})
    reads = []
    orig = t._read_live
    t._read_live = lambda *a, **kw: (reads.append(a[0]) or orig(*a, **kw))
    # single conjunction: one file planned, not four
    assert t.count_rows({"k": [(">=", 5), ("<", 10)]}) == 4
    assert reads and all(len(paths) == 1 for paths in reads)
    reads.clear()
    # OR branches: exactly the two matching files read
    assert t.count_rows(
        [{"k": [(">=", 0), ("<", 3)]}, {"k": [(">=", 15), ("<", 18)]}]
    ) == 6
    assert reads and all(len(paths) == 2 for paths in reads)


def test_sql_inventory_agg_zero_data_reads(spark, tmp_path):
    """r7: SELECT MIN/MAX/COUNT(*) FROM t answers from manifest stats —
    planted: zero _read_live calls, values match a real aggregate, and
    a WHERE/unknown-column/tombstone shape falls back cleanly."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.inv", SCHEMA)
    for day, ks in ((1, range(0, 5)), (2, range(5, 10))):
        t.append(local_rows_df(spark, _day_rows(day, ks), SCHEMA))
    reads = []
    orig = t._read_live
    t._read_live = lambda *a, **kw: (reads.append(a[0]) or orig(*a, **kw))
    cat.load_table = lambda ident: t
    df = lake_sql(
        cat,
        "SELECT MIN(k) AS lo, MAX(k) AS hi, MIN(ts) AS t0, "
        "MAX(ts) AS t1, COUNT(*) AS n FROM db.inv",
    )
    r = df.first()
    assert reads == [], f"inventory agg read data files: {reads}"
    assert (r["lo"], r["hi"], r["n"]) == (0, 9, 10)
    assert r["t0"] == dt.datetime(2024, 1, 1, 6)
    assert r["t1"] == dt.datetime(2024, 1, 2, 15)
    assert df.columns == ["lo", "hi", "t0", "t1", "n"]
    # richer shapes fall through to the generic path (still correct)
    df2 = lake_sql(cat, "SELECT MAX(val) AS m FROM db.inv WHERE k >= 5")
    assert df2.first()["m"] == 9.0
    # tombstones: stats_min_max/count_rows degrade internally — exact
    t.delete_where({"k": ("=", 9)})
    df3 = lake_sql(
        cat, "SELECT MAX(k) AS hi, COUNT(*) AS n FROM db.inv"
    )
    assert (df3.first()["hi"], df3.first()["n"]) == (8, 9)
