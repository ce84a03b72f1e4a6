"""Compound subquery DML WHERE (r10, VERDICT r9 #1+#3): one
``col [NOT] IN (SELECT ...)`` or ``[NOT] EXISTS (SELECT ...)`` conjunct
ANDed with ordinary grammar conjuncts, routed through ONE merge_into
pass. The battery pins:

- result correctness for all four subquery kinds with a range conjunct,
- the PLANTED file-count proof that the grammar conjunct still prunes
  (files whose stats rule out the range carry over byte-identical),
- the NOT IN three-valued phases under a compound WHERE (NULL-bearing
  set ⇒ whole-statement no-op; empty set ⇒ reduces to the remainder),
- NOT EXISTS firing on NULL target keys (the anti-join difference from
  NOT IN),
- loud refusals for every correlation shape the rewrite can't prove,
- merge_into's target_branches soundness guard (insert clause on).
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.localrel import local_rows_df
from icebergplus_spark.lake.sql_dml import UnsupportedSQL, lake_sql

T = StructType(
    [
        StructField("k", IntegerType(), True),
        StructField("ts", IntegerType(), True),
        StructField("v", StringType(), True),
    ]
)
K = StructType([StructField("kk", IntegerType(), True)])


@pytest.fixture()
def cat(spark, tmp_path):
    c = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = c.create_table("db.t", T)
    # file A: ts 1..4 plus a NULL-key row; file B: ts 10..13 — the
    # range conjunct ts < 5 must leave file B untouched on disk
    t.append(
        local_rows_df(spark, 
            [(i, i, f"v{i}") for i in range(1, 5)] + [(None, 1, "vnull")], T
        )
    )
    t.append(
        local_rows_df(spark, 
            [(i, i + 5, f"v{i}") for i in range(5, 9)], T
        )
    )
    ks = c.create_table("db.keys", K)
    ks.append(spark.createDataFrame([(2,), (6,)], K))
    ksn = c.create_table("db.keysn", K)
    ksn.append(spark.createDataFrame([(2,), (None,)], K))
    ke = c.create_table("db.keyse", K)
    ke.append(spark.createDataFrame([], K))
    return c


def _rows(cat):
    return sorted(
        (
            (r["k"], r["ts"], r["v"])
            for r in lake_sql(cat, "SELECT k, ts, v FROM db.t").collect()
        ),
        key=lambda p: (p[0] is None, p[0] or 0, p[1]),
    )


def _high_file(cat):
    """The file whose ts range is entirely >= 5 (file B)."""
    t = cat.load_table("db.t")
    paths = {f["file_path"] for f in t.plan_files({"ts": (">=", 5)})}
    assert len(paths) == 1
    return paths


def test_in_subquery_and_range(spark, cat):
    lake_sql(
        cat,
        "DELETE FROM db.t WHERE k IN (SELECT kk FROM db.keys) AND ts < 5",
    )
    got = {(k, ts) for k, ts, _ in _rows(cat)}
    # k=2 (ts=2) fires; k=6 matches the key set but ts=11 fails the range
    assert (2, 2) not in got
    assert (6, 11) in got and (None, 1) in got
    assert len(got) == 8


def test_grammar_conjunct_still_prunes_files(spark, cat):
    """THE planted proof: the ts < 5 conjunct reaches the manifest
    planner, so the high-ts file carries over byte-identical (same
    path) through the compound-IN merge rewrite."""
    high = _high_file(cat)
    lake_sql(
        cat,
        "DELETE FROM db.t WHERE k IN (SELECT kk FROM db.keys) AND ts < 5",
    )
    after = {f["file_path"] for f in cat.load_table("db.t").plan_files()}
    assert high <= after, "range-pruned file must survive unrewritten"


def test_not_in_prunes_by_source_scan(spark, cat):
    """BY SOURCE clauses normally judge every target row; with a
    grammar remainder gating the clause, files outside the remainder
    carry over unrewritten."""
    high = _high_file(cat)
    lake_sql(
        cat,
        "DELETE FROM db.t "
        "WHERE k NOT IN (SELECT kk FROM db.keys) AND ts < 5",
    )
    after = {f["file_path"] for f in cat.load_table("db.t").plan_files()}
    assert high <= after
    got = {(k, ts) for k, ts, _ in _rows(cat)}
    # ts<5 ∧ k∉{2,6}: k=1,3,4 fire; NULL k evaluates NULL → kept
    assert got == {(2, 2), (None, 1), (5, 10), (6, 11), (7, 12), (8, 13)}


def test_not_in_null_bearing_set_voids_whole_statement(spark, cat):
    before = _rows(cat)
    lake_sql(
        cat,
        "DELETE FROM db.t "
        "WHERE k NOT IN (SELECT kk FROM db.keysn) AND ts < 5",
    )
    assert _rows(cat) == before


def test_not_in_empty_set_reduces_to_remainder(spark, cat):
    lake_sql(
        cat,
        "DELETE FROM db.t "
        "WHERE k NOT IN (SELECT kk FROM db.keyse) AND ts < 5",
    )
    # NOT IN {} is TRUE for every row — NULL key included — so the
    # statement is exactly DELETE WHERE ts < 5
    assert {(k, ts) for k, ts, _ in _rows(cat)} == {
        (5, 10), (6, 11), (7, 12), (8, 13)
    }


def test_correlated_exists_and_range(spark, cat):
    lake_sql(
        cat,
        "DELETE FROM db.t WHERE EXISTS "
        "(SELECT 1 FROM db.keys s WHERE s.kk = t.k) AND ts < 5",
    )
    got = {(k, ts) for k, ts, _ in _rows(cat)}
    assert (2, 2) not in got and (6, 11) in got and (None, 1) in got


def test_correlated_exists_extra_inner_conjunct(spark, cat):
    """Inner non-correlated conjuncts stay in the rewritten key query."""
    lake_sql(
        cat,
        "DELETE FROM db.t WHERE EXISTS "
        "(SELECT 1 FROM db.keys s WHERE s.kk = t.k AND s.kk < 5)",
    )
    got = {k for k, _, _ in _rows(cat)}
    assert 2 not in got and 6 in got  # kk=6 filtered out of the key set


def test_not_exists_fires_on_null_target_key(spark, cat):
    """The anti-join difference from NOT IN: a NULL target key never
    matches, so NOT EXISTS is TRUE for it — the row deletes."""
    lake_sql(
        cat,
        "DELETE FROM db.t WHERE NOT EXISTS "
        "(SELECT 1 FROM db.keys s WHERE s.kk = t.k)",
    )
    assert {(k, ts) for k, ts, _ in _rows(cat)} == {(2, 2), (6, 11)}


def test_not_exists_null_bearing_source_is_inert(spark, cat):
    """NULLs in the key set are inert under NOT EXISTS (they match
    nothing) — unlike NOT IN, the statement still fires."""
    lake_sql(
        cat,
        "DELETE FROM db.t WHERE NOT EXISTS "
        "(SELECT 1 FROM db.keysn s WHERE s.kk = t.k) AND ts < 5",
    )
    got = {(k, ts) for k, ts, _ in _rows(cat)}
    # ts<5 ∧ no match in {2, NULL}: k=1,3,4 and the NULL-key row fire
    assert got == {(2, 2), (5, 10), (6, 11), (7, 12), (8, 13)}


def test_update_compound_in(spark, cat):
    lake_sql(
        cat,
        "UPDATE db.t SET v = 'X' "
        "WHERE k IN (SELECT kk FROM db.keys) AND ts < 5",
    )
    marked = {k for k, _, v in _rows(cat) if v == "X"}
    assert marked == {2}


def test_update_compound_not_in_keeps_pruned_file(spark, cat):
    high = _high_file(cat)
    lake_sql(
        cat,
        "UPDATE db.t SET v = 'Y' "
        "WHERE k NOT IN (SELECT kk FROM db.keys) AND ts < 5",
    )
    after = {f["file_path"] for f in cat.load_table("db.t").plan_files()}
    assert high <= after
    marked = {k for k, _, v in _rows(cat) if v == "Y"}
    assert marked == {1, 3, 4}  # NULL key kept un-updated


def test_two_subquery_conjuncts_compose(spark, cat):
    """r11 (VERDICT r10 #5): two IN conjuncts compose through one
    merge pass instead of the r10 refusal — only keys in BOTH sets
    delete (keys = {2,6}, keysn = {2,NULL}; NULL in an IN set is
    inert — only k=2 goes). The full multi-conjunct battery lives in
    test_sql_multi_subquery.py."""
    lake_sql(
        cat,
        "DELETE FROM db.t WHERE k IN (SELECT kk FROM db.keys) "
        "AND k IN (SELECT kk FROM db.keysn)",
    )
    got = {(k, ts) for k, ts, _ in _rows(cat)}
    assert got == {
        (1, 1), (3, 3), (4, 4), (None, 1),
        (5, 10), (6, 11), (7, 12), (8, 13),
    }


def test_exists_correlation_refusals(spark, cat):
    before = _rows(cat)
    for stmt, pat in (
        # non-equality correlation
        (
            "DELETE FROM db.t WHERE EXISTS "
            "(SELECT 1 FROM db.keys s WHERE s.kk < t.k)",
            "only one",
        ),
        # target referenced in the select list
        (
            "DELETE FROM db.t WHERE EXISTS "
            "(SELECT t.k FROM db.keys s WHERE s.kk = t.k)",
            "select list",
        ),
        # two correlation conjuncts
        (
            "DELETE FROM db.t WHERE EXISTS "
            "(SELECT 1 FROM db.keys s WHERE s.kk = t.k AND s.kk = t.ts)",
            "exactly one",
        ),
        # subquery FROM alias shadows the target's name
        (
            "DELETE FROM db.t WHERE EXISTS "
            "(SELECT 1 FROM db.keys t WHERE t.kk = t.k)",
            "shadow",
        ),
        # correlated + GROUP BY — conjunct surgery not analyzed
        (
            "DELETE FROM db.t WHERE EXISTS "
            "(SELECT count(*) FROM db.keys s WHERE s.kk = t.k "
            "GROUP BY s.kk)",
            "GROUP",
        ),
    ):
        with pytest.raises(UnsupportedSQL, match=pat):
            lake_sql(cat, stmt)
    assert _rows(cat) == before


def test_target_branches_requires_insert_off(spark, cat):
    t = cat.load_table("db.t")
    src = spark.createDataFrame([(2, 2, "z")], T)
    with pytest.raises(ValueError, match="when_not_matched_insert"):
        t.merge_into(
            src,
            on="k",
            when_matched_update={"v": "z"},
            target_branches=[{"ts": ("<", 5)}],
        )


def test_compound_on_mor_dv_table(spark, cat, tmp_path):
    """The same compound routes under deletion vectors (merge-on-read
    merge path): results identical, pruned file untouched."""
    c = LocalLakeCatalog(spark, str(tmp_path / "wh2")).start()
    t = c.create_table("db.m", T)
    t.set_property("delete.representation", "dv")
    t.append(
        local_rows_df(spark, 
            [(i, i, f"v{i}") for i in range(1, 5)], T
        )
    )
    t.append(
        local_rows_df(spark, 
            [(i, i + 5, f"v{i}") for i in range(5, 9)], T
        )
    )
    ks = c.create_table("db.mkeys", K)
    ks.append(spark.createDataFrame([(2,), (6,)], K))
    lake_sql(
        c,
        "DELETE FROM db.m WHERE k IN (SELECT kk FROM db.mkeys) AND ts < 5",
    )
    got = sorted(
        r["k"] for r in lake_sql(c, "SELECT k FROM db.m").collect()
    )
    assert got == [1, 3, 4, 5, 6, 7, 8]


def test_compound_rest_with_inlist_and_between(spark, cat):
    """Grammar remainders that exercise the splitter's edges: an
    IN-list conjunct (branch expansion) and BETWEEN (whose own AND is
    split and re-joined in order)."""
    lake_sql(
        cat,
        "DELETE FROM db.t WHERE k IN (SELECT kk FROM db.keys) "
        "AND v IN ('v2', 'v6') AND ts BETWEEN 1 AND 4",
    )
    got = {(k, ts) for k, ts, _ in _rows(cat)}
    # only k=2 satisfies all three (k=6 fails BETWEEN: ts=11)
    assert (2, 2) not in got and (6, 11) in got
    assert len(got) == 8


def test_exists_inner_or_refused(spark, cat):
    """`corr AND a=1 OR b=2` groups as (corr AND a=1) OR b=2 — conjunct
    surgery can't be proven equivalent, so the statement refuses
    loudly instead of deleting the wrong rows (review r10)."""
    before = _rows(cat)
    with pytest.raises(UnsupportedSQL, match="top-level OR"):
        lake_sql(
            cat,
            "DELETE FROM db.t WHERE EXISTS (SELECT 1 FROM db.keys s "
            "WHERE s.kk = t.k AND s.kk = 2 OR s.kk = 6)",
        )
    assert _rows(cat) == before


def test_exists_case_insensitive_target_refs(spark, cat):
    """Spark resolves identifiers case-insensitively — the correlation
    extractor must too (review r10)."""
    lake_sql(
        cat,
        "DELETE FROM db.t WHERE EXISTS "
        "(SELECT 1 FROM db.keys s WHERE s.kk = T.K) AND ts < 5",
    )
    got = {(k, ts) for k, ts, _ in _rows(cat)}
    assert (2, 2) not in got and (6, 11) in got


def test_exists_uppercase_alias_shadow_refused(spark, cat):
    """An UPPERCASE subquery alias spelling the target's name still
    trips the shadow guard (review r10)."""
    before = _rows(cat)
    with pytest.raises(UnsupportedSQL, match="shadow"):
        lake_sql(
            cat,
            "DELETE FROM db.t WHERE EXISTS "
            "(SELECT 1 FROM db.keys T WHERE T.kk = t.k)",
        )
    assert _rows(cat) == before


def test_pruned_noop_statement_still_raises_loud_errors(spark, tmp_path):
    """r13 review: the remainder-prunes-all short-circuit must not
    swallow analysis errors — a malformed subquery or a bad SET column
    raises identically whether or not the branch window matches any
    file (the no-op is data-dependent, the error surface is not)."""
    import pytest
    from pyspark.sql.types import (
        IntegerType,
        StructField,
        StructType,
    )

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import UnsupportedSQL, lake_sql

    schema = StructType(
        [
            StructField("k", IntegerType(), True),
            StructField("ts", IntegerType(), True),
        ]
    )
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.t", schema)
    s = cat.create_table("db.s", schema)
    t.append(spark.createDataFrame([(i, 100 + i) for i in range(4)], schema))
    s.append(spark.createDataFrame([(1, 1)], schema))
    snap = t.current_snapshot_id
    # ts < 0 prunes every file (ts >= 100), yet these must still raise:
    with pytest.raises(UnsupportedSQL, match="one column"):
        lake_sql(
            cat,
            "DELETE FROM db.t WHERE k IN (SELECT k, ts FROM db.s) "
            "AND ts < 0",
        )
    with pytest.raises(Exception):  # nonexistent subquery table
        lake_sql(
            cat,
            "DELETE FROM db.t WHERE k IN (SELECT k FROM db.nope) "
            "AND ts < 0",
        )
    with pytest.raises(KeyError, match="no such column"):
        lake_sql(
            cat,
            "UPDATE db.t SET bogus = 1 WHERE k IN (SELECT k FROM db.s) "
            "AND ts < 0",
        )
    # the multi-subquery router too
    with pytest.raises(UnsupportedSQL, match="one column"):
        lake_sql(
            cat,
            "DELETE FROM db.t WHERE k IN (SELECT k, ts FROM db.s) "
            "AND k NOT IN (SELECT k FROM db.s) AND ts < 0",
        )
    # and a VALID pruned statement stays a zero-churn no-op
    lake_sql(
        cat,
        "DELETE FROM db.t WHERE k IN (SELECT k FROM db.s) AND ts < 0",
    )
    assert t.current_snapshot_id == snap
    assert t.scan().count() == 4
