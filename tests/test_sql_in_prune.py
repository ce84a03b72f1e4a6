"""Key-set file pruning for SELECT `WHERE k IN (SELECT ...)` reads
(r11, VERDICT r10 #3): the read rides the same eq-delete range+bloom
machinery DML already uses, behind the same probe-domain type gate.
Battery: the planted kept-file-count gate, result equality vs the
native path, range-conjunct composition, the type-mismatch disable,
NULL/empty key-set semantics, and correlated/NOT-IN declines.
"""

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.localrel import local_rows_df
from icebergplus_spark.lake.sql_dml import lake_sql

T = StructType(
    [
        StructField("k", LongType(), True),
        StructField("v", DoubleType(), True),
    ]
)
K = StructType([StructField("kk", LongType(), True)])
KS = StructType([StructField("kk", StringType(), True)])


def _mk(spark, tmp_path):
    """Fact table appended in 4 disjoint k-range files + a key table."""
    c = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = c.create_table("db.fact", T)
    for lo in range(0, 40, 10):
        t.append(
            local_rows_df(spark, 
                [(i, float(i)) for i in range(lo, lo + 10)], T
            )
        )
    keys = c.create_table("db.keys", K)
    keys.append(local_rows_df(spark, [(3,), (7,), (7,)], K))
    return c, t, keys


Q = "SELECT k, v FROM db.fact WHERE k IN (SELECT kk FROM db.keys) ORDER BY k"


def test_in_subquery_read_prunes_files(spark, tmp_path):
    """THE planted gate: keys {3,7} live in file [0,10) only — the
    pruned scan must read exactly 1 of the 4 files."""
    cat, t, _ = _mk(spark, tmp_path)
    keys = lake_sql(cat, "SELECT kk FROM db.keys")
    pruned = t.scan_pruned_by_keys([("k", keys)])
    assert pruned is not None
    assert len(pruned.inputFiles()) == 1
    df = lake_sql(cat, Q)
    # the statement itself must ROUTE through the pruned scan, not
    # merely stay correct on the native path (inputFiles = 1 fact
    # file + the keys table's own file)
    fact_files = [f for f in df.inputFiles() if "/fact/" in f]
    assert len(fact_files) == 1
    assert [(r["k"], r["v"]) for r in df.collect()] == [(3, 3.0), (7, 7.0)]


def test_in_subquery_with_range_conjunct(spark, tmp_path):
    """A grammar conjunct keeps its own branch pruning AND its row
    filtering alongside the key-set term."""
    cat, t, _ = _mk(spark, tmp_path)
    rows = lake_sql(
        cat,
        "SELECT k FROM db.fact WHERE k IN (SELECT kk FROM db.keys) "
        "AND k >= 5 ORDER BY k",
    ).collect()
    assert [r["k"] for r in rows] == [7]


def test_in_subquery_type_mismatch_disables_pruning(spark, tmp_path):
    """STRING keys against a BIGINT column: Spark's non-ANSI join
    coercion can't be mirrored by raw-value probes, so
    scan_pruned_by_keys refuses and the read declines to native —
    same rows, zero pruning."""
    cat, t, _ = _mk(spark, tmp_path)
    skeys = cat.create_table("db.skeys", KS)
    skeys.append(local_rows_df(spark, [("3",), ("7",)], KS))
    str_keys = lake_sql(cat, "SELECT kk FROM db.skeys")
    assert t.scan_pruned_by_keys([("k", str_keys)]) is None
    rows = lake_sql(
        cat,
        "SELECT k FROM db.fact WHERE k IN (SELECT kk FROM db.skeys) "
        "ORDER BY k",
    ).collect()
    assert [r["k"] for r in rows] == [3, 7]


def test_in_subquery_empty_key_set(spark, tmp_path):
    """x IN (empty set) is FALSE for every row — all files skipped,
    zero rows, no error."""
    cat, t, _ = _mk(spark, tmp_path)
    rows = lake_sql(
        cat,
        "SELECT k FROM db.fact WHERE k IN "
        "(SELECT kk FROM db.keys WHERE kk > 100)",
    ).collect()
    assert rows == []


def test_in_subquery_null_keys_inert(spark, tmp_path):
    """NULLs in the key set can't equal anything: pruning ignores
    them, rows still match the non-null keys."""
    cat, t, keys = _mk(spark, tmp_path)
    keys.append(local_rows_df(spark, [(None,)], K))
    rows = lake_sql(cat, Q).collect()
    assert [r["k"] for r in rows] == [3, 7]


def test_not_in_subquery_read_unchanged(spark, tmp_path):
    """NOT IN keeps the native path (key-set pruning would be
    unsound: matching rows live OUTSIDE the key files)."""
    cat, t, _ = _mk(spark, tmp_path)
    rows = lake_sql(
        cat,
        "SELECT k FROM db.fact WHERE k NOT IN (SELECT kk FROM db.keys) "
        "AND k < 5 ORDER BY k",
    ).collect()
    assert [r["k"] for r in rows] == [0, 1, 2, 4]


def test_correlated_in_subquery_declines_to_native(spark, tmp_path):
    """A correlated subquery can't run standalone — the fast path
    declines; Spark's native correlated-IN answers."""
    cat, t, _ = _mk(spark, tmp_path)
    rows = lake_sql(
        cat,
        "SELECT f.k FROM db.fact f WHERE f.k IN "
        "(SELECT kk FROM db.keys WHERE kk = f.k) ORDER BY f.k",
    ).collect()
    assert [r["k"] for r in rows] == [3, 7]


def test_in_subquery_agg_tail(spark, tmp_path):
    """GROUP BY / ORDER BY tail survives the statement rebuild."""
    cat, t, keys = _mk(spark, tmp_path)
    keys.append(local_rows_df(spark, [(12,)], K))
    rows = lake_sql(
        cat,
        "SELECT COUNT(*) AS n, SUM(k) AS s FROM db.fact "
        "WHERE k IN (SELECT kk FROM db.keys)",
    ).collect()
    assert (rows[0]["n"], rows[0]["s"]) == (3, 22)


def test_two_in_conjuncts_prune_by_union(spark, tmp_path):
    """Multiple IN conjuncts: per-term skip sets union — a file any
    one term's range proves unhittable is skipped, rows satisfy both
    terms. keys {3,7} (range prunes files 2-4); keys2 {7,12} (range
    prunes files 3-4, KEEPS file 2) — the union keeps file 1 only,
    tighter than either term alone."""
    cat, t, _ = _mk(spark, tmp_path)
    k2 = cat.create_table("db.keys2", K)
    k2.append(local_rows_df(spark, [(7,), (12,)], K))
    df = lake_sql(
        cat,
        "SELECT k FROM db.fact WHERE k IN (SELECT kk FROM db.keys) "
        "AND k IN (SELECT kk FROM db.keys2) ORDER BY k",
    )
    fact_files = [f for f in df.inputFiles() if "/fact/" in f]
    assert len(fact_files) == 1
    assert [r["k"] for r in df.collect()] == [7]


def test_qualified_refs_decline_to_native(spark, tmp_path):
    """Bare-table-name qualifiers (`fact.k` — Spark's usual spelling
    for an unaliased table) must decline the rebuild (the pruned view
    renames the relation) and stay correct on the native path. The
    full `db.fact.k` spelling combined with an IN-subquery is not
    resolvable on the native path either (pre-existing), so only the
    last-segment form is covered here."""
    cat, t, _ = _mk(spark, tmp_path)
    rows = lake_sql(
        cat,
        "SELECT fact.k FROM db.fact WHERE fact.k IN "
        "(SELECT kk FROM db.keys) ORDER BY fact.k",
    ).collect()
    assert [r["k"] for r in rows] == [3, 7]


def test_inner_group_by_subquery_routes_and_prunes(spark, tmp_path):
    """An aggregate key subquery (GROUP BY inside the IN) must not cut
    the WHERE/tail split — the read still routes through the pruned
    scan (r11 depth-0 split)."""
    cat, t, _ = _mk(spark, tmp_path)
    df = lake_sql(
        cat,
        "SELECT k FROM db.fact WHERE k IN "
        "(SELECT kk FROM db.keys GROUP BY kk) ORDER BY k",
    )
    fact_files = [f for f in df.inputFiles() if "/fact/" in f]
    assert len(fact_files) == 1
    assert [r["k"] for r in df.collect()] == [3, 7]


def test_in_pruned_read_applies_tombstones(spark, tmp_path):
    """The pruned scan goes through _read_live: a MoR tombstone on a
    key inside the kept file set must not resurrect the row."""
    cat, t, _ = _mk(spark, tmp_path)
    t.delete_by_key(spark.createDataFrame([(3,)], "k bigint"))
    rows = lake_sql(cat, Q).collect()
    assert [r["k"] for r in rows] == [7]
