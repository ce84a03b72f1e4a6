"""Multiple subquery conjuncts per DML WHERE (r11, VERDICT r10 #5):
N [NOT] IN / EXISTS terms compose as chained semi/anti key-set joins
feeding ONE merge pass keyed on the union of the term columns.
Battery: two and three IN terms, IN + NOT IN, the NOT IN NULL-phase
semantics (NULL-bearing set voids the statement; empty set folds the
term out), empty IN (no rows), uncorrelated EXISTS constant gates,
correlated EXISTS composition, the correlated NOT EXISTS refusal,
UPDATE and DELETE variants, and the grammar-remainder row gate.
"""

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.lake.sql_dml import UnsupportedSQL, lake_sql

T = StructType(
    [
        StructField("a", LongType(), True),
        StructField("b", LongType(), True),
        StructField("v", DoubleType(), True),
    ]
)
K = StructType([StructField("k", LongType(), True)])


def _mk(spark, tmp_path):
    c = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = c.create_table("db.t", T)
    # b = a % 5; one NULL-keyed row (a=None) to exercise NULL targets
    t.append(
        spark.createDataFrame(
            [(i, i % 5, float(i)) for i in range(20)] + [(None, 1, -99.0)], T
        ).coalesce(2)
    )
    evens = c.create_table("db.evens", K)
    evens.append(spark.createDataFrame([(i,) for i in range(0, 20, 2)], K))
    small = c.create_table("db.small", K)
    small.append(spark.createDataFrame([(1,), (2,)], K))
    return c, t


def _alive(cat):
    return sorted(
        r["a"]
        for r in lake_sql(cat, "SELECT a FROM db.t WHERE a IS NOT NULL").collect()
    )


def test_two_in_conjuncts_with_range(spark, tmp_path):
    cat, _ = _mk(spark, tmp_path)
    lake_sql(
        cat,
        "DELETE FROM db.t WHERE a IN (SELECT k FROM db.evens) "
        "AND b IN (SELECT k FROM db.small) AND a < 15",
    )
    # even a < 15 with b = a%5 in {1,2}: a = 2, 6, 12
    assert _alive(cat) == sorted(set(range(20)) - {2, 6, 12})


def test_in_and_not_in_update(spark, tmp_path):
    cat, _ = _mk(spark, tmp_path)
    lake_sql(
        cat,
        "UPDATE db.t SET v = -1.0 WHERE a IN (SELECT k FROM db.evens) "
        "AND b NOT IN (SELECT k FROM db.small)",
    )
    got = sorted(
        r["a"] for r in lake_sql(cat, "SELECT a FROM db.t WHERE v = -1.0").collect()
    )
    assert got == [a for a in range(0, 20, 2) if a % 5 not in (1, 2)]


def test_three_in_conjuncts(spark, tmp_path):
    cat, c = _mk(spark, tmp_path)
    big = cat.create_table("db.big", K)
    big.append(spark.createDataFrame([(i,) for i in range(10, 30)], K))
    lake_sql(
        cat,
        "DELETE FROM db.t WHERE a IN (SELECT k FROM db.evens) "
        "AND a IN (SELECT k FROM db.big) "
        "AND b IN (SELECT k FROM db.small)",
    )
    # a even, a >= 10, b = a%5 in {1,2}: a = 12, 16
    assert _alive(cat) == sorted(set(range(20)) - {12, 16})


def test_not_in_null_bearing_set_voids_statement(spark, tmp_path):
    cat, _ = _mk(spark, tmp_path)
    nullk = cat.create_table("db.nullk", K)
    nullk.append(spark.createDataFrame([(1,), (None,)], K))
    lake_sql(
        cat,
        "DELETE FROM db.t WHERE a IN (SELECT k FROM db.evens) "
        "AND b NOT IN (SELECT k FROM db.nullk)",
    )
    assert _alive(cat) == list(range(20))  # no-op, range conjunct or not


def test_not_in_empty_set_folds_out(spark, tmp_path):
    cat, _ = _mk(spark, tmp_path)
    lake_sql(
        cat,
        "DELETE FROM db.t WHERE a IN (SELECT k FROM db.evens) "
        "AND b NOT IN (SELECT k FROM db.small WHERE k > 100) AND a < 5",
    )
    # NOT IN {} is TRUE for every row: evens below 5 delete
    assert _alive(cat) == sorted(set(range(20)) - {0, 2, 4})


def test_empty_in_set_is_noop(spark, tmp_path):
    cat, _ = _mk(spark, tmp_path)
    lake_sql(
        cat,
        "DELETE FROM db.t WHERE a IN (SELECT k FROM db.evens WHERE k > 100) "
        "AND b IN (SELECT k FROM db.small)",
    )
    assert _alive(cat) == list(range(20))


def test_uncorrelated_exists_gates(spark, tmp_path):
    cat, _ = _mk(spark, tmp_path)
    lake_sql(
        cat,
        "DELETE FROM db.t WHERE a IN (SELECT k FROM db.evens) "
        "AND EXISTS (SELECT 1 FROM db.small WHERE k > 100) AND a < 5",
    )
    assert _alive(cat) == list(range(20))  # gate FALSE: no-op
    lake_sql(
        cat,
        "DELETE FROM db.t WHERE a IN (SELECT k FROM db.evens) "
        "AND EXISTS (SELECT 1 FROM db.small WHERE k = 1) AND a < 5",
    )
    assert _alive(cat) == sorted(set(range(20)) - {0, 2, 4})


def test_correlated_exists_composes_with_in(spark, tmp_path):
    cat, _ = _mk(spark, tmp_path)
    lake_sql(
        cat,
        "DELETE FROM db.t WHERE a IN (SELECT k FROM db.evens) "
        "AND EXISTS (SELECT 1 FROM db.small s WHERE s.k = t.b)",
    )
    # a even AND b = a%5 in {1,2}: a = 2, 6, 12, 16
    assert _alive(cat) == sorted(set(range(20)) - {2, 6, 12, 16})


def test_correlated_not_exists_composition_refused(spark, tmp_path):
    cat, _ = _mk(spark, tmp_path)
    with pytest.raises(UnsupportedSQL, match="NOT EXISTS"):
        lake_sql(
            cat,
            "DELETE FROM db.t WHERE a IN (SELECT k FROM db.evens) "
            "AND NOT EXISTS (SELECT 1 FROM db.small s WHERE s.k = t.b)",
        )


def test_null_target_keys_never_affected(spark, tmp_path):
    """The NULL-keyed target row can satisfy no IN term — it must
    survive every multi-conjunct statement."""
    cat, _ = _mk(spark, tmp_path)
    lake_sql(
        cat,
        "DELETE FROM db.t WHERE a IN (SELECT k FROM db.evens) "
        "AND b IN (SELECT k FROM db.small)",
    )
    rows = lake_sql(cat, "SELECT v FROM db.t WHERE a IS NULL").collect()
    assert [r["v"] for r in rows] == [-99.0]


def test_remainder_gates_rows_not_just_files(spark, tmp_path):
    """Two rows share the same key tuple but only one passes the
    grammar remainder — matched_condition must keep the other."""
    cat, _ = _mk(spark, tmp_path)
    t2 = cat.create_table("db.t2", T)
    t2.append(
        spark.createDataFrame([(1, 1, 10.0), (1, 1, 20.0), (2, 1, 30.0)], T)
    )
    lake_sql(
        cat,
        "DELETE FROM db.t2 WHERE a IN (SELECT k FROM db.small) "
        "AND b IN (SELECT k FROM db.small) AND v < 15.0",
    )
    left = sorted(
        (r["a"], r["v"])
        for r in lake_sql(cat, "SELECT a, v FROM db.t2").collect()
    )
    assert left == [(1, 20.0), (2, 30.0)]
