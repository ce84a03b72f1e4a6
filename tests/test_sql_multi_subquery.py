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


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_randomized_mini_oracle(spark, tmp_path, seed):
    """Randomized battery: random target rows (NULLs included), random
    key sets (possibly empty or NULL-bearing), IN + NOT IN + range —
    the engine's surviving rows must equal a pure-Python evaluator
    applying SQL's three-valued logic row by row (with the NOT IN
    NULL-set statement-void rule)."""
    import random

    rng = random.Random(seed)
    rows = [
        (
            rng.choice([None] + list(range(8))),
            rng.choice([None] + list(range(6))),
            float(i),
        )
        for i in range(30)
    ]
    s1 = [rng.choice(range(8)) for _ in range(rng.randint(0, 5))]
    s2 = [
        rng.choice([None] + list(range(6)))
        for _ in range(rng.randint(0, 4))
    ]
    cut = rng.choice([10.0, 20.0, 28.0])

    c = LocalLakeCatalog(spark, str(tmp_path / f"wh{seed}")).start()
    t = c.create_table("db.r", T)
    t.append(spark.createDataFrame(rows, T).coalesce(2))
    k1 = c.create_table("db.k1", K)
    if s1:
        k1.append(spark.createDataFrame([(v,) for v in s1], K))
    k2 = c.create_table("db.k2", K)
    if s2:
        k2.append(spark.createDataFrame([(v,) for v in s2], K))

    lake_sql(
        c,
        "DELETE FROM db.r WHERE a IN (SELECT k FROM db.k1) "
        "AND b NOT IN (SELECT k FROM db.k2) AND v < "
        f"{cut}",
    )
    key = lambda p: (p[0] is None, p[0] or 0, p[1] is None, p[1] or 0, p[2])
    got = sorted(
        [
            (r["a"], r["b"], r["v"])
            for r in lake_sql(c, "SELECT a, b, v FROM db.r").collect()
        ],
        key=key,
    )

    def deleted(a, b, v):
        if any(x is None for x in s2):
            return False  # NOT IN over a NULL-bearing set: never TRUE
        t1 = a is not None and a in s1
        t2 = (b is not None and b not in s2) if s2 else True
        return t1 and t2 and v < cut

    expect = sorted(
        [(a, b, v) for a, b, v in rows if not deleted(a, b, v)], key=key
    )
    assert got == expect, (seed, s1, s2, cut)


def test_multi_conjunct_on_dv_table(spark, tmp_path):
    """Multi-conjunct DML routes through merge_into's MoR path when
    the table uses deletion vectors — same rows as the CoW shape."""
    c = LocalLakeCatalog(spark, str(tmp_path / "whdv")).start()
    t = c.create_table("db.dv", T)
    t.set_property("delete.representation", "dv")
    t.append(
        spark.createDataFrame(
            [(i, i % 5, float(i)) for i in range(20)], T
        ).coalesce(2)
    )
    s1 = c.create_table("db.dvs1", K)
    s1.append(spark.createDataFrame([(i,) for i in range(0, 20, 2)], K))
    s2 = c.create_table("db.dvs2", K)
    s2.append(spark.createDataFrame([(1,), (2,)], K))
    lake_sql(
        c,
        "DELETE FROM db.dv WHERE a IN (SELECT k FROM db.dvs1) "
        "AND b IN (SELECT k FROM db.dvs2) AND a < 15",
    )
    left = sorted(r["a"] for r in lake_sql(c, "SELECT a FROM db.dv").collect())
    assert left == sorted(set(range(20)) - {2, 6, 12})
