"""CTE (WITH) support in the lake_sql fast paths (r9, VERDICT r8 #1):
``WITH recent AS (SELECT ... WHERE ts >= ...) SELECT ... FROM recent
JOIN db.dim ...`` used to route generic — every live file read. Now a
standalone CTE body dispatches through the full fast-path stack
(pruned single-table views, metadata folds, join pruning) and the main
query join-prunes on its own WHERE. Battery: planted file-count gates,
result equality vs unpruned references, sibling-CTE references, name
shadowing, and the shapes that must fall back."""

import pytest
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.lake.sql_dml import _parse_with, lake_sql

FACT = StructType(
    [
        StructField("k", IntegerType(), True),
        StructField("dim_id", IntegerType(), True),
        StructField("amount", DoubleType(), True),
    ]
)
DIM = StructType(
    [
        StructField("dim_id", IntegerType(), True),
        StructField("label", StringType(), True),
    ]
)


@pytest.fixture()
def cat(spark, tmp_path):
    c = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    fact = c.create_table("db.fact", FACT)
    # four files, k-ranges [0,10) [10,20) [20,30) [30,40)
    for lo in range(0, 40, 10):
        rows = [(k, k % 4, float(k)) for k in range(lo, lo + 10)]
        fact.append(spark.createDataFrame(rows, FACT).coalesce(1))
    dim = c.create_table("db.dim", DIM)
    dim.append(
        spark.createDataFrame([(i, f"d{i}") for i in range(4)], DIM).coalesce(1)
    )
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
    fact, dim = cat.load_table("db.fact"), cat.load_table("db.dim")
    handles = {"db.fact": fact, "db.dim": dim}
    cat.load_table = lambda ident: handles[ident]
    return fact, dim


def test_parse_with_shapes():
    ctes, main = _parse_with(
        "WITH a AS (SELECT 1), b (x, y) AS (SELECT 2, 3) SELECT * FROM b"
    )
    assert [c[0] for c in ctes] == ["a", "b"]
    assert ctes[1][1] == "(x,y)"
    assert main == "SELECT * FROM b"
    # parens/commas inside literals never cut a body short
    ctes, main = _parse_with(
        "WITH a AS (SELECT ')' AS s, ',' AS t FROM x) SELECT s FROM a"
    )
    assert ctes[0][2] == "SELECT ')' AS s, ',' AS t FROM x"
    assert _parse_with("WITH RECURSIVE r AS (SELECT 1) SELECT * FROM r") is None
    assert _parse_with("SELECT 1") is None


def test_cte_body_pruned_single_table(spark, cat):
    """The verdict's headline shape: a range-WHERE CTE over the fact
    table joined to the dim — the CTE body must plan only the files its
    WHERE can match (one of four)."""
    fact, dim = _patched(cat)
    calls = _recording(fact, "plan_files_any")
    got = [
        (r["label"], r["n"])
        for r in lake_sql(
            cat,
            "WITH recent AS ("
            "  SELECT k, dim_id FROM db.fact WHERE k >= 10 AND k < 20"
            ") "
            "SELECT d.label AS label, COUNT(*) AS n "
            "FROM recent r JOIN db.dim d ON r.dim_id = d.dim_id "
            "GROUP BY d.label ORDER BY label",
        ).collect()
    ]
    assert got == [("d0", 2), ("d1", 2), ("d2", 3), ("d3", 3)]
    assert len(calls) == 1 and len(calls[0]) == 1, calls


def test_main_query_where_still_join_prunes(spark, cat):
    """A CTE over the dim side; the main query's own WHERE prunes the
    fact table it reads directly."""
    fact, dim = _patched(cat)
    calls = _recording(fact, "plan_files_any")
    got = sorted(
        r["k"]
        for r in lake_sql(
            cat,
            "WITH dd AS (SELECT dim_id, label FROM db.dim) "
            "SELECT f.k AS k FROM db.fact f "
            "JOIN dd ON f.dim_id = dd.dim_id "
            "WHERE f.k >= 30",
        ).collect()
    )
    assert got == list(range(30, 40))
    assert len(calls) == 1 and len(calls[0]) == 1, calls


def test_sibling_cte_reference_resolves(spark, cat):
    """body2 references body1 — Spark resolves the sibling natively;
    lake identifiers inside body2 still resolve."""
    got = lake_sql(
        cat,
        "WITH lo AS (SELECT k, dim_id FROM db.fact WHERE k < 4), "
        "joined AS ("
        "  SELECT lo.k AS k, d.label AS label "
        "  FROM lo JOIN db.dim d ON lo.dim_id = d.dim_id"
        ") "
        "SELECT k, label FROM joined ORDER BY k",
    ).collect()
    assert [(r["k"], r["label"]) for r in got] == [
        (0, "d0"), (1, "d1"), (2, "d2"), (3, "d3"),
    ]


def test_cte_metadata_fold_count(spark, cat):
    """A COUNT(*)-shaped CTE body takes the metadata fast path —
    planted proof: with every data file DELETED the count still answers
    from the manifest (a real scan would fail)."""
    import os

    fact, dim = _patched(cat)
    for f in fact.plan_files():
        os.remove(f["file_path"])
    got = lake_sql(
        cat,
        "WITH c AS (SELECT COUNT(*) AS n FROM db.fact WHERE k >= 0) "
        "SELECT n FROM c",
    ).collect()
    assert got[0]["n"] == 40


def test_cte_name_shadows_nothing(spark, cat):
    """A bare column named like the CTE must not break the rewrite —
    bodies are dispatched verbatim and the main query keeps its
    references, so shadowing can't occur."""
    spark.createDataFrame(
        [(1, 10), (2, 20)], "x int, v int"
    ).createOrReplaceTempView("shadow_t")
    got = lake_sql(
        cat,
        # the CTE is named `x`; shadow_t ALSO has a column `x`
        "WITH x AS (SELECT v FROM shadow_t WHERE x = 1) "
        "SELECT v FROM x",
    ).collect()
    assert [r["v"] for r in got] == [10]


def test_with_insert_falls_back_unsupported(spark, cat):
    """WITH ... INSERT stays off the decomposition (main must be
    SELECT/VALUES); the statement surfaces the frontend's own error,
    not a mangled rewrite."""
    from icebergplus_spark.lake.sql_dml import UnsupportedSQL

    with pytest.raises(Exception):
        lake_sql(
            cat,
            "WITH x AS (SELECT 1 AS k) INSERT INTO db.fact SELECT * FROM x",
        )


def test_results_match_unpruned_reference(spark, cat):
    """CTE-shaped statements return exactly what fully-resolved
    unpruned SQL does, across body shapes."""
    fact, dim = _patched(cat)
    fact.to_view("fact_cte_ref")
    dim.to_view("dim_cte_ref")
    shapes = [
        (
            "WITH r AS (SELECT * FROM {fact} WHERE k BETWEEN 7 AND 23) "
            "SELECT r.k AS k, d.label AS label FROM r "
            "JOIN {dim} d ON r.dim_id = d.dim_id ORDER BY k"
        ),
        (
            "WITH a AS (SELECT k, amount FROM {fact} WHERE amount >= 30.0), "
            "b AS (SELECT k FROM {fact} WHERE k < 5) "
            "SELECT COUNT(*) AS n FROM a CROSS JOIN b"
        ),
        (
            "WITH agg AS ("
            "  SELECT dim_id, SUM(amount) AS s FROM {fact} "
            "  WHERE k >= 10 GROUP BY dim_id"
            ") "
            "SELECT d.label AS label, agg.s AS s FROM agg "
            "JOIN {dim} d ON agg.dim_id = d.dim_id ORDER BY label"
        ),
    ]
    for q in shapes:
        got = [
            tuple(r)
            for r in lake_sql(
                cat, q.format(fact="db.fact", dim="db.dim")
            ).collect()
        ]
        want = [
            tuple(r)
            for r in fact.spark.sql(
                q.format(fact="fact_cte_ref", dim="dim_cte_ref")
            ).collect()
        ]
        assert got == want and got, q


def test_insert_source_with_cte(spark, cat):
    """INSERT INTO t <WITH-headed query> routes through the CTE fast
    paths like a top-level SELECT (r9)."""
    tgt = cat.create_table("db.tgt_cte", FACT)
    fact, dim = cat.load_table("db.fact"), cat.load_table("db.dim")
    handles = {"db.fact": fact, "db.dim": dim, "db.tgt_cte": tgt}
    cat.load_table = lambda ident: handles[ident]
    calls = _recording(fact, "plan_files_any")
    lake_sql(
        cat,
        "INSERT INTO db.tgt_cte "
        "WITH lo AS (SELECT * FROM db.fact WHERE k >= 10 AND k < 20) "
        "SELECT k, dim_id, amount FROM lo",
    )
    assert sorted(
        r["k"] for r in lake_sql(cat, "SELECT k FROM db.tgt_cte").collect()
    ) == list(range(10, 20))
    assert len(calls) == 1 and len(calls[0]) == 1, calls


def test_ctas_source_with_cte(spark, cat):
    got = lake_sql(
        cat,
        "CREATE TABLE db.ctas_cte AS "
        "WITH hi AS (SELECT k FROM db.fact WHERE k >= 36) "
        "SELECT COUNT(*) AS n FROM hi",
    )
    rows = lake_sql(cat, "SELECT n FROM db.ctas_cte").collect()
    assert [r["n"] for r in rows] == [4]
