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
from icebergplus_spark.localrel import local_rows_df
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
        fact.append(local_rows_df(spark, rows, FACT))
    dim = c.create_table("db.dim", DIM)
    dim.append(
        local_rows_df(spark, [(i, f"d{i}") for i in range(4)], DIM)
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


def test_chained_cte_rides_fast_paths(spark, cat):
    """r10 (VERDICT r9 #2): a sibling-referencing chain resolves in
    definition order — BOTH bodies dispatch recursively (each gets its
    own ``__lake_cte_*`` temp view), and the first body's range WHERE
    still plans only the files it can match (one of four)."""
    fact, dim = _patched(cat)
    calls = _recording(fact, "plan_files_any")
    before = {t.name for t in spark.catalog.listTables()}
    got = [
        (r["dim_id"], r["n"])
        for r in lake_sql(
            cat,
            "WITH lo AS ("
            "  SELECT k, dim_id FROM db.fact WHERE k >= 10 AND k < 20"
            "), agg AS ("
            "  SELECT dim_id, COUNT(*) AS n FROM lo GROUP BY dim_id"
            ") "
            "SELECT dim_id, n FROM agg ORDER BY dim_id",
        ).collect()
    ]
    assert got == [(0, 2), (1, 2), (2, 3), (3, 3)]
    assert len(calls) == 1 and len(calls[0]) == 1, calls
    new = {
        t.name
        for t in spark.catalog.listTables()
        if t.name not in before and t.name.startswith("__lake_cte_")
    }
    # the CHAINED body dispatched recursively too — its own view exists
    assert any(v.startswith("__lake_cte_agg_") for v in new), new
    assert any(v.startswith("__lake_cte_lo_") for v in new), new


def test_chained_cte_metadata_fold(spark, cat):
    """A chain whose SECOND body is a manifest fold over a lake table
    (referencing the first only for a cross-check join) — the fold
    still answers from metadata: planted by DELETING the fact table's
    data files; only the r10 recursive dispatch of chained bodies can
    answer (the native path would scan and fail)."""
    import os

    fact, dim = _patched(cat)
    got_pre = lake_sql(
        cat,
        "WITH seg AS (SELECT dim_id, label FROM db.dim), "
        "tot AS (SELECT COUNT(*) AS n FROM db.fact WHERE k >= 0) "
        "SELECT s.label AS label, t.n AS n FROM seg s CROSS JOIN tot t "
        "ORDER BY label",
    ).collect()
    assert [(r["label"], r["n"]) for r in got_pre] == [
        (f"d{i}", 40) for i in range(4)
    ]
    for f in fact.plan_files():
        os.remove(f["file_path"])
    got = lake_sql(
        cat,
        "WITH lo AS (SELECT dim_id, label FROM db.dim WHERE dim_id < 2), "
        "tot AS (SELECT COUNT(*) AS n FROM db.fact WHERE k >= 0), "
        "j AS (SELECT lo.label AS label, tot.n AS n "
        "      FROM lo CROSS JOIN tot) "
        "SELECT label, n FROM j ORDER BY label",
    ).collect()
    assert [(r["label"], r["n"]) for r in got] == [("d0", 40), ("d1", 40)]


def test_chain_with_qualified_refs_and_aliases(spark, cat):
    """Qualified sibling refs (``lo.k``) resolve through the inserted
    ``AS <name>`` alias; an explicit alias on the sibling reference
    swaps only the relation name."""
    got = lake_sql(
        cat,
        "WITH lo AS (SELECT k, dim_id FROM db.fact WHERE k < 4), "
        "j AS (SELECT lo.k AS k, d.label AS label "
        "      FROM lo JOIN db.dim d ON lo.dim_id = d.dim_id), "
        "j2 AS (SELECT x.k AS k, x.label AS label FROM j AS x "
        "       WHERE x.k >= 1) "
        "SELECT k, label FROM j2 ORDER BY k",
    ).collect()
    assert [(r["k"], r["label"]) for r in got] == [
        (1, "d1"), (2, "d2"), (3, "d3"),
    ]


def test_chain_column_spelled_like_cte_stays_correct(spark, cat):
    """A select-list column aliased to a sibling's name must never be
    rewritten — the body declines the substitution (native path) and
    the result is exact."""
    got = lake_sql(
        cat,
        "WITH a AS (SELECT k FROM db.fact WHERE k < 3), "
        "b AS (SELECT k AS a FROM a) "
        "SELECT a FROM b ORDER BY a",
    ).collect()
    assert [r["a"] for r in got] == [0, 1, 2]


def test_chain_comma_join_of_sibling_stays_native_and_correct(spark, cat):
    """A comma join of a resolved sibling is indistinguishable from a
    select-list column without a parser — the body must decline the
    rewrite (native path) and still return exact rows."""
    got = lake_sql(
        cat,
        "WITH a AS (SELECT k FROM db.fact WHERE k < 2), "
        "b AS (SELECT a.k AS ak, d.label AS label FROM a, db.dim d "
        "      WHERE a.k = d.dim_id) "
        "SELECT ak, label FROM b ORDER BY ak",
    ).collect()
    assert [(r["ak"], r["label"]) for r in got] == [(0, "d0"), (1, "d1")]


def test_chain_with_column_list_exposes_renamed_schema(spark, cat):
    """A column list renames positionally; sibling references must see
    the RENAMED names (review r10)."""
    got = lake_sql(
        cat,
        "WITH a (x, d) AS (SELECT k, dim_id FROM db.fact WHERE k < 4), "
        "b AS (SELECT x, d FROM a WHERE x >= 1) "
        "SELECT x, d FROM b ORDER BY x",
    ).collect()
    assert [(r["x"], r["d"]) for r in got] == [(1, 1), (2, 2), (3, 3)]


def test_chain_sibling_with_tablesample_not_mistaken_for_alias(spark, cat):
    """TABLESAMPLE after a sibling reference is a relation suffix, not
    an alias — the rewrite must keep `AS <name>` so qualified refs
    resolve (review r10). 100 PERCENT keeps the result deterministic."""
    got = lake_sql(
        cat,
        "WITH a AS (SELECT k FROM db.fact WHERE k < 3), "
        "b AS (SELECT a.k FROM a TABLESAMPLE (100 PERCENT) "
        "      WHERE a.k >= 0) "
        "SELECT k FROM b ORDER BY k",
    ).collect()
    assert [r["k"] for r in got] == [0, 1, 2]
