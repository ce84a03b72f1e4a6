"""Join pruning in the generic SELECT path (r8, VERDICT r7 missing #2):
multi-table SELECTs register PRUNED views for tables the statement's
single top-level WHERE provably constrains — the fact side of a
fact-dim join stops reading every live file. Soundness battery: alias
and bare-column attribution, per-branch OR coverage, and the shapes
that must DISABLE pruning (self-joins, subqueries, set ops, ambiguous
columns)."""

import pytest
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.lake.sql_dml import (
    _per_table_branches,
    _top_level_where,
    lake_sql,
)

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
    # local_rows_df: driver-held batches take the r12 driver-write gate
    # (one file per append, same stats — pinned by test_driver_write),
    # saving a Spark write job per append across this battery
    from icebergplus_spark.localrel import local_rows_df

    c = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    fact = c.create_table("db.fact", FACT)
    # four files, k-ranges [0,10) [10,20) [20,30) [30,40)
    for lo in range(0, 40, 10):
        rows = [(k, k % 4, float(k)) for k in range(lo, lo + 10)]
        fact.append(local_rows_df(spark, rows, FACT))
    dim = c.create_table("db.dim", DIM)
    dim.append(local_rows_df(spark, [(i, f"d{i}") for i in range(4)], DIM))
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
    """Pin load_table to shared handles so the recorders see the calls."""
    fact, dim = cat.load_table("db.fact"), cat.load_table("db.dim")
    handles = {"db.fact": fact, "db.dim": dim}
    cat.load_table = lambda ident: handles[ident]
    return fact, dim


JOIN_Q = (
    "SELECT d.label AS label, COUNT(*) AS n "
    "FROM db.fact f JOIN db.dim d ON f.dim_id = d.dim_id "
    "WHERE f.k >= 10 AND f.k < 20 GROUP BY d.label ORDER BY label"
)


def test_fact_side_pruned_in_join(spark, cat):
    fact, dim = _patched(cat)
    calls = _recording(fact, "plan_files_any")
    got = [(r["label"], r["n"]) for r in lake_sql(cat, JOIN_Q).collect()]
    # k 10..19, dim_id = k % 4 → d0:{12,16} d1:{13,17} d2:{10,14,18}
    # d3:{11,15,19}
    assert got == [("d0", 2), ("d1", 2), ("d2", 3), ("d3", 3)]
    assert len(calls) == 1 and len(calls[0]) == 1, calls


def test_bare_column_attribution_unique_owner(spark, cat):
    """`k` exists only in db.fact — a bare-column WHERE prunes it even
    without alias qualification."""
    fact, dim = _patched(cat)
    calls = _recording(fact, "plan_files_any")
    got = lake_sql(
        cat,
        "SELECT f.k AS k, d.label AS label "
        "FROM db.fact f JOIN db.dim d ON f.dim_id = d.dim_id "
        "WHERE k >= 30 ORDER BY k",
    ).collect()
    assert [r["k"] for r in got] == list(range(30, 40))
    assert len(calls) == 1 and len(calls[0]) == 1, calls


def test_ambiguous_bare_column_not_attributed(spark, cat):
    """`dim_id` exists in BOTH tables — a bare dim_id term attributes
    to neither (a statement actually USING one bare would be rejected
    by Spark as AMBIGUOUS_REFERENCE anyway; the extractor must stay on
    the conservative side of that line)."""
    hits = {
        "db.fact": cat.load_table("db.fact"),
        "db.dim": cat.load_table("db.dim"),
    }
    out = _per_table_branches(
        "SELECT f.k FROM db.fact f JOIN db.dim d "
        "ON f.dim_id = d.dim_id WHERE dim_id = 1 AND f.k < 5",
        hits,
    )
    # dim_id skipped everywhere; k still attributes to the fact side
    assert out == {"db.fact": [{"k": ("<", 5)}]}


def test_or_branch_without_fact_term_disables_fact_prune(spark, cat):
    """An OR branch that doesn't constrain the fact table matches any
    fact row — no fact pruning allowed."""
    fact, dim = _patched(cat)
    calls = _recording(fact, "plan_files_any")
    got = lake_sql(
        cat,
        "SELECT COUNT(*) AS n FROM db.fact f JOIN db.dim d "
        "ON f.dim_id = d.dim_id "
        "WHERE (f.k >= 10 AND f.k < 20) OR d.label = 'd1'",
    ).collect()
    # k 10..19 (10 rows) plus d1 rows (k%4==1, 10 rows) minus the
    # overlap {13, 17}
    assert got[0]["n"] == 18
    assert calls == []


def test_or_branches_each_constraining_fact_prune_union(spark, cat):
    fact, dim = _patched(cat)
    calls = _recording(fact, "plan_files_any")
    got = lake_sql(
        cat,
        "SELECT COUNT(*) AS n FROM db.fact f JOIN db.dim d "
        "ON f.dim_id = d.dim_id "
        "WHERE (f.k >= 0 AND f.k < 5) OR (f.k >= 35 AND d.label = 'd3')",
    ).collect()
    assert got[0]["n"] == 5 + 2  # k 0..4, plus {35, 39} (k%4==3, ≥35)
    assert len(calls) == 1 and len(calls[0]) == 2, calls


def test_subquery_and_union_disable_pruning(spark, cat):
    fact, dim = _patched(cat)
    calls = _recording(fact, "plan_files_any")
    n1 = lake_sql(
        cat,
        "SELECT COUNT(*) AS n FROM db.fact f JOIN db.dim d "
        "ON f.dim_id = d.dim_id WHERE f.k IN "
        "(SELECT dim_id FROM db.dim)",
    ).collect()[0]["n"]
    assert n1 == 4  # k 0..3
    q = (
        "SELECT k FROM db.fact f JOIN db.dim d ON f.dim_id = d.dim_id "
        "WHERE f.k < 2 UNION ALL SELECT k FROM db.fact"
    )
    n2 = lake_sql(cat, q).count()
    assert n2 == 2 + 40
    assert calls == []


def test_self_join_disables_pruning(spark, cat):
    fact, dim = _patched(cat)
    calls = _recording(fact, "plan_files_any")
    got = lake_sql(
        cat,
        "SELECT COUNT(*) AS n FROM db.fact a JOIN db.fact b "
        "ON a.dim_id = b.dim_id WHERE a.k < 2 AND b.k >= 30",
    ).collect()
    # a.k in {0,1}, b joined on dim_id: k0→dim0 matches b k∈{32,36} (2),
    # k1→dim1 matches {33,37} (2) → 4 pairs
    assert got[0]["n"] == 4
    assert calls == []


def test_results_match_unpruned_reference(spark, cat):
    """The pruned join returns exactly what a fully-resolved unpruned
    run does, across predicate shapes."""
    fact, dim = _patched(cat)
    fact.to_view("fact_ref")
    dim.to_view("dim_ref")
    for where in (
        "f.k >= 10 AND f.k < 20",
        "f.amount >= 25.0 OR f.k < 3",
        "f.k BETWEEN 7 AND 12 AND d.label != 'd1'",
        "d.label LIKE 'd%' AND f.k >= 38",
    ):
        got = sorted(
            (r["k"], r["label"])
            for r in lake_sql(
                cat,
                "SELECT f.k AS k, d.label AS label FROM db.fact f "
                f"JOIN db.dim d ON f.dim_id = d.dim_id WHERE {where}",
            ).collect()
        )
        want = sorted(
            (r["k"], r["label"])
            for r in fact.spark.sql(
                "SELECT f.k AS k, d.label AS label FROM fact_ref f "
                f"JOIN dim_ref d ON f.dim_id = d.dim_id WHERE {where}"
            ).collect()
        )
        assert got == want and got, where


def test_per_table_branches_unit(spark, cat):
    hits = {
        "db.fact": cat.load_table("db.fact"),
        "db.dim": cat.load_table("db.dim"),
    }
    stmt = (
        "SELECT * FROM db.fact f JOIN db.dim d ON f.dim_id = d.dim_id "
        "WHERE f.k >= 10 AND f.k < 20 AND d.label = 'd1' AND amount > 3"
    )
    out = _per_table_branches(stmt, hits)
    assert out["db.fact"] == [
        {"k": [(">=", 10), ("<", 20)], "amount": (">", 3)}
    ]
    assert out["db.dim"] == [{"label": ("=", "d1")}]
    # join condition in the WHERE (non-literal RHS) is skipped, the
    # literal terms still attribute
    out2 = _per_table_branches(
        "SELECT * FROM db.fact f, db.dim d "
        "WHERE f.dim_id = d.dim_id AND f.k < 5",
        hits,
    )
    assert out2 == {"db.fact": [{"k": ("<", 5)}]}


def test_top_level_where_guards():
    assert _top_level_where("SELECT a FROM t WHERE k > 5 LIMIT 3") == "k > 5"
    assert (
        _top_level_where("SELECT a FROM t WHERE tag = 'GROUP BY x'")
        == "tag = 'GROUP BY x'"
    )
    assert _top_level_where("SELECT a FROM t") is None
    assert (
        _top_level_where("SELECT a FROM t WHERE k IN (SELECT k FROM u)")
        is None
    )
    assert (
        _top_level_where("SELECT a FROM t WHERE k > 1 UNION SELECT a FROM u")
        is None
    )


def test_outer_join_is_null_not_pruned(spark, cat):
    """Self-review r8: LEFT JOIN ... WHERE f.x IS NULL (the anti-join
    idiom) null-extends the fact side — pruning fact files on IS NULL
    would fabricate/drop rows. The dim drives, every dim_id value has
    fact partners, so the true result is empty; with the label filter
    it's rows whose fact side is genuinely missing."""
    fact, dim = _patched(cat)
    calls = _recording(fact, "plan_files_any")
    # dim 0..3 all have fact rows; amount never null in fact files →
    # an IS NULL on the fact side only holds for null-extended rows
    got = lake_sql(
        cat,
        "SELECT d.dim_id AS dim_id FROM db.dim d "
        "LEFT JOIN db.fact f ON d.dim_id = f.dim_id "
        "WHERE f.amount IS NULL",
    ).collect()
    assert got == []  # every dim row has partners — no null-extension
    assert calls == []  # and the fact view was NOT pruned
    # null-REJECTING terms on the null-supplying side stay prunable
    calls2 = _recording(fact, "plan_files_any")
    got2 = sorted(
        r["k"]
        for r in lake_sql(
            cat,
            "SELECT f.k AS k FROM db.dim d "
            "LEFT JOIN db.fact f ON d.dim_id = f.dim_id "
            "WHERE f.k >= 30",
        ).collect()
    )
    assert got2 == list(range(30, 40))
    assert len(calls2) == 1 and len(calls2[0]) == 1


def test_comma_self_join_not_pruned(spark, cat):
    """Self-review r8: 'FROM t a, t b' is a self-join the FROM/JOIN
    alias counter missed — one shared view must not be pruned on one
    context's terms."""
    fact, dim = _patched(cat)
    calls = _recording(fact, "plan_files_any")
    got = lake_sql(
        cat,
        "SELECT a.k AS k FROM db.fact a, db.fact b "
        "WHERE a.k < 2 AND a.dim_id = b.dim_id AND b.k >= 30 "
        "ORDER BY k",
    ).collect()
    # a.k in {0,1}; partners with same dim_id and k>=30 exist for both
    assert sorted({r["k"] for r in got}) == [0, 1]
    assert calls == []


def test_semi_anti_join_disables_bare_column_attribution(spark, cat):
    """ADVICE r8 (high): in a SEMI/ANTI join the right side's columns
    are out of the output scope — a bare WHERE column that exists only
    in the right LAKE table's schema resolves to the LEFT relation with
    no ambiguity error, so bare-column attribution would prune the
    WRONG table. dim file A holds label='keep' keys {0,1}, file B
    label='drop' keys {2,3}; pruning dim on the left view's bare
    `label` would drop file B and let keys 2,3 leak through the ANTI
    join."""
    dim2 = cat.create_table("db.dim2", DIM)
    dim2.append(
        spark.createDataFrame([(0, "keep"), (1, "keep")], DIM).coalesce(1)
    )
    dim2.append(
        spark.createDataFrame([(2, "drop"), (3, "drop")], DIM).coalesce(1)
    )
    handles = {"db.dim2": dim2}
    cat.load_table = lambda ident: handles[ident]
    calls = _recording(dim2, "plan_files_any")
    spark.createDataFrame(
        [(i, "keep") for i in range(6)], DIM
    ).createOrReplaceTempView("ev_semi_anti")
    got = sorted(
        r["dim_id"]
        for r in lake_sql(
            cat,
            "SELECT e.dim_id AS dim_id FROM ev_semi_anti e "
            "LEFT ANTI JOIN db.dim2 d ON e.dim_id = d.dim_id "
            "WHERE label = 'keep'",
        ).collect()
    )
    assert got == [4, 5]  # keys 0..3 all exist in dim2 — excluded
    assert calls == []  # dim2 served UNPRUNED


def test_semi_join_alias_qualified_prune_still_applies(spark, cat):
    """Alias-qualified terms on the PRESERVED side stay prunable under
    SEMI/ANTI (a right-side qualifier is a Spark resolution error, so
    only sound attributions survive)."""
    fact, dim = _patched(cat)
    calls = _recording(fact, "plan_files_any")
    got = sorted(
        r["k"]
        for r in lake_sql(
            cat,
            "SELECT f.k AS k FROM db.fact f "
            "LEFT SEMI JOIN db.dim d ON f.dim_id = d.dim_id "
            "WHERE f.k >= 30",
        ).collect()
    )
    assert got == list(range(30, 40))
    assert len(calls) == 1 and len(calls[0]) == 1, calls


def test_minus_disables_pruning(spark, cat):
    """ADVICE r8 (medium): MINUS is Spark's EXCEPT synonym — a WHERE
    term from the first arm must never prune the second arm's table."""
    assert (
        _top_level_where("SELECT a FROM t WHERE k > 1 MINUS SELECT a FROM u")
        is None
    )
    fact, dim = _patched(cat)
    calls = _recording(dim, "plan_files_any")
    # the view's `label` column shadows db.dim's: attributing the first
    # arm's label='x' to db.dim would prune its only file (labels
    # d0..d3, 'x' outside the stats range) and the MINUS would subtract
    # nothing — returning {0,1} instead of the true empty set
    spark.createDataFrame(
        [(i, "x") for i in range(6)],
        "mk int, label string",
    ).createOrReplaceTempView("mk_view")
    got = lake_sql(
        cat,
        "SELECT mk FROM mk_view WHERE mk < 2 AND label = 'x' "
        "MINUS SELECT dim_id AS mk FROM db.dim",
    ).collect()
    assert got == []  # dim_ids 0..3 subtract both first-arm rows
    assert calls == []


# --------------------------- ON-clause pruning (r9) ---------------------------


def test_inner_join_on_conjunct_prunes_fact(spark, cat):
    """r9 (VERDICT r8 #2): a literal range in the ON clause prunes the
    fact exactly like the WHERE form."""
    fact, dim = _patched(cat)
    calls = _recording(fact, "plan_files_any")
    got = [(r["label"], r["n"]) for r in lake_sql(
        cat,
        "SELECT d.label AS label, COUNT(*) AS n "
        "FROM db.fact f JOIN db.dim d "
        "ON f.dim_id = d.dim_id AND f.k >= 10 AND f.k < 20 "
        "GROUP BY d.label ORDER BY label",
    ).collect()]
    assert got == [("d0", 2), ("d1", 2), ("d2", 3), ("d3", 3)]
    assert len(calls) == 1 and len(calls[0]) == 1, calls


def test_on_and_where_bounds_merge(spark, cat):
    """One bound in WHERE, the other in ON — the merged conjunction
    prunes on BOTH (one of four files survives)."""
    fact, dim = _patched(cat)
    calls = _recording(fact, "plan_files_any")
    got = sorted(r["k"] for r in lake_sql(
        cat,
        "SELECT f.k AS k FROM db.fact f JOIN db.dim d "
        "ON f.dim_id = d.dim_id AND f.k < 20 "
        "WHERE f.k >= 10",
    ).collect())
    assert got == list(range(10, 20))
    assert len(calls) == 1 and len(calls[0]) == 1, calls


def test_left_join_on_prunes_right_side_only(spark, cat):
    """LEFT JOIN: the ON filters the RIGHT side's match candidacy —
    the right table prunes; the preserved LEFT table must not (its
    rows survive a failed ON, null-extended)."""
    fact, dim = _patched(cat)
    # right side (fact) prunable
    calls = _recording(fact, "plan_files_any")
    got = lake_sql(
        cat,
        "SELECT d.dim_id AS dim_id, f.k AS k FROM db.dim d "
        "LEFT JOIN db.fact f ON d.dim_id = f.dim_id AND f.k >= 30",
    ).collect()
    # every dim_id has k>=30 partners: dim_id 0 → {32,36}, 1 → {33,37}…
    assert len(got) == 10 and all(r["k"] >= 30 for r in got)
    assert len(calls) == 1 and len(calls[0]) == 1, calls
    # preserved side (fact on the left) NOT prunable from ON
    calls2 = _recording(fact, "plan_files_any")
    got2 = lake_sql(
        cat,
        "SELECT f.k AS k, d.label AS label FROM db.fact f "
        "LEFT JOIN db.dim d ON f.dim_id = d.dim_id AND f.k < 10",
    ).collect()
    assert len(got2) == 40  # all fact rows survive; k>=10 null-extended
    assert sum(1 for r in got2 if r["label"] is None) == 30
    assert calls2 == []


def test_right_join_on_prunes_left_side_only(spark, cat):
    fact, dim = _patched(cat)
    calls = _recording(fact, "plan_files_any")
    got = lake_sql(
        cat,
        "SELECT f.k AS k, d.dim_id AS dim_id FROM db.fact f "
        "RIGHT JOIN db.dim d ON f.dim_id = d.dim_id AND f.k >= 30",
    ).collect()
    assert len(got) == 10 and all(r["k"] >= 30 for r in got)
    assert len(calls) == 1 and len(calls[0]) == 1, calls
    # preserved side (fact as the RIGHT table) not prunable
    calls2 = _recording(fact, "plan_files_any")
    got2 = lake_sql(
        cat,
        "SELECT f.k AS k FROM db.dim d "
        "RIGHT JOIN db.fact f ON d.dim_id = f.dim_id AND f.k < 10",
    ).collect()
    assert len(got2) == 40
    assert calls2 == []


def test_full_join_on_never_prunes(spark, cat):
    fact, dim = _patched(cat)
    calls = _recording(fact, "plan_files_any")
    got = lake_sql(
        cat,
        "SELECT f.k AS k, d.dim_id AS d_id FROM db.fact f "
        "FULL JOIN db.dim d ON f.dim_id = d.dim_id AND f.k < 10",
    ).collect()
    assert len(got) == 40  # 10 matched + 30 left-only (+0 right-only)
    assert calls == []


def test_anti_join_on_prunes_right_only(spark, cat):
    """LEFT ANTI: the right table's ON terms restrict the exclusion
    set exactly (rows failing them never matched) — prunable. The
    preserved left side is NOT (non-matching rows survive)."""
    fact, dim = _patched(cat)
    calls = _recording(fact, "plan_files_any")
    got = sorted(r["dim_id"] for r in lake_sql(
        cat,
        "SELECT d.dim_id AS dim_id FROM db.dim d "
        "LEFT ANTI JOIN db.fact f "
        "ON d.dim_id = f.dim_id AND f.k >= 35",
    ).collect())
    # k in [35,40): dim_ids {35%4,36%4,37%4,38%4,39%4} = {0,1,2,3} →
    # every dim row excluded
    assert got == []
    assert len(calls) == 1 and len(calls[0]) == 1, calls
    # left side of the anti must never prune on ON terms
    calls2 = _recording(fact, "plan_files_any")
    got2 = sorted(r["k"] for r in lake_sql(
        cat,
        "SELECT f.k AS k FROM db.fact f "
        "LEFT ANTI JOIN db.dim d ON f.dim_id = d.dim_id AND f.k < 10",
    ).collect())
    assert got2 == list(range(10, 40))  # k>=10 never match → survive
    assert calls2 == []


def test_on_bare_column_out_of_scope_not_attributed(spark, cat):
    """A bare column in ON #1 that is unique to a lake table joined
    LATER resolves against the in-scope relations (here the non-lake
    view) — attributing it to the later table would prune wrongly."""
    hits = {
        "db.fact": cat.load_table("db.fact"),
        "db.dim": cat.load_table("db.dim"),
    }
    out = _per_table_branches(
        # `label` is unique to db.dim among lake tables, but db.dim is
        # NOT in scope of the first ON — ev.label is what Spark sees
        "SELECT * FROM ev e JOIN db.fact f "
        "ON e.id = f.k AND label = 'x' "
        "JOIN db.dim d ON f.dim_id = d.dim_id",
        hits,
    )
    assert "db.dim" not in out
    # and nothing attributed `label` to the fact either
    assert all("label" not in b for b in out.get("db.fact", []))


def test_disjunctive_on_conjunct_prunes(spark, cat):
    """r10 (VERDICT r9 #4): a parenthesized OR conjunct in the ON
    distributes over the branch set — files matching NEITHER
    alternative are pruned (two of four here), results exact."""
    fact, dim = _patched(cat)
    calls = _recording(fact, "plan_files_any")
    got = sorted(r["k"] for r in lake_sql(
        cat,
        "SELECT f.k AS k FROM db.fact f JOIN db.dim d "
        "ON f.dim_id = d.dim_id AND (f.k < 5 OR f.k >= 35)",
    ).collect())
    assert got == [0, 1, 2, 3, 4, 35, 36, 37, 38, 39]
    assert len(calls) == 1 and len(calls[0]) == 2, calls


def test_top_level_or_on_prunes(spark, cat):
    """A top-level disjunctive ON — every alternative constrains the
    fact, so the union of alternatives prunes (2 of 4 files)."""
    fact, dim = _patched(cat)
    calls = _recording(fact, "plan_files_any")
    got = sorted(r["k"] for r in lake_sql(
        cat,
        "SELECT f.k AS k FROM db.fact f JOIN db.dim d "
        "ON (f.dim_id = d.dim_id AND f.k < 5) "
        "OR (f.dim_id = d.dim_id AND f.k >= 35)",
    ).collect())
    assert got == [0, 1, 2, 3, 4, 35, 36, 37, 38, 39]
    assert len(calls) == 1 and len(calls[0]) == 2, calls


def test_disjunctive_on_branch_without_term_disables(spark, cat):
    """An OR alternative that doesn't constrain the fact (dim-only
    term) makes the clause unusable for the fact — rows may match via
    that alternative from ANY file."""
    fact, dim = _patched(cat)
    calls = _recording(fact, "plan_files_any")
    got = sorted(r["k"] for r in lake_sql(
        cat,
        "SELECT f.k AS k FROM db.fact f JOIN db.dim d "
        "ON f.dim_id = d.dim_id AND (f.k < 5 OR d.label = 'd2')",
    ).collect())
    # alt2 matches every k with dim_id=2: k%4==2 → 2,6,...,38
    assert got == sorted(
        set(range(0, 5)) | {k for k in range(40) if k % 4 == 2}
    )
    assert calls == []


def test_disjunctive_on_left_join_right_side_only(spark, cat):
    """Side gating applies to disjunctive ONs exactly like conjunctive
    ones: LEFT JOIN prunes only the right table per alternative."""
    fact, dim = _patched(cat)
    calls = _recording(fact, "plan_files_any")
    got = lake_sql(
        cat,
        "SELECT d.dim_id AS dim_id, f.k AS k FROM db.dim d "
        "LEFT JOIN db.fact f "
        "ON d.dim_id = f.dim_id AND (f.k >= 35 OR f.k < 3)",
    ).collect()
    matched = [r for r in got if r["k"] is not None]
    assert all(r["k"] >= 35 or r["k"] < 3 for r in matched)
    assert len(calls) == 1 and len(calls[0]) == 2, calls
    # preserved side: fact on the LEFT must NOT prune from the ON
    calls2 = _recording(fact, "plan_files_any")
    got2 = lake_sql(
        cat,
        "SELECT f.k AS k FROM db.fact f LEFT JOIN db.dim d "
        "ON f.dim_id = d.dim_id AND (f.k < 5 OR f.k >= 35)",
    ).collect()
    assert len(got2) == 40
    assert calls2 == []


def test_disjunctive_on_results_match_unpruned(spark, cat):
    """Disjunctive-ON joins return exactly what unpruned SQL does."""
    fact, dim = _patched(cat)
    fact.to_view("fact_dor_ref")
    dim.to_view("dim_dor_ref")
    shapes = [
        "SELECT f.k AS k, d.label AS label FROM {f} f JOIN {d} d "
        "ON f.dim_id = d.dim_id AND (f.k BETWEEN 2 AND 6 OR f.k >= 37)",
        "SELECT d.dim_id AS i, f.k AS k FROM {d} d LEFT JOIN {f} f "
        "ON d.dim_id = f.dim_id AND (f.amount < 4.0 OR f.amount >= 38.0)",
        "SELECT f.k AS k FROM {f} f JOIN {d} d "
        "ON (f.dim_id = d.dim_id AND f.k IN (1, 2)) "
        "OR (f.dim_id = d.dim_id AND f.k = 39)",
    ]
    key = lambda t: tuple((v is None, v) for v in t)
    for q in shapes:
        got = sorted(
            (tuple(r) for r in lake_sql(
                cat, q.format(f="db.fact", d="db.dim")
            ).collect()),
            key=key,
        )
        want = sorted(
            (tuple(r) for r in fact.spark.sql(
                q.format(f="fact_dor_ref", d="dim_dor_ref")
            ).collect()),
            key=key,
        )
        assert got == want and got, q


def test_on_results_match_unpruned_reference(spark, cat):
    """ON-pruned joins return exactly what fully-resolved unpruned SQL
    does across join types."""
    fact, dim = _patched(cat)
    fact.to_view("fact_on_ref")
    dim.to_view("dim_on_ref")
    shapes = [
        "SELECT f.k AS k, d.label AS label FROM {f} f JOIN {d} d "
        "ON f.dim_id = d.dim_id AND f.k BETWEEN 12 AND 27",
        "SELECT d.dim_id AS i, f.k AS k FROM {d} d LEFT JOIN {f} f "
        "ON d.dim_id = f.dim_id AND f.amount >= 33.0",
        "SELECT f.k AS k, d.label AS label FROM {f} f RIGHT JOIN {d} d "
        "ON f.dim_id = d.dim_id AND f.k >= 38",
        "SELECT f.k AS k FROM {f} f LEFT SEMI JOIN {d} d "
        "ON f.dim_id = d.dim_id AND f.k < 7",
    ]
    key = lambda t: tuple((v is None, v) for v in t)
    for q in shapes:
        got = sorted(
            (tuple(r) for r in lake_sql(
                cat, q.format(f="db.fact", d="db.dim")
            ).collect()),
            key=key,
        )
        want = sorted(
            (tuple(r) for r in fact.spark.sql(
                q.format(f="fact_on_ref", d="dim_on_ref")
            ).collect()),
            key=key,
        )
        assert got == want and got, q
