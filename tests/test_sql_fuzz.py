"""Grammar-wide randomized differential fuzz battery for ``lake_sql``
(r12, VERDICT r11 "Next round" #1 — the single highest-leverage item).

Each seed builds a fresh catalog (CoW or DV target chosen by the
seed), then runs a sequence of generated statements spanning the whole
supported surface — range/IN-list/LIKE/null/OR predicates, [NOT]
IN/EXISTS subquery terms, scalar subqueries in WHERE / SET /
select-list, CTE chains, scalar + grouped aggregates incl.
COUNT(DISTINCT), DELETE/UPDATE/INSERT — and checks every one against
a materialize-everything ``spark.sql`` twin (rows AND column names;
DML post-state; refusal-leaves-state-untouched) plus DuckDB where
expressible. Failures shrink greedily to a minimal reproducer.

Generator + harness: tools/sqlfuzz.py (run it standalone for wide
sweeps: ``python tools/sqlfuzz.py --seeds 0-49``).
"""

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

from tools.sqlfuzz import SqlFuzzer, gen_statement, render, shrink_candidates


def test_fuzz_differential(spark, tmp_path):
    """Seeds run concurrently (one catalog + seed-suffixed twin views
    each — fully independent state); a failure names its seed in the
    reproducer the harness raises."""
    from concurrent.futures import ThreadPoolExecutor

    def run(seed):
        SqlFuzzer(spark, str(tmp_path), seed).run(14)

    with ThreadPoolExecutor(max_workers=6) as pool:
        for _ in pool.map(run, [0, 1, 2, 3, 4, 5]):
            pass


def test_generator_is_deterministic():
    """Same seed → same statement sequence (reproducibility is the
    whole point of a seeded fuzzer)."""
    import random

    a = [render(gen_statement(random.Random(7))) for _ in range(50)]
    b = [render(gen_statement(random.Random(7))) for _ in range(50)]
    assert a == b


def test_generator_covers_every_kind():
    """The first 200 statements of a seed hit every statement kind —
    a generator regression (dead branch) would silently narrow the
    fuzz surface."""
    import random

    rng = random.Random(3)
    kinds = {gen_statement(rng)["kind"] for _ in range(300)}
    assert kinds == {
        "select",
        "agg",
        "group",
        "union",
        "cte",
        "merge",
        "txn",
        "delete",
        "update",
        "insert",
    }


def test_shrink_yields_smaller_structures():
    st = {
        "kind": "select",
        "items": ["id", "g"],
        "branches": [["g < 3", "h > 1"], ["s IS NULL"]],
        "order": "id",
        "limit": 5,
    }
    cands = list(shrink_candidates(st))
    assert any(len(c["branches"]) == 1 for c in cands)
    assert any(
        sum(len(b) for b in c["branches"]) == 2 for c in cands
    )
    assert any(len(c.get("items", [])) == 1 for c in cands)
    assert any(not c.get("limit") for c in cands)
    for c in cands:
        render(c)  # every candidate renders to valid SQL
