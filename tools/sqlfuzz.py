"""Grammar-wide randomized differential fuzzer for ``lake_sql``
(r12, VERDICT r11 "Next round" #1).

``lake/sql_dml.py`` is ~4k lines of hand-rolled string rewriting
guarding dozens of fast paths, and every round's self-review has found
real bugs in exactly that layer. This fuzzer generalizes r11's
randomized multi-conjunct mini-oracle to the WHOLE supported surface:

- WHERE grammar: ranges, BETWEEN, IN-lists, LIKE, IS [NOT] NULL,
  OR-of-conjunctions, scalar-subquery comparisons, [NOT] IN / EXISTS
  subquery terms (SELECT and DML positions);
- select shapes: projections (aliased and deliberately UNALIASED
  computed items — the schema-divergence trap), scalar aggregates
  incl. COUNT(DISTINCT), grouped aggregates, CTE chains, select-list
  scalar subqueries, ORDER BY/LIMIT;
- DML: DELETE / UPDATE (multi-assignment SET with stacked scalar
  subqueries) / INSERT INTO ... SELECT, against CoW and DV tables;
- grouped HAVING (alias form) and UNION ALL pairs;
- MERGE against a unique-key lake source: matched update/delete with
  mixed target/source conditions, NOT MATCHED INSERT *, upsert, and
  NOT MATCHED BY SOURCE delete;
- BEGIN/COMMIT transaction blocks (2-3 sequential DMLs, one CAS) with
  a sequential-composition twin — INSERT sources pin the pre-txn
  snapshot, matching the engine's parse-time scan pinning.

Differential oracles:
1. the MATERIALIZE-EVERYTHING ``spark.sql`` twin: every lake table's
   current rows are collected and re-registered as plain temp views;
   the statement (lake identifiers rewritten to the views) runs
   through stock Spark — no fast paths, no manifest folds, no pruned
   merges. SELECTs must match rows AND column names; DML must leave
   the table equal to the twin-computed post-state; a refusal
   (UnsupportedSQL) must leave the table UNCHANGED.
2. DuckDB, where expressible: SELECT statements also run against the
   same rows registered in DuckDB (values only — DuckDB's
   auto-generated column names differ by design). A DuckDB
   parse/bind error skips that check (coverage loss, never masking a
   mismatch).

Statements are generated as STRUCTURES (branch lists, item lists,
assignment lists), so a failure shrinks greedily — drop an atom, a
branch, an item, a clause — while it still reproduces, and the
minimal statement is reported with seed + step for a committed
regression test.

Run standalone for wide sweeps:  python tools/sqlfuzz.py --seeds 0-49
The committed pytest battery (tests/test_sql_fuzz.py) pins >=6 seeds.
"""

from __future__ import annotations

import random
from typing import Any

SEL_COLS = ["id", "g", "h", "s", "v"]
VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", None]
LIKE_PATS = ["al%", "%ta", "%e%", "be_a", "%a"]


# --------------------------------------------------------------------------
# generation
# --------------------------------------------------------------------------
def _atom(rng: random.Random, dml: bool) -> str:
    """One predicate atom over db.t's columns. ``dml`` biases away from
    shapes the DML grammar loudly refuses (they are still generated —
    refusals must leave state untouched, which the harness asserts)."""
    roll = rng.random()
    if roll < 0.14:
        op = rng.choice(["<", "<=", ">", ">=", "=", "!="])
        return f"g {op} {rng.randint(0, 5)}"
    if roll < 0.26:
        op = rng.choice(["<", "<=", ">", ">=", "=", "!="])
        return f"id {op} {rng.randint(0, 60)}"
    if roll < 0.36:
        op = rng.choice(["<", "<=", ">", ">="])
        return f"v {op} {rng.randint(-2, 40)}.5"
    if roll < 0.44:
        a = rng.randint(0, 20)
        return f"h BETWEEN {a} AND {a + rng.randint(0, 8)}"
    if roll < 0.52:
        vals = sorted(rng.sample(range(6), rng.randint(1, 3)))
        return f"g IN ({', '.join(str(x) for x in vals)})"
    if roll < 0.60:
        return f"s LIKE '{rng.choice(LIKE_PATS)}'"
    if roll < 0.68:
        col = rng.choice(["s", "g", "h"])
        return f"{col} IS {rng.choice(['NULL', 'NOT NULL'])}"
    if roll < 0.80:
        neg = rng.random() < 0.4
        ktab = rng.choice(["db.k1", "db.k2"])
        inner = (
            f" WHERE k {rng.choice(['<', '>', '<='])} {rng.randint(0, 20)}"
            if rng.random() < 0.5
            else ""
        )
        return (
            f"h {'NOT IN' if neg else 'IN'} "
            f"(SELECT k FROM {ktab}{inner})"
        )
    if roll < 0.88:
        ktab = rng.choice(["db.k1", "db.k2"])
        if not dml and rng.random() < 0.5:
            # correlated EXISTS — SELECT twin territory
            return f"EXISTS (SELECT 1 FROM {ktab} WHERE k = g)"
        return (
            f"EXISTS (SELECT 1 FROM {ktab} "
            f"WHERE k > {rng.randint(0, 18)})"
        )
    agg = rng.choice(
        [
            "(SELECT MAX(k) FROM db.k1)",
            "(SELECT MIN(k) FROM db.k2)",
            "(SELECT COUNT(*) FROM db.k1)",
            "(SELECT COUNT(DISTINCT k) FROM db.k2)",
        ]
    )
    col = rng.choice(["g", "h", "id"])
    return f"{col} {rng.choice(['<', '>=', '<='])} {agg}"


def _branches(rng: random.Random, dml: bool) -> list[list[str]]:
    """OR-of-conjunctions: 1-2 branches of 1-3 atoms each."""
    nb = 1 if rng.random() < 0.7 else 2
    return [
        [_atom(rng, dml) for _ in range(rng.randint(1, 3))]
        for _ in range(nb)
    ]


def _render_where(branches: list[list[str]]) -> str | None:
    branches = [b for b in branches if b]
    if not branches:
        return None
    if len(branches) == 1:
        return " AND ".join(branches[0])
    return " OR ".join("(" + " AND ".join(b) + ")" for b in branches)


_SCALAR_ITEMS = [
    "(SELECT COUNT(*) FROM db.k1) AS nk1",
    "(SELECT MAX(k) FROM db.k2) AS mk2",
    "(SELECT COUNT(*) FROM db.k1) + 1",  # UNALIASED: names must match
]
_AGG_ITEMS = [
    "COUNT(*) AS cnt",
    "COUNT(g) AS cg",
    "COUNT(DISTINCT g) AS cdg",
    "COUNT(DISTINCT h) AS cdh",
    "SUM(h) AS sh",
    "SUM(g) AS sg",
    "MIN(id) AS mni",
    "MAX(id) AS mxi",
    "MIN(s) AS mns",
    "MAX(v) AS mxv",
    "AVG(h) AS ah",
]


def gen_statement(rng: random.Random) -> dict[str, Any]:
    """One random statement STRUCTURE (rendered by :func:`render`)."""
    roll = rng.random()
    if roll < 0.18:  # plain/expression projection
        items = rng.sample(SEL_COLS, rng.randint(1, 4))
        if rng.random() < 0.4:
            items.append(rng.choice(["g + h AS gh", "id * 2 AS id2"]))
        if rng.random() < 0.35:
            items.append(rng.choice(_SCALAR_ITEMS))
        st = {
            "kind": "select",
            "items": items,
            "branches": _branches(rng, False),
        }
        if rng.random() < 0.3 and "id" in items:
            st["order"] = "id"
            st["limit"] = rng.randint(1, 25)
        return st
    if roll < 0.34:  # scalar aggregates
        return {
            "kind": "agg",
            "items": rng.sample(_AGG_ITEMS, rng.randint(1, 4)),
            "branches": _branches(rng, False) if rng.random() < 0.6 else [],
        }
    if roll < 0.48:  # grouped aggregates
        st = {
            "kind": "group",
            "group": rng.choice(["g", "h", "s"]),
            "items": rng.sample(_AGG_ITEMS, rng.randint(1, 3)),
            "branches": _branches(rng, False) if rng.random() < 0.5 else [],
        }
        if rng.random() < 0.35:
            # alias-form HAVING (the lake fast path's supported shape)
            if "COUNT(*) AS cnt" not in st["items"]:
                st["items"].append("COUNT(*) AS cnt")
            st["having"] = f"cnt {rng.choice(['>', '>=', '<'])} {rng.randint(1, 8)}"
        return st
    if roll < 0.52:  # UNION ALL of two filtered projections
        return {
            "kind": "union",
            "branches": _branches(rng, False),
            "branches2": _branches(rng, False),
        }
    if roll < 0.56:  # CTE chain
        return {
            "kind": "cte",
            "branches": _branches(rng, False),
            "branches2": _branches(rng, False),
            "items": rng.sample(
                ["id", "g", "h", "v", "COUNT(*) OVER () AS n"],
                rng.randint(1, 3),
            ),
            "chain": rng.random() < 0.5,
        }
    if roll < 0.62:  # MERGE (unique-key source)
        action = rng.choice(
            ["update", "delete", "insert_only", "upsert", "bys_delete"]
        )
        st = {"kind": "merge", "action": action, "cond": None}
        if action in ("update", "delete"):
            st["cond"] = rng.choice(
                [
                    None,
                    "s.v2 < 20.0",
                    "t.g >= 2",
                    "t.h IS NOT NULL AND s.g2 > 1",
                ]
            )
        elif action == "bys_delete":
            st["cond"] = rng.choice([None, "t.g >= 2", "t.h < 10"])
        if action == "update":
            st["sets"] = rng.choice(
                [
                    ["t.v = s.v2"],
                    ["t.v = s.v2 + 1.0", "t.h = t.h + 100"],
                    ["t.g = s.g2"],
                ]
            )
        elif action == "upsert":
            st["sets"] = ["t.v = s.v2"]
        return st
    if roll < 0.66:  # transaction block: 2-3 sequential DMLs, one CAS
        inner = []
        for _ in range(rng.randint(2, 3)):
            r2 = rng.random()
            if r2 < 0.45:
                inner.append(
                    {"kind": "delete", "branches": _branches(rng, True)}
                )
            elif r2 < 0.8:
                inner.append(
                    {
                        "kind": "update",
                        "sets": rng.sample(
                            ["v = -1.0", "s = 'txn'", "h = h + 100"],
                            rng.randint(1, 2),
                        ),
                        "branches": _branches(rng, True),
                    }
                )
            else:
                inner.append(
                    {"kind": "insert", "branches": _branches(rng, True)}
                )
        return {"kind": "txn", "inner": inner}
    if roll < 0.80:  # DELETE
        return {"kind": "delete", "branches": _branches(rng, True)}
    if roll < 0.94:  # UPDATE
        n_sets = rng.randint(1, 3)
        pool = [
            "v = -1.0",
            "v = v + 0.5",
            "s = 'upd'",
            "h = h + 100",
            "h = (SELECT MIN(k) FROM db.k2)",
            "v = CAST((SELECT COUNT(*) FROM db.k1) AS DOUBLE) + "
            "CAST((SELECT COUNT(*) FROM db.k2) AS DOUBLE)",
            "g = (SELECT MAX(k) FROM db.k1) + (SELECT MIN(k) FROM db.k1)"
            " + (SELECT COUNT(*) FROM db.k2)",  # stacked scalar spans
        ]
        return {
            "kind": "update",
            "sets": rng.sample(pool, n_sets),
            "branches": _branches(rng, True),
        }
    return {  # INSERT INTO ... SELECT
        "kind": "insert",
        "branches": _branches(rng, False),
    }


def render(st: dict[str, Any]) -> str:
    where = _render_where(st.get("branches", []))
    w = f" WHERE {where}" if where else ""
    if st["kind"] == "select":
        sql = f"SELECT {', '.join(st['items'])} FROM db.t{w}"
        if st.get("order"):
            sql += f" ORDER BY {st['order']}"
        if st.get("limit"):
            sql += f" LIMIT {st['limit']}"
        return sql
    if st["kind"] == "agg":
        return f"SELECT {', '.join(st['items'])} FROM db.t{w}"
    if st["kind"] == "group":
        g = st["group"]
        sql = (
            f"SELECT {g}, {', '.join(st['items'])} FROM db.t{w} "
            f"GROUP BY {g}"
        )
        if st.get("having"):
            sql += f" HAVING {st['having']}"
        return sql
    if st["kind"] == "union":
        w2 = _render_where(st.get("branches2", []))
        return (
            f"SELECT id, g, v FROM db.t{w} UNION ALL "
            f"SELECT id, g, v FROM db.t"
            + (f" WHERE {w2}" if w2 else "")
        )
    if st["kind"] == "cte":
        w2 = _render_where(st.get("branches2", []))
        base = f"c1 AS (SELECT id, g, h, s, v FROM db.t{w})"
        if st.get("chain"):
            mid = "c2 AS (SELECT id, g, h, v FROM c1"
            mid += f" WHERE {w2})" if w2 else ")"
            tail = f"SELECT {', '.join(st['items'])} FROM c2"
            return f"WITH {base}, {mid} {tail}"
        tail = f"SELECT {', '.join(st['items'])} FROM c1"
        if w2:
            tail += f" WHERE {w2}"
        return f"WITH {base} {tail}"
    if st["kind"] == "txn":
        body = "; ".join(render(s) for s in st["inner"])
        return f"BEGIN; {body}; COMMIT"
    if st["kind"] == "merge":
        cond = f" AND {st['cond']}" if st.get("cond") else ""
        head = "MERGE INTO db.t t USING db.msrc s ON t.id = s.id "
        if st["action"] == "delete":
            return head + f"WHEN MATCHED{cond} THEN DELETE"
        if st["action"] == "update":
            return (
                head
                + f"WHEN MATCHED{cond} THEN UPDATE SET "
                + ", ".join(st["sets"])
            )
        if st["action"] == "insert_only":
            return head + "WHEN NOT MATCHED THEN INSERT *"
        if st["action"] == "upsert":
            return (
                head
                + "WHEN MATCHED THEN UPDATE SET "
                + ", ".join(st["sets"])
                + " WHEN NOT MATCHED THEN INSERT *"
            )
        # bys_delete
        return head + f"WHEN NOT MATCHED BY SOURCE{cond} THEN DELETE"
    if st["kind"] == "delete":
        return f"DELETE FROM db.t{w}" if where else "DELETE FROM db.t WHERE id < 0"
    if st["kind"] == "update":
        return f"UPDATE db.t SET {', '.join(st['sets'])}{w}"
    if st["kind"] == "insert":
        return (
            "INSERT INTO db.t "
            f"SELECT id + 1000, g, h, s, v FROM db.t{w}"
        )
    raise AssertionError(st["kind"])


def shrink_candidates(st: dict[str, Any]):
    """Smaller variants of a statement structure, largest cuts first."""
    for key in ("branches", "branches2"):
        brs = st.get(key) or []
        for i in range(len(brs)):
            if len(brs) > 1:
                yield {**st, key: brs[:i] + brs[i + 1:]}
        for i, b in enumerate(brs):
            for j in range(len(b)):
                nb = b[:j] + b[j + 1:]
                new = [x for x in brs[:i]] + ([nb] if nb else []) + brs[i + 1:]
                if new != brs:
                    yield {**st, key: new}
    items = st.get("items") or []
    if len(items) > 1:
        for i in range(len(items)):
            yield {**st, "items": items[:i] + items[i + 1:]}
    sets = st.get("sets") or []
    if len(sets) > 1:
        for i in range(len(sets)):
            yield {**st, "sets": sets[:i] + sets[i + 1:]}
    inner = st.get("inner") or []
    if len(inner) > 1:
        for i in range(len(inner)):
            yield {**st, "inner": inner[:i] + inner[i + 1:]}
    for i, s in enumerate(inner):
        for cand in shrink_candidates(s):
            yield {**st, "inner": inner[:i] + [cand] + inner[i + 1:]}
    if st.get("order") or st.get("limit"):
        # dropped together: LIMIT without ORDER BY is a nondeterministic
        # subset — both engines would legitimately disagree
        yield {**st, "order": None, "limit": None}
    if st.get("chain"):
        yield {**st, "chain": None}
    if st.get("cond"):
        yield {**st, "cond": None}
    if st.get("having"):
        yield {**st, "having": None}


# --------------------------------------------------------------------------
# harness
# --------------------------------------------------------------------------
class SqlFuzzer:
    """One seeded differential run against a fresh catalog."""

    TABLES = {
        "db.t": "fz_t",
        "db.k1": "fz_k1",
        "db.k2": "fz_k2",
        "db.msrc": "fz_msrc",
    }

    def __init__(self, spark, workdir: str, seed: int, duckdb: bool = True):
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StringType,
            StructField,
            StructType,
        )

        from icebergplus_spark.lake import LocalLakeCatalog

        self.spark = spark
        self.rng = random.Random(seed)
        self.seed = seed
        self.duckdb = duckdb
        # seed-unique temp-view names so concurrent seeds (the pytest
        # battery thread-pools them) never clobber each other's twins
        sfx = f"_s{seed}"
        self.TABLES = {i: v + sfx for i, v in SqlFuzzer.TABLES.items()}
        self._vt = self.TABLES["db.t"]
        self._vpre = "fz_t_pre" + sfx
        self._vstep = "fz_t_step" + sfx
        self.T = StructType(
            [
                StructField("id", LongType(), True),
                StructField("g", LongType(), True),
                StructField("h", LongType(), True),
                StructField("s", StringType(), True),
                StructField("v", DoubleType(), True),
            ]
        )
        self.K = StructType([StructField("k", LongType(), True)])
        self._row_cache: dict[str, list[tuple]] = {}
        self._views_fresh = False
        self.cat = LocalLakeCatalog(spark, f"{workdir}/wh{seed}").start()
        t = self.cat.create_table("db.t", self.T)
        if self.rng.random() < 0.4:
            t.set_property("delete.representation", "dv")
        nid = 0
        for _ in range(self.rng.randint(2, 3)):  # several files
            rows = []
            for _ in range(self.rng.randint(12, 25)):
                rows.append(
                    (
                        nid,
                        self.rng.choice([None] + list(range(6))),
                        self.rng.choice([None] + list(range(26))),
                        self.rng.choice(VOCAB),
                        round(self.rng.uniform(-5, 45), 3),
                    )
                )
                nid += 1
            t.append(spark.createDataFrame(rows, self.T).coalesce(2))
        for name in ("db.k1", "db.k2"):
            kt = self.cat.create_table(name, self.K)
            n = self.rng.randint(0, 8)
            vals = [
                self.rng.choice([None] + list(range(26)))
                for _ in range(n)
            ]
            if vals:
                kt.append(spark.createDataFrame([(x,) for x in vals], self.K))
        # MERGE source: UNIQUE ids (SQL MERGE forbids multi-match),
        # partially overlapping db.t's id range, in two files
        self.M = StructType(
            [
                StructField("id", LongType(), True),
                StructField("v2", DoubleType(), True),
                StructField("g2", LongType(), True),
            ]
        )
        ms = self.cat.create_table("db.msrc", self.M)
        ids = self.rng.sample(range(0, nid + 20), self.rng.randint(5, 25))
        rows = [
            (i, round(self.rng.uniform(-5, 45), 3), self.rng.randint(0, 5))
            for i in sorted(ids)
        ]
        half = len(rows) // 2
        for chunk in (rows[:half], rows[half:]):
            if chunk:
                ms.append(spark.createDataFrame(chunk, self.M).coalesce(1))

    # -- state + twins -----------------------------------------------------
    def _rows(self, ident: str) -> list[tuple]:
        # k tables are never mutated; db.t's cache is dropped after DML
        cached = self._row_cache.get(ident)
        if cached is None:
            t = self.cat.load_table(ident)
            cached = [tuple(r) for r in t.scan().collect()]
            self._row_cache[ident] = cached
        return cached

    def _schema_of(self, ident: str):
        if ident == "db.t":
            return self.T
        if ident == "db.msrc":
            return self.M
        return self.K

    def _register_views(self) -> None:
        if self._views_fresh:
            return
        for ident, view in self.TABLES.items():
            self.spark.createDataFrame(
                self._rows(ident), self._schema_of(ident)
            ).createOrReplaceTempView(view)
        self._views_fresh = True

    def _rewrite(self, sql: str) -> str:
        for ident, view in self.TABLES.items():
            sql = sql.replace(ident, view)
        return sql

    @staticmethod
    def _canon(rows) -> list[tuple]:
        def norm(v):
            if isinstance(v, float):
                return round(v, 6)
            if hasattr(v, "as_py"):
                v = v.as_py()
            if type(v).__name__ == "Decimal":
                return round(float(v), 6)
            return v

        return sorted(
            (tuple(norm(v) for v in r) for r in rows), key=repr
        )

    def _duck_check(self, sql: str, want_rows) -> str | None:
        """Secondary oracle: same statement, same rows, DuckDB. Values
        only (its auto column names differ). A parse/bind error skips
        (returns None) — never masks a mismatch."""
        try:
            import duckdb
            import pandas as pd
        except Exception:
            return None
        con = duckdb.connect()
        try:
            for ident, view in self.TABLES.items():
                schema = self._schema_of(ident)
                pdf = pd.DataFrame(
                    self._rows(ident), columns=schema.fieldNames()
                )
                for f in schema.fields:
                    if f.dataType.simpleString() == "bigint":
                        pdf[f.name] = pdf[f.name].astype("Int64")
                con.register(view, pdf)
            try:
                got = con.execute(self._rewrite(sql)).fetchall()
            except Exception:
                return None  # not expressible in DuckDB — skip
            got = [
                tuple(None if v is None or v != v else v for v in r)
                if any(isinstance(v, float) for v in r)
                else r
                for r in got
            ]
            if self._canon(got) != self._canon(want_rows):
                return (
                    f"duckdb mismatch: {len(got)} rows vs "
                    f"{len(want_rows)} spark rows"
                )
            return None
        finally:
            con.close()

    # -- per-statement check -------------------------------------------------
    def check(self, st: dict[str, Any]) -> str | None:
        """Run one statement both ways; return a mismatch description or
        None. Raises nothing for UnsupportedSQL (that path asserts
        state is untouched)."""
        from icebergplus_spark.lake.sql_dml import UnsupportedSQL, lake_sql

        sql = render(st)
        if st["kind"] in ("select", "agg", "group", "cte", "union"):
            self._register_views()
            want = self.spark.sql(self._rewrite(sql))
            want_cols, want_rows = want.columns, want.collect()
            try:
                got = lake_sql(self.cat, sql)
            except Exception as e:  # SELECTs must never refuse: native path
                return f"SELECT raised {type(e).__name__}: {e}"
            got_cols, got_rows = got.columns, got.collect()
            if got_cols != want_cols:
                return f"columns {got_cols} != native {want_cols}"
            if self._canon(got_rows) != self._canon(want_rows):
                return (
                    f"rows differ: {len(got_rows)} vs {len(want_rows)}; "
                    f"sample got={self._canon(got_rows)[:3]} "
                    f"want={self._canon(want_rows)[:3]}"
                )
            if self.duckdb:
                return self._duck_check(sql, want_rows)
            return None

        # DML: expected post-state from the materialized twin
        import re as _re

        pre = self._rows("db.t")
        self._register_views()
        if st["kind"] == "txn":
            # sequential composition on the evolving state; INSERT
            # sources evaluate against the PRE-txn snapshot (their
            # lake scans pin file lists at parse time). A refusal
            # anywhere aborts the whole block — state untouched.
            self.spark.createDataFrame(
                pre, self.T
            ).createOrReplaceTempView(self._vpre)
            cur = list(pre)
            for inner in st["inner"]:
                self.spark.createDataFrame(
                    cur, self.T
                ).createOrReplaceTempView(self._vstep)
                w = (
                    _render_where(inner.get("branches", []))
                    or "id < 0"
                )
                c = f"coalesce(({self._rewrite(w)}), false)"
                if inner["kind"] == "delete":
                    q = f"SELECT * FROM {self._vstep} WHERE NOT {c}"
                elif inner["kind"] == "update":
                    assigns = {}
                    for term in inner["sets"]:
                        col, _, expr = term.partition("=")
                        assigns[col.strip()] = self._rewrite(expr.strip())
                    types = {
                        f.name: f.dataType.simpleString()
                        for f in self.T.fields
                    }
                    items = [
                        (
                            f"CAST(CASE WHEN {c} THEN ({assigns[x]}) "
                            f"ELSE {x} END AS {types[x]}) AS {x}"
                            if x in assigns
                            else x
                        )
                        for x in self.T.fieldNames()
                    ]
                    q = f"SELECT {', '.join(items)} FROM {self._vstep}"
                else:  # insert — source is the PRE-txn snapshot
                    c_pre = c.replace(self._vt, self._vpre)
                    q = (
                        f"SELECT * FROM {self._vstep} UNION ALL "
                        f"SELECT id + 1000, g, h, s, v FROM {self._vpre} "
                        f"WHERE {c_pre}"
                    )
                cur = [tuple(r) for r in self.spark.sql(q).collect()]
            expected = cur
            try:
                lake_sql(self.cat, sql)
            except UnsupportedSQL:
                expected = pre
            self._row_cache.pop("db.t", None)
            self._views_fresh = False
            post = self._rows("db.t")
            if self._canon(post) != self._canon(expected):
                return (
                    f"txn post-state differs: {len(post)} rows vs "
                    f"{len(expected)} expected (pre={len(pre)})"
                )
            return None
        if st["kind"] == "merge":
            # unique-key source, so s.col resolves as a correlated
            # scalar subquery in the twin
            mcond = st.get("cond")
            inner = "ms.id = fz_t.id"
            if mcond and st["action"] in ("update", "delete"):
                tw = _re.sub(r"\bt\.", "fz_t.", mcond)
                tw = _re.sub(r"\bs\.", "ms.", tw)
                inner += " AND (" + tw + ")"
            vt, vms = self._vt, self.TABLES["db.msrc"]
            match = (
                f"coalesce(EXISTS (SELECT 1 FROM {vms} ms WHERE {inner})"
                ", false)"
            )
            insert_leg = (
                " UNION ALL SELECT ms.id, CAST(NULL AS BIGINT), "
                "CAST(NULL AS BIGINT), CAST(NULL AS STRING), "
                f"CAST(NULL AS DOUBLE) FROM {vms} ms WHERE NOT EXISTS "
                f"(SELECT 1 FROM {vt} AS fz_t WHERE fz_t.id = ms.id)"
            )
            if st["action"] == "delete":
                expect_sql = (
                    f"SELECT * FROM {vt} AS fz_t WHERE NOT {match}"
                )
            elif st["action"] == "insert_only":
                expect_sql = (
                    f"SELECT * FROM {vt} AS fz_t" + insert_leg
                )
            elif st["action"] == "bys_delete":
                # BY SOURCE delete fires on target rows with NO source
                # match (and the target-only condition); keep = matched
                # OR NOT cond
                keep = match
                if mcond:
                    c_t = _re.sub(r"\bt\.", "fz_t.", mcond)
                    keep = (
                        f"({match} OR NOT coalesce(({c_t}), false))"
                    )
                expect_sql = (
                    f"SELECT * FROM {vt} AS fz_t WHERE {keep}"
                )
            elif st["action"] == "upsert":
                expect_sql = (
                    "SELECT id, g, h, s, CAST(CASE WHEN "
                    + match
                    + f" THEN (SELECT ms.v2 FROM {vms} ms WHERE "
                    + inner
                    + ") ELSE v END AS double) AS v "
                    f"FROM {vt} AS fz_t" + insert_leg
                )
            else:
                assigns = {}
                for term in st["sets"]:
                    col, _, expr = term.partition("=")
                    expr = _re.sub(
                        r"\bs\.(\w+)",
                        rf"(SELECT ms.\1 FROM {vms} ms WHERE "
                        + inner
                        + ")",
                        expr.strip(),
                    )
                    expr = _re.sub(r"\bt\.", "fz_t.", expr)
                    assigns[col.strip().removeprefix("t.")] = expr
                types = {
                    f.name: f.dataType.simpleString()
                    for f in self.T.fields
                }
                items = [
                    (
                        f"CAST(CASE WHEN {match} THEN ({assigns[c]}) "
                        f"ELSE {c} END AS {types[c]}) AS {c}"
                        if c in assigns
                        else c
                    )
                    for c in self.T.fieldNames()
                ]
                expect_sql = (
                    f"SELECT {', '.join(items)} FROM {vt} AS fz_t"
                )
            expected = [
                tuple(r) for r in self.spark.sql(expect_sql).collect()
            ]
            try:
                lake_sql(self.cat, sql)
            except UnsupportedSQL:
                expected = pre
            self._row_cache.pop("db.t", None)
            self._views_fresh = False
            post = self._rows("db.t")
            if self._canon(post) != self._canon(expected):
                return (
                    f"merge post-state differs: {len(post)} rows vs "
                    f"{len(expected)} expected (pre={len(pre)})"
                )
            return None
        where = _render_where(st.get("branches", [])) or "id < 0"
        cond = f"coalesce(({self._rewrite(where)}), false)"
        if st["kind"] == "delete":
            expect_sql = f"SELECT * FROM {self._vt} WHERE NOT {cond}"
        elif st["kind"] == "update":
            assigns = {}
            for term in st["sets"]:
                col, _, expr = term.partition("=")
                assigns[col.strip()] = self._rewrite(expr.strip())
            types = {f.name: f.dataType.simpleString() for f in self.T.fields}
            items = [
                (
                    f"CAST(CASE WHEN {cond} THEN ({assigns[c]}) "
                    f"ELSE {c} END AS {types[c]}) AS {c}"
                    if c in assigns
                    else c
                )
                for c in self.T.fieldNames()
            ]
            expect_sql = f"SELECT {', '.join(items)} FROM {self._vt}"
        else:  # insert
            expect_sql = (
                f"SELECT * FROM {self._vt} UNION ALL "
                f"SELECT id + 1000, g, h, s, v FROM {self._vt} WHERE {cond}"
            )
        expected = [tuple(r) for r in self.spark.sql(expect_sql).collect()]
        try:
            lake_sql(self.cat, sql)
        except UnsupportedSQL:
            expected = pre  # loud refusal must leave the table untouched
        self._row_cache.pop("db.t", None)
        self._views_fresh = False
        post = self._rows("db.t")
        if self._canon(post) != self._canon(expected):
            return (
                f"post-state differs: {len(post)} rows vs "
                f"{len(expected)} expected (pre={len(pre)})"
            )
        return None

    # -- driver ----------------------------------------------------------
    def run(self, n: int = 14) -> None:
        """Generate and check ``n`` statements; on mismatch, shrink
        greedily and raise with the minimal reproducer."""
        for step in range(n):
            st = gen_statement(self.rng)
            err = self.check(st)
            if err is None:
                continue
            # greedy shrink: DML shrink keeps using the (already
            # mutated) current state — string-rewrite bugs are almost
            # always state-independent, and a variant that stops
            # failing is simply not adopted.
            minimal, min_err = st, err
            progress = True
            while progress:
                progress = False
                for cand in shrink_candidates(minimal):
                    e = self.check(cand)
                    if e is not None:
                        minimal, min_err, progress = cand, e, True
                        break
            raise AssertionError(
                f"sqlfuzz seed={self.seed} step={step}: {min_err}\n"
                f"  statement: {render(st)}\n"
                f"  minimal:   {render(minimal)}\n"
                f"  minimal error: {min_err}"
            )


def main() -> None:
    import argparse
    import os
    import sys
    import tempfile

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import SparkSession

    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="0-9", help="e.g. 0-49 or 3,7,11")
    ap.add_argument("--steps", type=int, default=14)
    args = ap.parse_args()
    if "-" in args.seeds:
        lo, hi = args.seeds.split("-")
        seeds = range(int(lo), int(hi) + 1)
    else:
        seeds = [int(x) for x in args.seeds.split(",")]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    with tempfile.TemporaryDirectory() as d:
        for seed in seeds:
            SqlFuzzer(spark, d, seed).run(args.steps)
            print(f"seed {seed}: OK")


if __name__ == "__main__":
    main()
