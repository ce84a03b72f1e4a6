"""Property-based tests (hypothesis): the custom operators hold their
contracts on randomized inputs, not just the fixtures."""

import datetime as dt
from decimal import ROUND_HALF_UP, Decimal

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from icebergplus_spark.functions.exact import dsum
from icebergplus_spark.operators.asof import asof_join

# module-scoped spark fixture comes from conftest via pytest; hypothesis
# needs function params, so we grab the session lazily
import pytest


@pytest.fixture(scope="module")
def sp(spark):
    return spark


cents = st.integers(min_value=-10_000_00, max_value=10_000_00)


@settings(max_examples=15, deadline=None)
@given(st.lists(cents, min_size=1, max_size=50))
def test_dsum_equals_exact_decimal_math(sp, values):
    """dsum over 2dp doubles == exact Decimal sum, any ordering."""
    doubles = [v / 100.0 for v in values]
    df = sp.createDataFrame([(x,) for x in doubles], "x double").repartition(4)
    got = df.agg(dsum("x", 2, 2).alias("s")).first()["s"]
    want = sum(Decimal(v) for v in values) / Decimal(100)
    want = float(want.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=1, max_size=30
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000), st.integers(0, 100)),
        min_size=1,
        max_size=30,
    ),
)
def test_asof_join_matches_naive(sp, probes, states):
    """asof_join == per-row naive 'latest state at-or-before' lookup."""
    base = dt.datetime(2024, 1, 1)
    left = sp.createDataFrame(
        [(k, base + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(probes)],
        "key int, t timestamp, pid int",
    )
    right = sp.createDataFrame(
        [(k, base + dt.timedelta(seconds=s), r) for (k, s, r) in states],
        "key int, t2 timestamp, rid int",
    )
    out = {
        r["pid"]: r["rid"]
        for r in asof_join(
            left, right, "key", "key", "t", "t2", ["rid"], tiebreak="rid", how="left"
        ).collect()
    }
    for i, (k, s) in enumerate(probes):
        cands = [
            (s2, rid) for (k2, s2, rid) in states if k2 == k and s2 <= s
        ]
        want = max(cands)[1] if cands else None  # latest ts, max rid tiebreak
        assert out[i] == want, f"probe {i}: got {out[i]}, want {want}"


# -- round-2 op invariants on randomized corpora ---------------------------

texts = st.lists(
    st.text(
        alphabet=st.sampled_from("ab cd "),
        min_size=0,
        max_size=40,
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=10, deadline=None)
@given(texts)
def test_repetition_filter_invariants(sp, docs):
    """rep_ratio in (0,1]; top count <= total; distinct <= total — for
    arbitrary (whitespace-heavy, possibly empty) texts."""
    from icebergplus_spark.operators.textops3 import _grams_with_multiplicity

    df = sp.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    grams = df.select("doc_id", F.explode(_grams_with_multiplicity("text", 3)).alias("g"))
    per = grams.groupBy("doc_id", "g").count()
    agg = per.groupBy("doc_id").agg(
        F.sum("count").alias("n"),
        F.count(F.lit(1)).alias("d"),
        F.max("count").alias("top"),
    )
    for r in agg.collect():
        assert 1 <= r["top"] <= r["n"]
        assert 1 <= r["d"] <= r["n"]


@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=1, max_value=60), st.integers(min_value=1, max_value=5))
def test_stratified_sample_quota_exact(sp, n_docs, n_sources):
    """Every stratum yields exactly ceil(frac * stratum_n) rows."""
    import math

    from pyspark.sql import Window

    from icebergplus_spark.operators.textops3 import SAMPLE_FRAC

    rows = [(i, f"s{i % n_sources}") for i in range(n_docs)]
    df = sp.createDataFrame(rows, "doc_id long, source string")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    wn = Window.partitionBy("source")
    ranked = df.select(
        "source",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("stratum_n"),
    )
    got = (
        ranked.filter(F.col("rk") <= F.ceil(F.col("stratum_n") * SAMPLE_FRAC))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"), F.min("stratum_n").alias("sn"))
        .collect()
    )
    assert len(got) == min(n_sources, n_docs)
    for r in got:
        assert r["n_sampled"] == math.ceil(r["sn"] * SAMPLE_FRAC)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=0,
        max_size=25,
    )
)
def test_connected_components_partition_is_valid(sp, edges):
    """Components partition the node set; endpoints of every edge share
    a component; the label is the component's min node id."""
    from icebergplus_spark.operators.clusters import connected_components

    if not edges:
        return
    df = sp.createDataFrame(edges, "doc_a long, doc_b long")
    comp = {
        r["node"]: r["comp"] for r in connected_components(df).collect()
    }
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    assert set(comp) == nodes
    for a, b in edges:
        assert comp[a] == comp[b]
    # label == min of its members
    from collections import defaultdict

    members = defaultdict(set)
    for n, c in comp.items():
        members[c].add(n)
    for c, ms in members.items():
        assert c == min(ms)


@settings(max_examples=8, deadline=None)
@given(
    target=st.lists(  # (key, value); keys unique within each side
        st.tuples(st.integers(0, 9), st.integers(0, 100)),
        min_size=0,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    source=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 100)),
        min_size=0,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    c1=st.integers(0, 100),  # matched-condition threshold
    c2=st.integers(0, 100),  # by-source-delete threshold
)
def test_merge_into_matches_model(sp, tmp_path_factory, target, source, c1, c2):
    """Full multi-clause MERGE vs an independent Python model of the SQL
    semantics: WHEN MATCHED AND v < c1 THEN UPDATE, WHEN NOT MATCHED
    THEN INSERT, WHEN NOT MATCHED BY SOURCE AND v > c2 THEN DELETE."""
    import pyspark.sql.functions as F

    from icebergplus_spark.lake import LocalLakeCatalog

    root = tmp_path_factory.mktemp("merge_prop")
    cat = LocalLakeCatalog(sp, str(root)).start()
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField("k", LongType()), StructField("v", LongType())]
    )
    t = cat.create_table("db.m", schema)
    if target:
        t = t.append(sp.createDataFrame(target, "k long, v long"))
    src_df = sp.createDataFrame(source or [(99999, 0)], "k long, v long")
    if not source:
        src_df = src_df.limit(0)
    t = t.merge_into(
        src_df,
        on="k",
        when_matched_update={"v": F.col("src_v")},
        matched_condition=F.col("v") < F.lit(c1),
        when_not_matched_insert=True,
        when_not_matched_by_source_delete=True,
        not_matched_by_source_condition=F.col("v") > F.lit(c2),
    )
    got = sorted((r.k, r.v) for r in t.scan().collect())

    tgt = dict(target)
    src = dict(source)
    model = {}
    for k, v in tgt.items():
        if k in src:
            model[k] = src[k] if v < c1 else v  # matched (maybe updated)
        elif not v > c2:
            model[k] = v  # target-only, survives the by-source gate
    for k, sv in src.items():
        if k not in tgt:
            model[k] = sv  # inserted
    assert got == sorted(model.items())


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 20), st.integers(-5, 5)),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
    col=st.sampled_from(["k", "v"]),
    op=st.sampled_from(["=", "<", "<=", ">", ">="]),
    lit=st.integers(-5, 20),
)
def test_sql_delete_where_matches_filter_semantics(
    sp, tmp_path_factory, rows, col, op, lit
):
    """lake_sql DELETE's WHERE grammar must delete exactly the rows the
    equivalent DataFrame filter selects — across random predicates the
    stats-targeted file pruning may take different prune decisions, but
    never different ROW decisions."""
    from pyspark.sql.types import LongType, StructField, StructType

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.lake.sql_dml import lake_sql

    schema = StructType(
        [StructField("k", LongType()), StructField("v", LongType())]
    )
    root = tmp_path_factory.mktemp("where_prop")
    cat = LocalLakeCatalog(sp, str(root)).start()
    t = cat.create_table("db.w", schema)
    t = t.append(sp.createDataFrame(rows, schema))

    lake_sql(cat, f"DELETE FROM db.w WHERE {col} {op} {lit}")
    got = sorted(tuple(r) for r in cat.load_table("db.w").scan().collect())

    import pyspark.sql.functions as F

    keep = {
        "=": F.col(col) != lit,
        "<": ~(F.col(col) < lit),
        "<=": ~(F.col(col) <= lit),
        ">": ~(F.col(col) > lit),
        ">=": ~(F.col(col) >= lit),
    }[op]
    want = sorted(
        tuple(r)
        for r in sp.createDataFrame(rows, schema).filter(keep).collect()
    )
    assert got == want
