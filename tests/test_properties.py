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
