"""Top-k read fast path from manifest stats (r12, VERDICT r11 #3):
``SELECT ... ORDER BY col DESC LIMIT k`` prunes to the files whose
max(col) can still reach the global top-k. Battery: planted
kept-file-count gates (DESC and ASC), min-based-bound soundness (the
big-max/small-rows trap a naive max-ordered accounting falls into),
WHERE composition (full-cover counting), tie inclusion, secondary
sort keys, and the decline ladder — MoR tombstones, float order
column (NaN hazard), aliased order column, plain ASC over nullable
columns, stats too thin to cover k."""

import pytest
from pyspark.sql import functions as F
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
        StructField("id", LongType(), True),
        StructField("ts", LongType(), True),
        StructField("v", DoubleType(), True),
        StructField("tag", StringType(), True),
    ]
)


def _mk(spark, tmp_path, name="db.t", chunks=4, rows=20):
    """``chunks`` appends of ``rows`` rows each with DISJOINT ts ranges
    (chunk c holds ts in [c*rows, (c+1)*rows)) — the time-series ingest
    shape where top-k pruning shines."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table(name, T)
    n = 0
    for c in range(chunks):
        data = [
            (n + i, c * rows + i, float(i), f"tag{(n + i) % 3}")
            for i in range(rows)
        ]
        t.append(local_rows_df(spark, data, T))
        n += rows
    return cat, t


def test_plan_files_topk_keeps_only_reachable_files(spark, tmp_path):
    _, t = _mk(spark, tmp_path)
    assert len(t.plan_files()) == 4
    kept = t.plan_files_topk("ts", 5, descending=True)
    # top-5 ts live entirely in the last chunk; bound = that chunk's min
    assert kept is not None and len(kept) == 1
    kept = t.plan_files_topk("ts", 25, descending=True)
    # 25 > one chunk's 20 rows -> bound reaches into chunk 3
    assert len(kept) == 2


def test_plan_files_topk_asc(spark, tmp_path):
    _, t = _mk(spark, tmp_path)
    kept = t.plan_files_topk("ts", 5, descending=False)
    assert kept is not None and len(kept) == 1
    mins = [f["file_path"] for f in kept]
    # it kept the FIRST chunk (smallest ts)
    full = t.plan_files_topk("ts", 10**6, descending=False)
    assert full is None  # can't cover a million rows — decline


def test_sql_topk_matches_full_sort(spark, tmp_path):
    cat, t = _mk(spark, tmp_path)
    got = lake_sql(
        cat, "SELECT id, ts FROM db.t ORDER BY ts DESC LIMIT 7"
    ).collect()
    want = (
        t.scan()
        .orderBy(F.col("ts").desc(), F.col("id"))
        .limit(7)
        .select("id", "ts")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_sql_topk_used_the_pruned_view(spark, tmp_path):
    cat, t = _mk(spark, tmp_path)
    df = lake_sql(cat, "SELECT id, ts FROM db.t ORDER BY ts DESC LIMIT 3")
    files = {
        r[0]
        for r in df.select(F.input_file_name()).distinct().collect()
    }
    assert len(files) == 1  # read one data file, not four


def test_min_bound_soundness_big_max_small_rows(spark, tmp_path):
    """The trap: file A has a huge max but tiny other rows; file B's
    rows all beat A's non-max rows. A naive 'first files by max cover
    k rows' accounting would prune B and lose most of the top-k."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.trap", T)
    # file A: one row ts=1000, 19 rows ts in [0, 19)
    a = [(i, (1000 if i == 0 else i), 0.0, "a") for i in range(20)]
    t.append(local_rows_df(spark, a, T))
    # file B: 20 rows ts in [500, 520)
    b = [(100 + i, 500 + i, 0.0, "b") for i in range(20)]
    t.append(local_rows_df(spark, b, T))
    got = lake_sql(
        cat, "SELECT ts FROM db.trap ORDER BY ts DESC LIMIT 10"
    ).collect()
    want = sorted([1000] + list(range(511, 520)), reverse=True)
    assert sorted((r[0] for r in got), reverse=True) == want
    # and both files were kept by the planner
    kept = t.plan_files_topk("ts", 10, descending=True)
    assert kept is not None and len(kept) == 2


def test_topk_with_where_composes(spark, tmp_path):
    cat, t = _mk(spark, tmp_path)
    got = lake_sql(
        cat,
        "SELECT id, ts FROM db.t WHERE ts < 60 ORDER BY ts DESC LIMIT 5",
    ).collect()
    want = (
        t.scan()
        .filter(F.col("ts") < 60)
        .orderBy(F.col("ts").desc())
        .limit(5)
        .select("id", "ts")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # predicate cuts chunk 3 entirely; top-5 of the rest sit in chunk 2
    kept = t.plan_files_topk(
        "ts", 5, descending=True, branches=[{"ts": ("<", 60)}]
    )
    assert kept is not None and len(kept) == 1


def test_topk_ties_all_kept(spark, tmp_path):
    """Rows tied at the k-th value straddle files — every tied file
    must be kept so the residual sort sees all candidates."""
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.ties", T)
    t.append(
        local_rows_df(spark, 
            [(i, 50, float(i), "x") for i in range(10)], T
        )
    )
    t.append(
        local_rows_df(spark, 
            [(100 + i, 50, float(i), "y") for i in range(10)], T
        )
    )
    kept = t.plan_files_topk("ts", 3, descending=True)
    assert kept is not None and len(kept) == 2
    got = lake_sql(
        cat,
        "SELECT id FROM db.ties ORDER BY ts DESC, id ASC LIMIT 3",
    ).collect()
    assert sorted(r[0] for r in got) == [0, 1, 2]


def test_declines(spark, tmp_path):
    cat, t = _mk(spark, tmp_path)
    # float order column: NaN is invisible to footer stats yet sorts
    # greatest — never prune on it
    assert t.plan_files_topk("v", 5, descending=True) is None
    # unknown column
    assert t.plan_files_topk("nope", 5) is None
    # plain ASC on a (potentially) nullable col: Spark sorts nulls
    # FIRST — with any null present the fast path must decline
    t2 = cat.create_table("db.nullable", T)
    t2.append(
        local_rows_df(spark, 
            [(i, None if i == 0 else i, 0.0, "x") for i in range(10)], T
        )
    )
    assert t2.plan_files_topk(
        "ts", 3, descending=False, require_no_nulls=True
    ) is None
    # ... but DESC still prunes (nulls sort last, k non-nulls proven)
    assert t2.plan_files_topk("ts", 3, descending=True) is not None


def test_tombstones_decline_but_sql_stays_exact(spark, tmp_path):
    cat, t = _mk(spark, tmp_path)
    # MoR position-delete: tombstones hide rows from record_count, so
    # the top-k row accounting must decline outright
    t.delete_where({"ts": (">=", 70)})
    assert t.refresh().plan_files_topk("ts", 5, descending=True) is None
    got = lake_sql(
        cat, "SELECT ts FROM db.t ORDER BY ts DESC LIMIT 5"
    ).collect()
    assert sorted((r[0] for r in got), reverse=True) == list(
        range(69, 64, -1)
    )


def test_sql_alias_shadow_declines_to_native(spark, tmp_path):
    """ORDER BY may bind a select alias, not the table column — the
    fast path declines and native Spark answers (here: alias 'ts'
    over a DIFFERENT expression)."""
    cat, t = _mk(spark, tmp_path)
    got = lake_sql(
        cat,
        "SELECT id, -id AS ts FROM db.t ORDER BY ts DESC LIMIT 3",
    ).collect()
    assert sorted(r[0] for r in got) == [0, 1, 2]  # -id DESC -> id 0,1,2


def test_topk_engages_on_timestamp_order_col(spark, tmp_path):
    """The q179 shape — timestamp order column + date-range WHERE —
    must take the top-k fast path (isoformat stats order ==
    chronological), not silently fall back to the predicate-only
    pruner."""
    from datetime import datetime

    from pyspark.sql.types import TimestampType

    from icebergplus_spark.lake.sql_dml import _topk_select

    S = StructType(
        [
            StructField("id", LongType(), True),
            StructField("ts", TimestampType(), True),
        ]
    )
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.ev", S)
    for year in (1994, 1995, 1996):
        t.append(
            local_rows_df(spark, 
                [
                    (year * 100 + d, datetime(year, 1 + d % 12, 1 + d % 28))
                    for d in range(24)
                ],
                S,
            )
        )
    stmt = (
        "SELECT id, ts FROM db.ev WHERE ts >= '1995-01-01' "
        "ORDER BY ts DESC, id ASC LIMIT 5"
    )
    df = _topk_select(cat, stmt)
    assert df is not None  # fast path engaged
    kept = t.plan_files_topk(
        "ts",
        5,
        descending=True,
        branches=[{"ts": (">=", datetime(1995, 1, 1))}],
    )
    assert kept is not None and len(kept) == 1  # only the 1996 chunk
    got = [tuple(r) for r in df.collect()]
    want = [
        tuple(r)
        for r in t.scan()
        .filter(F.col("ts") >= "1995-01-01")
        .orderBy(F.col("ts").desc(), F.col("id"))
        .limit(5)
        .collect()
    ]
    assert got == want


def test_all_null_files_pruned_desc(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.an", T)
    t.append(
        local_rows_df(spark, 
            [(i, i, 0.0, "x") for i in range(10)], T
        )
    )
    t.append(
        local_rows_df(spark, 
            [(100 + i, None, 0.0, "y") for i in range(10)], T
        )
    )
    kept = t.plan_files_topk("ts", 3, descending=True)
    assert kept is not None and len(kept) == 1  # all-null file dropped
    got = lake_sql(
        cat, "SELECT ts FROM db.an ORDER BY ts DESC LIMIT 3"
    ).collect()
    assert [r[0] for r in got] == [9, 8, 7]
