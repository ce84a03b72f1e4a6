"""COUNT(DISTINCT) grouped/scalar folds from write-time per-file
distinct-value sets (r11, VERDICT r10 #6): ``column_distincts`` holds
each file's EXACT non-null value set for integer columns (plus
opted-in string columns) when it fits ``write.stats.distinct-cap``;
``agg_by`` merges the sets by union IN SPARK with the boundary scan
leg's ``collect_set``, so the final count is exact — never an
estimate. Battery: the nuked-data-files fold proof, fold+scan
boundary merging, the over-cap and opt-out scan-leg routes,
pre-upgrade back-compat, NULL semantics, tombstone degradation, and
the SQL grammar reach (grouped + scalar + unaliased naming).
"""

import json
import os

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.lake.sql_dml import lake_sql

T = StructType(
    [
        StructField("g", StringType(), True),
        StructField("x", LongType(), True),
        StructField("s", StringType(), True),
    ]
)


def _mk(spark, tmp_path, props=()):
    c = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = c.create_table("db.t", T)
    for k, v in props:
        t.set_property(k, v)
    # one file per group; group a carries NULL x rows
    t.append(
        spark.createDataFrame(
            [("a", i % 3, f"s{i % 4}") for i in range(10)]
            + [("a", None, None)],
            T,
        ).coalesce(1)
    )
    t.append(
        spark.createDataFrame(
            [("b", i % 5, f"s{i % 2}") for i in range(10)], T
        ).coalesce(1)
    )
    return c, t


AGGS = [("COUNT_DISTINCT", "x", "dx"), ("COUNT", None, "n")]
EXPECT = [("a", 3, 11), ("b", 5, 10)]


def _got(t):
    return sorted(map(tuple, t.agg_by("g", AGGS).collect()))


def test_grouped_cd_matches_scan(spark, tmp_path):
    _, t = _mk(spark, tmp_path)
    assert _got(t) == EXPECT


def test_cd_fold_answers_with_data_files_deleted(spark, tmp_path):
    """THE planted proof: with every data file gone, grouped
    COUNT(DISTINCT) still answers from the manifest's value sets."""
    _, t = _mk(spark, tmp_path)
    for f in t.plan_files():
        os.remove(f["file_path"])
    assert _got(t) == EXPECT


def test_cd_fold_and_scan_halves_merge(spark, tmp_path):
    """A predicate that fully covers one file and cuts the other:
    the fold half and the scan half must union exactly (overlapping
    values counted once)."""
    _, t = _mk(spark, tmp_path)
    # keys present in both files: x ranges overlap {0,1,2}
    rows = t.agg_by(
        [], [("COUNT_DISTINCT", "x", "dx")], predicates={"g": (">=", "a")}
    ).collect()
    assert rows[0]["dx"] == 5  # union{0,1,2} ∪ {0..4} = {0..4}


def test_cd_string_column_via_optin(spark, tmp_path):
    _, t = _mk(
        spark, tmp_path, props=[("write.stats.distinct-columns", "s")]
    )
    entry = t.plan_files()[0]
    dist = json.loads(entry["column_distincts"])
    assert "s" in dist and "x" in dist
    rows = sorted(
        map(tuple, t.agg_by("g", [("COUNT_DISTINCT", "s", "ds")]).collect())
    )
    assert rows == [("a", 4), ("b", 2)]
    for f in t.plan_files():
        os.remove(f["file_path"])
    assert sorted(
        map(tuple, t.agg_by("g", [("COUNT_DISTINCT", "s", "ds")]).collect())
    ) == rows


def test_cd_over_cap_routes_to_scan(spark, tmp_path):
    """A file whose distinct count exceeds the cap gets NO sketch —
    the fold must route it to the scan leg (answer stays exact)."""
    _, t = _mk(spark, tmp_path, props=[("write.stats.distinct-cap", "4")])
    entry = next(e for e in t.plan_files() if "b" in json.loads(e["column_mins"]).get("g", ""))
    assert "x" not in json.loads(entry["column_distincts"])  # 5 > cap 4
    assert _got(t) == EXPECT  # scan leg answers


def test_cd_optout_property(spark, tmp_path):
    _, t = _mk(
        spark, tmp_path, props=[("write.stats.column-distincts", "false")]
    )
    for e in t.plan_files():
        assert json.loads(e.get("column_distincts") or "{}") == {}
    assert _got(t) == EXPECT  # scan path, exact


def test_cd_pre_upgrade_backcompat(spark, tmp_path):
    """Manifests written before the column existed route to the scan
    leg (absence is None, not an empty set)."""
    _, t = _mk(spark, tmp_path)
    # simulate a pre-upgrade manifest: strip the column and rewrite
    import pyarrow.parquet as pq

    for m in t.snapshot()["manifests"]:
        p = os.path.join(t._meta_dir, m)
        tbl = pq.read_table(p)
        tbl = tbl.drop_columns(["column_distincts"])
        pq.write_table(tbl, p)
    t.refresh()
    assert _got(t) == EXPECT


def test_cd_all_null_file_contributes_empty(spark, tmp_path):
    c, t = _mk(spark, tmp_path)
    t.append(
        spark.createDataFrame([("c", None, None), ("c", None, None)], T)
        .coalesce(1)
    )
    rows = sorted(map(tuple, t.agg_by("g", AGGS).collect()))
    assert rows == [("a", 3, 11), ("b", 5, 10), ("c", 0, 2)]
    for f in t.plan_files():
        os.remove(f["file_path"])
    assert sorted(map(tuple, t.agg_by("g", AGGS).collect())) == rows


def test_cd_tombstones_degrade_to_exact_scan(spark, tmp_path):
    _, t = _mk(spark, tmp_path)
    t.delete_where({"x": ("=", 0)})
    rows = sorted(map(tuple, t.agg_by("g", AGGS).collect()))
    # a: x=0 rows (i=0,3,6,9) deleted -> 7 rows left, distinct {1,2};
    # b: two x=0 rows deleted -> 8 rows, distinct {1,2,3,4}
    assert rows == [("a", 2, 7), ("b", 4, 8)]


def test_sql_grouped_and_scalar_cd(spark, tmp_path):
    cat, t = _mk(spark, tmp_path)
    got = sorted(
        map(
            tuple,
            lake_sql(
                cat,
                "SELECT g, COUNT(DISTINCT x) AS dx, COUNT(*) AS n "
                "FROM db.t GROUP BY g ORDER BY g",
            ).collect(),
        )
    )
    assert got == EXPECT
    df = lake_sql(cat, "SELECT COUNT(DISTINCT x) FROM db.t")
    assert df.columns == ["count(DISTINCT x)"]
    assert df.collect()[0][0] == 5
    # fold proof through the SQL surface
    for f in t.plan_files():
        os.remove(f["file_path"])
    df2 = lake_sql(
        cat, "SELECT g, COUNT(DISTINCT x) AS dx FROM db.t GROUP BY g"
    )
    assert sorted(map(tuple, df2.collect())) == [("a", 3), ("b", 5)]


def test_cd_fold_distributed_tier(spark, tmp_path):
    """Past planning.distributed-threshold the CD classification runs
    over manifest parquet on executors (get_json_object + from_json
    array sketches) — same answers, data files deleted to plant the
    fold; boundary-over-cap and all-null routes included."""
    c, t = _mk(
        spark, tmp_path, props=[("write.stats.distinct-columns", "s")]
    )
    t.set_property("planning.distributed-threshold", "1")
    t2 = c.load_table("db.t")
    expect = sorted(
        map(
            tuple,
            t2.agg_by(
                "g",
                [
                    ("COUNT_DISTINCT", "x", "dx"),
                    ("COUNT_DISTINCT", "s", "ds"),
                    ("COUNT", None, "n"),
                ],
            ).collect(),
        )
    )
    assert expect == [("a", 3, 4, 11), ("b", 5, 2, 10)]
    for f in t2.plan_files():
        os.remove(f["file_path"])
    got = sorted(
        map(
            tuple,
            c.load_table("db.t")
            .agg_by(
                "g",
                [
                    ("COUNT_DISTINCT", "x", "dx"),
                    ("COUNT_DISTINCT", "s", "ds"),
                    ("COUNT", None, "n"),
                ],
            )
            .collect(),
        )
    )
    assert got == expect


def test_cd_single_valued_column_folds_from_minmax(spark, tmp_path):
    """A column that is CONSTANT within each file (identity partitions,
    per-group files) folds even without a harvested set: min==max with
    zero nulls IS the one-element set. Proven with data files deleted,
    on both tiers, including a string group column."""
    c, t = _mk(
        spark, tmp_path, props=[("write.stats.column-distincts", "false")]
    )
    # g is constant per file; distincts harvest is OFF — only the
    # min==max fallback can answer
    for f in t.plan_files():
        os.remove(f["file_path"])
    rows = t.agg_by([], [("COUNT_DISTINCT", "g", "dg")]).collect()
    assert rows[0]["dg"] == 2
    t.set_property("planning.distributed-threshold", "1")
    rows = (
        c.load_table("db.t")
        .agg_by([], [("COUNT_DISTINCT", "g", "dg")])
        .collect()
    )
    assert rows[0]["dg"] == 2
