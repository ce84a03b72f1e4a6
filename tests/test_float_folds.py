"""Float/double manifest folds gated on NaN-free evidence (r12).

The static type gate (`_stats_foldable`) refuses FLOAT/DOUBLE because
parquet footer min/max omit NaN while Spark/DuckDB order NaN greater
than every real value. The write-time harvest records exact per-file
``column_nan_counts``, so a file PROVEN NaN-free can fold its footer
min/max after all — per file, in both the driver and distributed tiers.
These tests pin the evidence gate and, critically, NaN exactness: any
NaN-bearing or unproven file must route to the exact scan leg, and a
scan-leg NaN max must win the merge (Python's ``nan > x`` is False).
"""

import math

import pytest

from pyspark.sql import functions as F

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.lake.sql_dml import lake_sql
from icebergplus_spark.localrel import attached_rows


@pytest.fixture()
def cat(spark, tmp_path):
    return LocalLakeCatalog(spark, str(tmp_path)).start()


def _mk(spark, ddl):
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(ddl)


def _tbl(spark, cat, name, batches, force_distributed=False):
    sch = _mk(spark, "k int, v double")
    t = cat.create_table(name, sch)
    for b in batches:
        t.append(spark.createDataFrame(b, sch).coalesce(1))
    if force_distributed:
        t.set_property("planning.distributed-threshold", "0")
    return t


CLEAN = [[(1, 1.5), (2, 2.5)], [(3, 10.0), (4, -4.25)]]
MIXED = [[(1, 1.0), (2, float("nan"))], [(3, 5.0), (4, 2.0)]]
ALLNAN = [[(1, float("nan")), (2, float("nan"))]]


@pytest.mark.parametrize("dist", [False, True])
def test_clean_float_min_max_folds(spark, cat, dist):
    t = _tbl(spark, cat, f"f.clean{dist}", CLEAN, dist)
    df = lake_sql(cat, f"SELECT MIN(v) AS mn, MAX(v) AS mx FROM f.clean{dist}")
    row = df.collect()[0]
    assert (row["mn"], row["mx"]) == (-4.25, 10.0)
    if not dist:
        # driver tier answers entirely from metadata: the frame carries
        # its rows (no Spark action needed by inliner consumers)
        assert attached_rows(df) is not None
    assert t.stats_extrema(["v"])["v"] == (-4.25, 10.0)


@pytest.mark.parametrize("dist", [False, True])
def test_nan_file_routes_to_scan_and_max_is_nan(spark, cat, dist):
    t = _tbl(spark, cat, f"f.mixed{dist}", MIXED, dist)
    exact = t.scan().agg(F.min("v"), F.max("v")).first()
    assert exact[0] == 1.0 and math.isnan(exact[1])
    row = lake_sql(
        cat, f"SELECT MIN(v) AS mn, MAX(v) AS mx FROM f.mixed{dist}"
    ).collect()[0]
    assert row["mn"] == 1.0 and math.isnan(row["mx"])
    lo, hi = t.stats_extrema(["v"])["v"]
    assert lo == 1.0 and math.isnan(hi)


def test_all_nan_table(spark, cat):
    t = _tbl(spark, cat, "f.allnan", ALLNAN)
    row = lake_sql(cat, "SELECT MIN(v) AS mn, MAX(v) AS mx FROM f.allnan").collect()[0]
    assert math.isnan(row["mn"]) and math.isnan(row["mx"])


@pytest.mark.parametrize("dist", [False, True])
def test_grouped_fold_over_floats(spark, cat, dist):
    """GROUP BY with float MIN/MAX: NaN-free files fold, others scan —
    result equals the exact grouped aggregate."""
    sch = _mk(spark, "g int, v double")
    t = cat.create_table(f"f.grp{dist}", sch)
    t.append(spark.createDataFrame([(1, 2.0), (1, 3.0)], sch).coalesce(1))
    t.append(
        spark.createDataFrame([(2, 7.0), (2, float("nan"))], sch).coalesce(1)
    )
    if dist:
        t.set_property("planning.distributed-threshold", "0")
    got = {
        r["g"]: (r["mn"], r["mx"])
        for r in t.agg_by(
            "g", [("MIN", "v", "mn"), ("MAX", "v", "mx")]
        ).collect()
    }
    assert got[1] == (2.0, 3.0)
    assert got[2][0] == 7.0 and math.isnan(got[2][1])


def test_count_distinct_single_value_float_with_evidence(spark, cat):
    """The r11-ADVICE hazard, now evidence-gated: min==max on a
    NaN-free file proves one distinct value; a {1.0, NaN} file (also
    min==max==1.0 in the footer) must NOT fold to 1."""
    sch = _mk(spark, "v double")
    t = cat.create_table("f.cd", sch)
    t.append(spark.createDataFrame([(1.0,), (1.0,)], sch).coalesce(1))
    got = t.agg_by([], [("COUNT_DISTINCT", "v", "d")]).collect()[0]["d"]
    assert got == 1
    t2 = cat.create_table("f.cd2", sch)
    t2.append(
        spark.createDataFrame([(1.0,), (float("nan"),)], sch).coalesce(1)
    )
    got2 = t2.agg_by([], [("COUNT_DISTINCT", "v", "d")]).collect()[0]["d"]
    exact2 = t2.scan().agg(F.count_distinct("v")).first()[0]
    assert got2 == exact2 == 2
