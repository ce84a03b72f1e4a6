"""Hidden partitioning (Iceberg PartitionSpec transform parity):
days()/bucket()/truncate() transforms computed at write time into
path-only columns, with scan predicates on the SOURCE column mapped
onto partition values for manifest pruning — queries never mention
partition columns."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.lake.transforms import parse_spec, py_apply

SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("code", StringType(), True),
    ]
)


@pytest.fixture
def catalog(spark, tmp_path):
    return LocalLakeCatalog(spark, str(tmp_path / "warehouse")).start()


def _rows(spark, n=40):
    base = dt.datetime(2024, 3, 1)
    rows = [
        Row(id=i, ts=base + dt.timedelta(hours=6 * i), code=f"AB{i % 7}xyz")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_parse_spec_errors():
    assert parse_spec(["days(ts)"])[0]["transform"] == "days"
    assert parse_spec(["day(ts)"])[0]["transform"] == "days"  # Iceberg alias
    assert parse_spec(["region"])[0]["transform"] == "identity"
    with pytest.raises(ValueError):
        parse_spec(["bucket(ts)"])  # missing param
    with pytest.raises(ValueError):
        parse_spec(["zorder(4, ts)"])  # unknown transform
    with pytest.raises(ValueError):
        parse_spec(["days(ts"])  # malformed


def test_days_transform_prunes_and_hides(spark, catalog):
    t = catalog.create_table("ns.days", SCHEMA, partition_spec=["days(ts)"])
    t.append(_rows(spark))

    # hidden: the scan schema is exactly the logical schema
    assert t.scan().columns == ["id", "ts", "code"]
    assert t.scan().count() == 40

    all_files = t.plan_files()
    # 40 rows * 6h apart = 10 distinct days → 10 partitions minimum
    assert len(all_files) >= 10

    cut = dt.datetime(2024, 3, 8)
    pruned = t.plan_files({"ts": (">=", cut)})
    assert 0 < len(pruned) < len(all_files)  # real pruning happened

    # correctness: pruned scan returns exactly the right rows
    got = sorted(r.id for r in t.scan({"ts": (">=", cut)}).collect())
    want = sorted(
        i for i in range(40)
        if dt.datetime(2024, 3, 1) + dt.timedelta(hours=6 * i) >= cut
    )
    assert got == want


def test_boundary_day_not_pruned(spark, catalog):
    """ts > X must keep the partition containing X (op relaxation)."""
    t = catalog.create_table("ns.bound", SCHEMA, partition_spec=["days(ts)"])
    t.append(_rows(spark))
    # 18:00 on a day that also has earlier rows: > maps to days >= same day
    cut = dt.datetime(2024, 3, 3, 15, 0)
    got = sorted(r.id for r in t.scan({"ts": (">", cut)}).collect())
    want = sorted(
        i for i in range(40)
        if dt.datetime(2024, 3, 1) + dt.timedelta(hours=6 * i) > cut
    )
    assert got == want


def test_bucket_transform_equality_pruning(spark, catalog):
    t = catalog.create_table("ns.bucketed", SCHEMA, partition_spec=["bucket(4, id)"])
    t.append(_rows(spark))
    all_files = t.plan_files()
    pruned = t.plan_files({"id": ("=", 13)})
    assert len(pruned) < len(all_files)  # only bucket 13%4=1 files remain
    got = [r.id for r in t.scan({"id": ("=", 13)}).collect()]
    assert got == [13]
    # range predicates must NOT prune on bucket (non-monotone): still correct
    got = sorted(r.id for r in t.scan({"id": (">=", 35)}).collect())
    assert got == list(range(35, 40))


def test_truncate_transform_string(spark, catalog):
    t = catalog.create_table(
        "ns.trunc", SCHEMA, partition_spec=["truncate(3, code)"]
    )
    t.append(_rows(spark))
    got = sorted(r.id for r in t.scan({"code": ("=", "AB3xyz")}).collect())
    assert got == [i for i in range(40) if i % 7 == 3]
    pruned = t.plan_files({"code": ("=", "AB3xyz")})
    assert len(pruned) < len(t.plan_files())


def test_mixed_spec_and_partitions_metadata(spark, catalog):
    t = catalog.create_table(
        "ns.mixed", SCHEMA, partition_spec=["days(ts)", "bucket(2, id)"]
    )
    t.append(_rows(spark, n=8))
    assert t.scan().columns == ["id", "ts", "code"]
    assert t.scan().count() == 8
    parts = t.metadata_df("partitions").collect()
    assert sum(r.record_count for r in parts) == 8
    # partition string carries both transform segments
    assert all("_p_ts_days" in r.partition and "_p_id_bucket_2" in r.partition for r in parts)


def test_py_apply_matches_spark_crc32(spark):
    """The Python bucket twin must agree with the JVM expression."""
    import pyspark.sql.functions as F

    from icebergplus_spark.lake.transforms import spark_expr

    pf = parse_spec(["bucket(8, code)"])[0]
    vals = ["alpha", "Brücke", "x", ""]
    df = spark.createDataFrame([Row(code=v) for v in vals])
    jvm = [
        r.b for r in df.select(
            spark_expr(pf, F.col("code"), "string").alias("b")
        ).collect()
    ]
    py = [py_apply(pf, v, "string") for v in vals]
    assert jvm == py
