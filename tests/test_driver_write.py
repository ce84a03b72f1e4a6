"""Driver-side tiny-batch write path (r12 optimization).

``LakeTable._write_rows_driver`` writes local_rows_df batches as one
pyarrow parquet file instead of running a Spark write job. These tests
prove the fast path is INVISIBLE: scans, footer-stat harvests, folds and
commits must be byte-for-byte-in-effect identical to the Spark write it
replaces, and every gated shape must decline to the Spark path rather
than write something different.
"""

import datetime
import decimal
import os

import pytest

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.localrel import local_rows_df


@pytest.fixture()
def cat(spark, tmp_path):
    return LocalLakeCatalog(spark, str(tmp_path)).start()


ALL_TYPES_DDL = (
    "b boolean, i int, l long, f float, d double, s string, "
    "bin binary, dt date, ts timestamp"
)

ROWS = [
    (
        True,
        7,
        7_000_000_000,
        1.5,
        2.25,
        "hello",
        b"\x01\x02",
        datetime.date(1996, 3, 1),
        datetime.datetime(1996, 3, 1, 12, 30, 45, 123456),
    ),
    (
        False,
        -3,
        -1,
        -0.5,
        -9.75,
        "zz-top",
        b"\xff",
        datetime.date(2001, 12, 31),
        datetime.datetime(2001, 12, 31, 23, 59, 59),
    ),
    (None, None, None, None, None, None, None, None, None),
]


def _mk(spark, ddl):
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(ddl)


def test_driver_write_taken_and_equals_spark_write(spark, cat):
    """Same rows through both writers: identical scan results, identical
    harvested footer stats (min/max/null counts), and the driver path
    really produced exactly one file without a Spark job."""
    schema = _mk(spark, ALL_TYPES_DDL)
    t_fast = cat.create_table("t.fast", schema)
    t_slow = cat.create_table("t.slow", schema)

    df_local = local_rows_df(spark, ROWS, schema)
    assert t_fast._write_rows_driver(ROWS, schema, os.path.join(
        t_fast.table_dir, "data", "probe"
    )) is not None  # the gate accepts this shape
    t_fast.append(df_local)

    # Spark-writer control: same rows, attachment stripped
    df_spark = spark.createDataFrame(ROWS, schema).coalesce(1)
    t_slow.append(df_spark)

    key = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    a = sorted(map(tuple, t_fast.scan().collect()), key=key)
    b = sorted(map(tuple, t_slow.scan().collect()), key=key)
    assert a == b == sorted(map(tuple, ROWS), key=key)

    # exactly one driver-written file
    fa = t_fast.snapshot()
    assert fa["summary"]["added-data-files"] == 1

    # footer-harvest equality: the stats every fold/prune tier reads
    import json

    ea = t_fast.plan_files()
    eb = t_slow.plan_files()
    assert len(ea) == len(eb) == 1
    for key in ("column_mins", "column_maxs", "column_null_counts"):
        assert json.loads(ea[0].get(key) or "{}") == json.loads(
            eb[0].get(key) or "{}"
        ), key
    assert ea[0]["record_count"] == eb[0]["record_count"] == 3


def test_fold_reads_driver_written_stats(spark, cat):
    """MAX/COUNT folds answer from a driver-written file's footer stats
    exactly as from a Spark-written one."""
    from icebergplus_spark.lake.sql_dml import lake_sql

    schema = _mk(spark, "wm timestamp")
    t = cat.create_table("t.cp", schema)
    rows = [
        (datetime.datetime(2024, 1, 5, 0, 0, 0),),
        (datetime.datetime(2024, 3, 7, 8, 9, 10),),
    ]
    t.append(local_rows_df(spark, rows, schema))
    got = lake_sql(cat, "SELECT MAX(wm) AS m, COUNT(*) AS n FROM t.cp").collect()
    assert got[0]["m"] == datetime.datetime(2024, 3, 7, 8, 9, 10)
    assert got[0]["n"] == 2


def test_insert_select_fold_roundtrip(spark, cat):
    """The w06/w07 shape end-to-end: INSERT INTO ... SELECT MAX(fold)
    then read the watermark back — through lake_sql only."""
    from pyspark.sql import functions as F

    from icebergplus_spark.lake.sql_dml import lake_sql
    from icebergplus_spark.sources import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    t = cat.create_table("t.ord", orders.schema)
    t.append(orders)
    cp = cat.create_table(
        "t.cp2", orders.select(F.col("o_orderdate").alias("wm")).limit(0).schema
    )
    lake_sql(cat, "INSERT INTO t.cp2 SELECT MAX(o_orderdate) AS wm FROM t.ord")
    expect = orders.agg(F.max("o_orderdate")).first()[0]
    got = lake_sql(cat, "SELECT MAX(wm) FROM t.cp2").first()[0]
    assert got == expect


def test_declines_to_spark_path(spark, cat):
    """Every gate: partitioned table, sort order, type coercion, long
    strings, >4096 rows, nested types — all return None (Spark path)."""
    schema = _mk(spark, "k int, s string")
    rows = [(1, "a"), (2, "b")]

    part = cat.create_table("t.p", schema, partition_cols=["k"])
    assert part._write_rows_driver(rows, schema, "/tmp/x") is None

    t = cat.create_table("t.g", schema)
    t.set_property("write.sort-order", "k")
    assert t._write_rows_driver(rows, schema, "/tmp/x") is None
    t.set_property("write.sort-order", "")

    wrong = _mk(spark, "k long, s string")  # k needs a cast
    assert t._write_rows_driver(rows, wrong, "/tmp/x") is None

    long_s = [(1, "x" * 300)]
    assert t._write_rows_driver(long_s, schema, "/tmp/x") is None

    many = [(i, "v") for i in range(5000)]
    assert t._write_rows_driver(many, schema, "/tmp/x") is None

    nested = _mk(spark, "k int, s array<int>")
    tn = cat.create_table("t.n", nested)
    assert tn._write_rows_driver([(1, [1, 2])], nested, "/tmp/x") is None

    # decimal declines: parquet-cpp/mr footer-stat parity (see impl)
    dec = _mk(spark, "k int, d decimal(12,3)")
    td = cat.create_table("t.dec", dec)
    assert td._write_rows_driver(
        [(1, decimal.Decimal("1.5"))], dec, "/tmp/x"
    ) is None


def test_declined_append_still_correct(spark, cat):
    """A declined local frame (long strings) still appends correctly via
    the Spark path."""
    schema = _mk(spark, "k int, s string")
    t = cat.create_table("t.d", schema)
    rows = [(1, "y" * 400), (2, "z")]
    t.append(local_rows_df(spark, rows, schema))
    got = sorted(map(tuple, t.scan().collect()))
    assert got == sorted(rows)


def test_empty_local_append_commits_no_files(spark, cat):
    schema = _mk(spark, "k int, s string")
    t = cat.create_table("t.e", schema)
    t.append(local_rows_df(spark, [], schema))
    assert t.scan().count() == 0
    assert t.snapshot()["summary"]["added-data-files"] == 0


def test_constraint_violation_message_and_pass(spark, cat):
    """The fused one-action constraint check keeps exact behavior: clean
    batches pass, violating batches raise with the same message shape
    (constraint name, expression, example row)."""
    from icebergplus_spark.lake.table import ConstraintViolation

    schema = _mk(spark, "k int, v int")
    t = cat.create_table("t.c", schema)
    t.add_constraint("v_pos", "v > 0")
    t.append(local_rows_df(spark, [(1, 5), (2, 6)], schema))
    assert t.scan().count() == 2
    with pytest.raises(ConstraintViolation) as ei:
        t.append(local_rows_df(spark, [(3, 7), (4, -1)], schema))
    msg = str(ei.value)
    assert "v_pos" in msg and "v > 0" in msg and "example" not in msg
    assert "'k': 4" in msg or "k=4" in msg or "-1" in msg
