"""Field-ID-based schema evolution: add/rename/drop are metadata-only
(no data rewrite), old files stay readable (SURVEY.md §7 hard point e).
"""

import pytest
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from icebergplus_spark.lake import LocalLakeCatalog

SCHEMA = StructType(
    [StructField("k", IntegerType(), True), StructField("v", StringType(), True)]
)


@pytest.fixture
def table(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.evolve", SCHEMA)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA))
    return t


def test_add_column_reads_null_for_old_files(spark, table):
    t = table.add_column("score", IntegerType())
    assert [f.name for f in t.schema.fields] == ["k", "v", "score"]
    assert t.field_ids["score"] == 3
    rows = {r["k"]: r["score"] for r in t.scan().collect()}
    assert rows == {1: None, 2: None}
    # new appends carry the column
    t.append(spark.createDataFrame([(3, "c", 30)], t.schema))
    rows = {r["k"]: r["score"] for r in t.scan().collect()}
    assert rows == {1: None, 2: None, 3: 30}


def test_rename_is_metadata_only_and_preserves_id(spark, table):
    files_before = {f["file_path"] for f in table.plan_files()}
    old_id = table.field_ids["v"]
    t = table.rename_column("v", "label")
    assert {f["file_path"] for f in t.plan_files()} == files_before  # no rewrite
    assert t.field_ids["label"] == old_id
    rows = sorted((r["k"], r["label"]) for r in t.scan().collect())
    assert rows == [(1, "a"), (2, "b")]
    # appends after the rename use the new logical name; scan still unifies
    t.append(spark.createDataFrame([(3, "c")], t.schema))
    assert sorted((r["k"], r["label"]) for r in t.scan().collect()) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]


def test_rename_then_add_same_name_no_collision(spark, table):
    t = table.rename_column("v", "label").add_column("v", StringType())
    # old physical 'v' belongs to 'label'; new 'v' must not read old data
    rows = sorted((r["k"], r["label"], r["v"]) for r in t.scan().collect())
    assert rows == [(1, "a", None), (2, "b", None)]


def test_drop_column_prunes(spark, table):
    t = table.drop_column("v")
    assert [f.name for f in t.schema.fields] == ["k"]
    assert sorted(r["k"] for r in t.scan().collect()) == [1, 2]
    with pytest.raises(KeyError):
        t.drop_column("nope")


def test_stats_pruning_survives_rename(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh2")).start()
    t = cat.create_table("db.prune_ren", SCHEMA)
    t.append(spark.createDataFrame([(i, "x") for i in range(10)], SCHEMA).coalesce(1))
    t.append(
        spark.createDataFrame([(i, "y") for i in range(100, 110)], SCHEMA).coalesce(1)
    )
    t = t.rename_column("k", "key")
    # predicate on the NEW logical name still prunes via old physical stats
    assert len(t.plan_files({"key": (">=", 100)})) == 1
    assert t.scan({"key": (">=", 100)}).count() == 10


def test_widen_column_int_to_long_and_float_to_double(spark, tmp_path):
    from pyspark.sql.types import (
        FloatType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from icebergplus_spark.lake import LocalLakeCatalog

    schema = StructType(
        [
            StructField("k", IntegerType(), True),
            StructField("x", FloatType(), True),
            StructField("s", StringType(), True),
        ]
    )
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh_widen")).start()
    t = cat.create_table("db.widen", schema)
    t.append(spark.createDataFrame([(1, 1.5, "a"), (2, 2.5, "b")], schema).coalesce(1))

    t = t.widen_column("k", "long").widen_column("x", "double")
    assert [f.dataType.simpleString() for f in t.schema.fields] == [
        "bigint",
        "double",
        "string",
    ]
    # old (narrow) files read losslessly under the wide schema
    rows = sorted(map(tuple, t.scan().collect()))
    assert rows == [(1, 1.5, "a"), (2, 2.5, "b")]
    assert isinstance(rows[0][0], int)
    # appends in the NEW type coexist with old narrow files
    t.append(
        spark.createDataFrame([(2**40, 3.25, "c")], t.schema).coalesce(1)
    )
    assert t.scan().count() == 3
    assert t.scan({"k": ("=", 2**40)}).count() == 1
    # stats pruning still works across mixed-width files
    assert len(t.plan_files({"k": ("<=", 2)})) == 1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a safe widening"):
        t.widen_column("k", "int")  # narrowing refused
    with _pytest.raises(ValueError, match="not a safe widening"):
        t.widen_column("s", "long")


def test_add_column_initial_default(spark, tmp_path):
    """Iceberg v3 initial-default: files written before the ADD COLUMN
    read the default; rows written after keep their stored values
    (explicit NULL stays NULL); rewrites materialize it; renames follow."""
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    from icebergplus_spark.lake import LocalLakeCatalog, compact

    schema = StructType(
        [StructField("k", IntegerType(), True), StructField("s", StringType(), True)]
    )
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh_def")).start()
    t = cat.create_table("db.defaults", schema)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], schema).coalesce(1))
    t.add_column("score", "int", default=42)

    post = "k int, s string, score int"
    t.append(spark.createDataFrame([(3, "c", 7), (4, "d", None)], post).coalesce(1))

    def got():
        return sorted(
            (r["k"], r["score"]) for r in t.scan().select("k", "score").collect()
        )

    assert got() == [(1, 42), (2, 42), (3, 7), (4, None)]

    # rename: default follows the logical name
    t.rename_column("score", "rating")
    assert sorted(
        (r["k"], r["rating"]) for r in t.scan().select("k", "rating").collect()
    ) == [(1, 42), (2, 42), (3, 7), (4, None)]
    t.rename_column("rating", "score")

    # compaction materializes the default into rewritten files
    compact(t, target_file_size=1 << 28, small_file_threshold=1 << 28)
    assert got() == [(1, 42), (2, 42), (3, 7), (4, None)]

    # stats pruning on the defaulted column still behaves (files
    # predating the column have no stats for it → kept, never wrong)
    assert t.scan({"score": ("=", 7)}).count() == 1


def test_lake_full_type_lattice(spark, tmp_path):
    """SURVEY §1.2: the lake accepts the full Spark type lattice —
    struct/array/map/decimal/date/binary columns write, commit, and
    scan back losslessly (stats simply absent for unstatable leaves:
    unprunable, never wrong)."""
    import datetime as dt
    from decimal import Decimal

    from icebergplus_spark.lake import LocalLakeCatalog

    ddl = (
        "id bigint, tags array<string>, props map<string,int>, "
        "pt struct<x:double,y:double>, amount decimal(10,2), "
        "d date, blob binary"
    )
    df = spark.createDataFrame(
        [
            (
                1,
                ["a", "b"],
                {"k": 1},
                (1.5, 2.5),
                Decimal("12.34"),
                dt.date(2024, 1, 1),
                bytearray(b"\x00\x01"),
            ),
            (2, [], {}, (0.0, -1.0), Decimal("0.01"), dt.date(2024, 2, 2), bytearray(b"")),
        ],
        ddl,
    )
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh_types")).start()
    t = cat.create_table("db.lattice", df.schema)
    t.append(df)
    got = {r["id"]: r for r in t.scan().collect()}
    assert got[1]["tags"] == ["a", "b"]
    assert got[1]["props"] == {"k": 1}
    assert got[1]["pt"]["y"] == 2.5
    assert got[1]["amount"] == Decimal("12.34")
    assert got[1]["d"] == dt.date(2024, 1, 1)
    assert bytes(got[1]["blob"]) == b"\x00\x01"
    # scalar-column stats still prune alongside the nested columns
    assert len(t.plan_files({"id": ("=", 999)})) == 0
    # rename on a nested column's sibling stays metadata-only
    t.rename_column("tags", "labels")
    assert t.scan().select("labels").first()["labels"] in (["a", "b"], [])
