"""Copy-on-write DELETE / OVERWRITE tests: row-level ops the append-only
reference lacks, with file-level rewrite minimization."""

import pytest
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from icebergplus_spark.lake import LocalLakeCatalog

SCHEMA = StructType(
    [StructField("k", IntegerType(), True), StructField("v", StringType(), True)]
)


@pytest.fixture
def table(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.rowops", SCHEMA)
    # two files with disjoint key ranges
    t.append(spark.createDataFrame([(i, f"a{i}") for i in range(10)], SCHEMA).coalesce(1))
    t.append(
        spark.createDataFrame([(i, f"b{i}") for i in range(100, 110)], SCHEMA).coalesce(1)
    )
    return t


def test_delete_rewrites_only_affected_files(spark, table):
    files_before = {f["file_path"] for f in table.plan_files()}
    t = table.delete({"k": ("<", 5)})
    assert sorted(r["k"] for r in t.scan().collect()) == list(range(5, 10)) + list(
        range(100, 110)
    )
    files_after = {f["file_path"] for f in t.plan_files()}
    # second file (k in 100..109) must survive untouched
    untouched = files_before & files_after
    assert len(untouched) == 1
    assert t.snapshot()["operation"] == "delete"
    # pre-delete snapshot still time-travelable
    assert t.scan(snapshot_id=2).count() == 20


def test_delete_all_matching_everything(spark, table):
    t = table.delete({"k": (">=", 0)})
    assert t.scan().count() == 0


def test_delete_nothing_matches(spark, table):
    t = table.delete({"k": (">", 10_000)})
    assert t.scan().count() == 20


def test_delete_conjunction(spark, table):
    t = table.delete({"k": (">=", 102), "v": ("=", "b103")})
    remaining = sorted(r["k"] for r in t.scan().collect())
    assert 103 not in remaining
    assert len(remaining) == 19


def test_overwrite_replaces_current_but_keeps_history(spark, table):
    t = table.overwrite(spark.createDataFrame([(42, "new")], SCHEMA))
    assert [(r["k"], r["v"]) for r in t.scan().collect()] == [(42, "new")]
    assert t.snapshot()["operation"] == "overwrite"
    assert t.scan(snapshot_id=2).count() == 20  # pre-overwrite view intact
