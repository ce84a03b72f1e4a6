"""Partition evolution (Iceberg updateSpec parity): metadata-only spec
change; old files keep their layout and stay readable + prunable, new
writes use the new spec, rewrites migrate layout."""

import pytest
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from icebergplus_spark.lake import LocalLakeCatalog, compact

SCHEMA = StructType(
    [
        StructField("k", IntegerType(), True),
        StructField("grp", StringType(), True),
    ]
)

ROWS1 = [(i, "even" if i % 2 == 0 else "odd") for i in range(10)]
ROWS2 = [(i, "even" if i % 2 == 0 else "odd") for i in range(10, 20)]


def _keys(t):
    return sorted(r["k"] for r in t.scan().collect())


def test_identity_to_unpartitioned(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh1")).start()
    t = cat.create_table("db.evo1", SCHEMA, partition_cols=["grp"])
    t.append(spark.createDataFrame(ROWS1, SCHEMA))
    t.update_partition_spec(None)
    assert t.partition_spec == []
    t.append(spark.createDataFrame(ROWS2, SCHEMA))
    # old files' identity values recovered from the path, not NULL
    assert _keys(t) == list(range(20))
    got = sorted(
        r["k"] for r in t.scan(predicates={"grp": ("=", "odd")}).collect()
    )
    assert got == [i for i in range(20) if i % 2 == 1]


def test_unpartitioned_to_identity_prunes_new_generation(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh2")).start()
    t = cat.create_table("db.evo2", SCHEMA)
    t.append(spark.createDataFrame(ROWS1, SCHEMA).coalesce(1))
    t.update_partition_spec(["grp"])
    t.append(spark.createDataFrame(ROWS2, SCHEMA))
    assert _keys(t) == list(range(20))
    # new generation: one file per grp value → the non-matching partition
    # file is pruned; the old mixed file survives pruning (correctly)
    files = t.plan_files()
    pruned = t.plan_files({"grp": ("=", "odd")})
    assert len(pruned) < len(files)
    got = sorted(r["k"] for r in t.scan(predicates={"grp": ("=", "odd")}).collect())
    assert got == [i for i in range(20) if i % 2 == 1]


def test_transform_evolution_and_compaction_migrates_layout(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh3")).start()
    t = cat.create_table("db.evo3", SCHEMA, partition_cols=["grp"])
    t.append(spark.createDataFrame(ROWS1, SCHEMA))
    t.update_partition_spec(["bucket(4, k)"])
    t.append(spark.createDataFrame(ROWS2, SCHEMA))
    assert _keys(t) == list(range(20))
    # compaction rewrites everything under the CURRENT spec
    compact(t, target_file_size=64 * 1024 * 1024, small_file_threshold=1 << 20)
    assert _keys(t) == list(range(20))
    assert all("_p_k_bucket_4=" in f["file_path"] for f in t.plan_files())
    # grp still scans correctly from file contents after the migration
    got = sorted(r["k"] for r in t.scan(predicates={"grp": ("=", "even")}).collect())
    assert got == [i for i in range(20) if i % 2 == 0]


def test_unknown_source_column_raises(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh4")).start()
    t = cat.create_table("db.evo4", SCHEMA)
    with pytest.raises(KeyError):
        t.update_partition_spec(["nope"])


def test_spec_survives_restart(spark, tmp_path):
    root = str(tmp_path / "wh5")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("db.evo5", SCHEMA, partition_cols=["grp"])
    t.append(spark.createDataFrame(ROWS1, SCHEMA))
    t.update_partition_spec(["truncate(2, grp)"])
    cat.stop()
    t2 = LocalLakeCatalog(spark, root).start().load_table("db.evo5")
    assert t2.partition_spec == [
        {"transform": "truncate", "source": "grp", "param": 2}
    ]
    assert _keys(t2) == list(range(10))
