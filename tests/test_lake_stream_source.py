"""Streaming reads FROM the lake (snapshot-offset Python streaming
source): each append commit becomes a micro-batch; compaction and
manifest rewrites emit nothing; schema evolution and identity
partitions resolve exactly as in batch scans."""

import pytest
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from icebergplus_spark.lake import LocalLakeCatalog, compact, rewrite_manifests
from icebergplus_spark.streaming.lake_source import read_lake_stream

SCHEMA = StructType(
    [StructField("k", IntegerType(), True), StructField("s", StringType(), True)]
)


def _drain(spark, stream, tmp_path, name):
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_emits_appends_and_skips_rewrites(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.src", SCHEMA)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA).coalesce(1))
    t.append(spark.createDataFrame([(3, "c")], SCHEMA).coalesce(1))

    out = _drain(spark, read_lake_stream(spark, t.table_dir), tmp_path, "lk1")
    assert sorted((r["k"], r["s"]) for r in out.collect()) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]

    # metadata-only + data rewrites add no rows → the stream must stay
    # silent for them, then pick up the NEXT real append
    mark = t.current_snapshot_id
    rewrite_manifests(t)
    compact(t, target_file_size=1 << 28, small_file_threshold=1 << 28)
    t.append(spark.createDataFrame([(4, "d")], SCHEMA).coalesce(1))
    out2 = _drain(
        spark,
        read_lake_stream(spark, t.table_dir, from_snapshot_id=mark),
        tmp_path,
        "lk2",
    )
    assert [(r["k"], r["s"]) for r in out2.collect()] == [(4, "d")]


def test_stream_maps_renamed_and_added_columns(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh2")).start()
    t = cat.create_table("db.ev", SCHEMA)
    t.append(spark.createDataFrame([(1, "old")], SCHEMA).coalesce(1))
    t = t.rename_column("s", "label").add_column("extra", IntegerType())
    new_schema = t.schema
    t.append(
        spark.createDataFrame([(2, "new", 7)], new_schema).coalesce(1)
    )
    out = _drain(spark, read_lake_stream(spark, t.table_dir), tmp_path, "lk3")
    rows = {r["k"]: r for r in out.collect()}
    assert out.schema.fieldNames() == ["k", "label", "extra"]
    assert rows[1]["label"] == "old" and rows[1]["extra"] is None  # pre-rename file
    assert rows[2]["label"] == "new" and rows[2]["extra"] == 7


def test_stream_recovers_identity_partition_values(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh3")).start()
    t = cat.create_table("db.pt", SCHEMA, partition_cols=["k"])
    t.append(spark.createDataFrame([(1, "x"), (2, "y")], SCHEMA))
    out = _drain(spark, read_lake_stream(spark, t.table_dir), tmp_path, "lk4")
    assert sorted((r["k"], r["s"]) for r in out.collect()) == [(1, "x"), (2, "y")]


def test_medallion_bronze_to_silver_exactly_once(spark, tmp_path):
    """bronze lake table → stream source → declarative transform →
    lake sink (silver). Re-running with the SAME checkpoint after new
    bronze commits processes ONLY the increment — exactly-once from the
    checkpointed snapshot offsets, no dedup logic anywhere."""
    import pyspark.sql.functions as F

    from icebergplus_spark.streaming.pipelines import stream_to_lake

    cat = LocalLakeCatalog(spark, str(tmp_path / "wh_med")).start()
    bronze = cat.create_table("db.bronze", SCHEMA)
    bronze.append(
        spark.createDataFrame([(1, "keep"), (2, "drop"), (3, "keep")], SCHEMA)
        .coalesce(1)
    )

    silver_schema = StructType(
        [
            StructField("k", IntegerType(), True),
            StructField("s", StringType(), True),
            StructField("k2", IntegerType(), True),
        ]
    )
    silver = cat.create_table("db.silver", silver_schema)
    ckpt = str(tmp_path / "ckpt_med")

    def run_once():
        stream = (
            read_lake_stream(spark, bronze.table_dir)
            .filter(F.col("s") == "keep")
            .withColumn("k2", (F.col("k") * F.col("k")).cast("int"))
        )
        q = stream_to_lake(stream, silver, ckpt, query_name="medallion")
        q.awaitTermination(120)

    run_once()
    silver.refresh()
    assert sorted((r["k"], r["k2"]) for r in silver.scan().collect()) == [
        (1, 1),
        (3, 9),
    ]

    # more bronze commits: one new append + a compaction (must be skipped)
    bronze.append(spark.createDataFrame([(4, "keep"), (5, "drop")], SCHEMA).coalesce(1))
    compact(bronze, target_file_size=1 << 28, small_file_threshold=1 << 28)
    run_once()
    silver.refresh()
    # ONLY row 4 was added — nothing reprocessed, nothing from the rewrite
    assert sorted((r["k"], r["k2"]) for r in silver.scan().collect()) == [
        (1, 1),
        (3, 9),
        (4, 16),
    ]
    # silver history: exactly two streamed commits landed
    assert [s["operation"] for s in silver.history()] == ["append", "append"]


def test_batch_source_reads_table(spark, tmp_path):
    """spark.read.format("lake"): any Spark job reads a lake table with
    only the source registered — schema evolution, identity partitions,
    and time travel honored; MOR snapshots refused at plan time."""
    import pytest

    from icebergplus_spark.streaming.lake_source import read_lake_batch

    cat = LocalLakeCatalog(spark, str(tmp_path / "wh_batch")).start()
    t = cat.create_table("db.batch", SCHEMA, partition_cols=["s"])
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA))
    first = t.current_snapshot_id
    t.rename_column("k", "key")
    t.append(
        spark.createDataFrame(
            [(3, "c")], "key int, s string"
        )
    )

    out = read_lake_batch(spark, t.table_dir)
    assert sorted((r["key"], r["s"]) for r in out.collect()) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]
    # agrees with the native scan
    native = sorted((r["key"], r["s"]) for r in t.scan().collect())
    assert sorted((r["key"], r["s"]) for r in out.collect()) == native

    # time travel reads the pre-rename snapshot under the CURRENT schema
    tt = read_lake_batch(spark, t.table_dir, snapshot_id=first)
    assert sorted((r["key"], r["s"]) for r in tt.collect()) == [(1, "a"), (2, "b")]

    # merge-on-read snapshots are refused (tombstones need LakeTable.scan)
    t.delete_by_key(spark.createDataFrame([(1,)], "key int"))
    with pytest.raises(Exception, match="merge-on-read"):
        read_lake_batch(spark, t.table_dir).collect()


def test_batch_writer_appends_and_overwrites(spark, tmp_path):
    """df.write.format("lake"): executor-side parquet + stats harvest,
    one atomic snapshot per save; stats pruning works on the entries;
    overwrite truncate-replaces; schema mismatch fails at plan time."""
    import pytest

    from icebergplus_spark.streaming.lake_source import (
        read_lake_batch,
        write_lake_batch,
    )

    cat = LocalLakeCatalog(spark, str(tmp_path / "wh_w")).start()
    t = cat.create_table("db.dsv2", SCHEMA)
    write_lake_batch(
        spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA).repartition(2),
        t.table_dir,
    )
    write_lake_batch(spark.createDataFrame([(3, "c")], SCHEMA), t.table_dir)
    t.refresh()
    assert t.scan().count() == 3
    assert [s["operation"] for s in t._meta["snapshots"]] == ["append", "append"]
    # executor-harvested stats drive pruning like native appends
    assert len(t.plan_files({"k": ("=", 3)})) == 1
    # round trip through the batch reader
    got = read_lake_batch(spark, t.table_dir)
    assert sorted((r["k"], r["s"]) for r in got.collect()) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]

    write_lake_batch(
        spark.createDataFrame([(9, "z")], SCHEMA), t.table_dir, mode="overwrite"
    )
    t.refresh()
    assert [(r["k"], r["s"]) for r in t.scan().collect()] == [(9, "z")]

    with pytest.raises(Exception, match="schema mismatch"):
        write_lake_batch(
            spark.createDataFrame([(1.5,)], "x double"), t.table_dir
        )
