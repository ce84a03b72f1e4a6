"""Streaming CDC reads FROM the lake (`read_lake_cdc_stream`): each
committed snapshot's row-level changes arrive as micro-batch rows tagged
_change_type/_commit_snapshot_id. File-granular Iceberg changelog-scan
semantics: CoW rewrites emit old-file deletes + new-file inserts;
merge-on-read tombstones emit exactly the deleted rows; compaction emits
nothing."""

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from icebergplus_spark.lake import LocalLakeCatalog, compact
from icebergplus_spark.streaming.lake_source import read_lake_cdc_stream

SCHEMA = StructType(
    [
        StructField("id", IntegerType(), True),
        StructField("grp", StringType(), True),
        StructField("val", DoubleType(), True),
    ]
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


def test_cdc_stream_appends_and_mor_deletes(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.cdc", SCHEMA)
    t.append(spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], SCHEMA).coalesce(1))
    s1 = t.current_snapshot_id
    # position tombstone (no data rewrite) then equality tombstone
    t.delete_where({"id": ("=", 1)})
    t.delete_by_key(spark.createDataFrame([("b",)], "grp string"))

    out = _drain(spark, read_lake_cdc_stream(spark, t.table_dir), tmp_path, "cdc1")
    changes = sorted(
        (r["id"], r["_change_type"], r["_commit_snapshot_id"]) for r in out.collect()
    )
    assert changes == [
        (1, "delete", s1 + 1),  # position tombstone resolved to its row
        (1, "insert", s1),
        (2, "delete", s1 + 2),  # equality tombstone matched in-file
        (2, "insert", s1),
    ]
    assert out.schema.fieldNames() == [
        "id",
        "grp",
        "val",
        "_change_type",
        "_commit_snapshot_id",
    ]


def test_cdc_stream_cow_update_and_compaction_silence(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh2")).start()
    t = cat.create_table("db.cdc2", SCHEMA)
    t.append(spark.createDataFrame([(1, "a", 1.0), (2, "a", 2.0)], SCHEMA).coalesce(1))
    t.append(spark.createDataFrame([(3, "b", 3.0)], SCHEMA).coalesce(1))
    mark = t.current_snapshot_id

    # compaction rewrites files but changes no rows → stream stays silent
    compact(t, target_file_size=1 << 28, small_file_threshold=1 << 28)
    out0 = _drain(
        spark,
        read_lake_cdc_stream(spark, t.table_dir, from_snapshot_id=mark),
        tmp_path,
        "cdc2a",
    )
    assert out0.count() == 0

    # CoW update: file-granular changelog — the rewritten file's old
    # rows emit as deletes, its new rows as inserts (Iceberg
    # net_changes=false parity); untouched rows emit nothing
    mark2 = t.current_snapshot_id
    t.update_where({"id": ("=", 2)}, {"val": 22.0})
    out = _drain(
        spark,
        read_lake_cdc_stream(spark, t.table_dir, from_snapshot_id=mark2),
        tmp_path,
        "cdc2b",
    )
    rows = [(r["id"], r["val"], r["_change_type"]) for r in out.collect()]
    assert (2, 2.0, "delete") in rows and (2, 22.0, "insert") in rows
    # post-compaction there is ONE data file holding ids 1..3, so the
    # rewrite diff touches exactly those rows
    assert sorted(r[0] for r in rows if r[2] == "delete") == [1, 2, 3]
    assert sorted(r[0] for r in rows if r[2] == "insert") == [1, 2, 3]

    # replaying the full log and netting insert-minus-delete per key
    # reconstructs current state even through the CoW noise
    from collections import Counter

    full = _drain(spark, read_lake_cdc_stream(spark, t.table_dir), tmp_path, "cdc2c")
    net: Counter = Counter()
    for r in full.collect():
        net[(r["id"], r["grp"], r["val"])] += (
            1 if r["_change_type"] == "insert" else -1
        )
    replayed = sorted(k for k, n in net.items() for _ in range(n))
    assert replayed == sorted(map(tuple, t.scan().collect()))


def test_cdc_stream_append_after_eq_delete_is_exempt(spark, tmp_path):
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh3")).start()
    t = cat.create_table("db.cdc3", SCHEMA)
    t.append(spark.createDataFrame([(1, "x", 1.0)], SCHEMA).coalesce(1))
    t.delete_by_key(spark.createDataFrame([("x",)], "grp string"))
    # same key appended AFTER the tombstone: sequence semantics say it
    # survives, so the stream must NOT emit a delete for it
    t.append(spark.createDataFrame([(9, "x", 9.0)], SCHEMA).coalesce(1))

    out = _drain(spark, read_lake_cdc_stream(spark, t.table_dir), tmp_path, "cdc3")
    changes = sorted(
        (r["id"], r["_change_type"]) for r in out.collect()
    )
    assert changes == [(1, "delete"), (1, "insert"), (9, "insert")]


def test_cdc_replication_lake_to_lake(spark, tmp_path):
    from icebergplus_spark.streaming.pipelines import stream_replicate_lake

    cat = LocalLakeCatalog(spark, str(tmp_path / "whr")).start()
    src = cat.create_table("db.src", SCHEMA)
    dst = cat.create_table("db.dst", SCHEMA)
    ckpt = str(tmp_path / "ckpt_repl")

    src.append(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], SCHEMA
        ).coalesce(1)
    )
    src.update_where({"id": ("=", 2)}, {"val": 22.0})

    q = stream_replicate_lake(spark, src.table_dir, dst, ckpt)
    q.awaitTermination(120)
    assert sorted(map(tuple, dst.scan().collect())) == sorted(
        map(tuple, src.scan().collect())
    )

    # more commits (MOR tombstones + append), resume from checkpoint:
    # only the NEW commits are applied
    src.delete_where({"id": ("=", 1)})
    src.append(spark.createDataFrame([(4, "d", 4.0)], SCHEMA).coalesce(1))
    q2 = stream_replicate_lake(spark, src.table_dir, dst, ckpt)
    q2.awaitTermination(120)
    assert sorted(map(tuple, dst.scan().collect())) == [
        (2, "b", 22.0),
        (3, "c", 3.0),
        (4, "d", 4.0),
    ]


def test_cdc_stream_over_atomic_upsert(spark, tmp_path):
    """An upsert snapshot must stream as the pre-image delete plus the
    new-row inserts in ONE commit id — and the rows inserted by the same
    commit must not be swallowed by its own tombstone."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from icebergplus_spark.lake import LocalLakeCatalog
    from icebergplus_spark.streaming.lake_source import read_lake_cdc_stream

    schema = StructType(
        [StructField("k", LongType(), True), StructField("s", StringType(), True)]
    )
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("db.cdcu", schema)
    t.append(spark.createDataFrame([(1, "old"), (2, "keep")], schema).coalesce(1))
    t.upsert(spark.createDataFrame([(1, "new"), (3, "add")], schema).coalesce(1), "k")
    upsert_id = t.current_snapshot_id

    out = (
        read_lake_cdc_stream(spark, t.table_dir)
        .writeStream.format("memory")
        .queryName("cdc_upsert_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination(120)
    rows = spark.sql("SELECT * FROM cdc_upsert_out").collect()
    changes = {
        (r["_change_type"], r["k"], r["s"], r["_commit_snapshot_id"]) for r in rows
    }
    assert ("insert", 1, "old", 1) in changes
    assert ("insert", 2, "keep", 1) in changes
    # the upsert commit: pre-image delete + both new-row inserts
    assert ("delete", 1, "old", upsert_id) in changes
    assert ("insert", 1, "new", upsert_id) in changes
    assert ("insert", 3, "add", upsert_id) in changes
    # nothing else (2 stays untouched; no spurious deletes)
    assert len(changes) == 5


def test_cdc_replication_across_upserts(spark, tmp_path):
    """Replication converges across atomic upsert commits: the replica
    nets out each upsert's delete+insert pair and matches the source."""
    from icebergplus_spark.streaming.pipelines import stream_replicate_lake

    cat = LocalLakeCatalog(spark, str(tmp_path / "whu")).start()
    src = cat.create_table("db.usrc", SCHEMA)
    dst = cat.create_table("db.udst", SCHEMA)
    ckpt = str(tmp_path / "ckpt_repl_u")

    src.append(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0)], SCHEMA
        ).coalesce(1)
    )
    src.upsert(
        spark.createDataFrame([(1, "A", 11.0), (3, "c", 3.0)], SCHEMA).coalesce(1),
        "id",
    )
    q = stream_replicate_lake(spark, src.table_dir, dst, ckpt)
    q.awaitTermination(120)
    assert sorted(map(tuple, dst.scan().collect())) == sorted(
        map(tuple, src.scan().collect())
    )

    # a second upsert, resumed from checkpoint
    src.upsert(spark.createDataFrame([(2, "B", 22.0)], SCHEMA).coalesce(1), "id")
    q2 = stream_replicate_lake(spark, src.table_dir, dst, ckpt)
    q2.awaitTermination(120)
    assert sorted(map(tuple, dst.scan().collect())) == [
        (1, "A", 11.0),
        (2, "B", 22.0),
        (3, "c", 3.0),
    ]


def test_cdc_replication_onto_dv_replica(spark, tmp_path):
    """r5 integration: the replica runs under deletion vectors with
    equality-to-vector materialization (delete.eq-to-dv) — CDC-applied
    deletes land as merged bitmaps, replica state still tracks the
    source exactly across a checkpoint-resumed second run, and the
    replay watermark survives the DV commit path."""
    from icebergplus_spark.streaming.pipelines import stream_replicate_lake

    cat = LocalLakeCatalog(spark, str(tmp_path / "whrdv")).start()
    src = cat.create_table("db.srcdv", SCHEMA)
    dst = cat.create_table("db.dstdv", SCHEMA)
    dst.set_property("delete.representation", "dv")
    dst.set_property("delete.eq-to-dv", "true")
    ckpt = str(tmp_path / "ckpt_repl_dv")

    src.append(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], SCHEMA
        ).coalesce(1)
    )
    src.update_where({"id": ("=", 2)}, {"val": 22.0})
    stream_replicate_lake(spark, src.table_dir, dst, ckpt).awaitTermination(120)
    dst.refresh()
    assert sorted(map(tuple, dst.scan().collect())) == sorted(
        map(tuple, src.scan().collect())
    )
    # replica tombstones are vectors, never equality files
    contents = {e["content"] for e in dst._delete_entries(dst.snapshot())}
    assert contents <= {"dv"}

    src.delete_where({"id": ("=", 1)})
    src.append(spark.createDataFrame([(4, "d", 4.0)], SCHEMA).coalesce(1))
    stream_replicate_lake(spark, src.table_dir, dst, ckpt).awaitTermination(120)
    dst.refresh()
    assert sorted(map(tuple, dst.scan().collect())) == [
        (2, "b", 22.0),
        (3, "c", 3.0),
        (4, "d", 4.0),
    ]
    # re-running on the SAME checkpoint is a no-op (the batch-id
    # watermark survived the DV commit path via extra_summary)
    n_snaps = len(dst.history())
    stream_replicate_lake(spark, src.table_dir, dst, ckpt).awaitTermination(120)
    dst.refresh()
    assert len(dst.history()) == n_snaps
    assert sorted(map(tuple, dst.scan().collect())) == [
        (2, "b", 22.0),
        (3, "c", 3.0),
        (4, "d", 4.0),
    ]
