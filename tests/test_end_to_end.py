"""End-to-end lifecycle: stream ingestion → partitioned lake table →
incremental rollup → compaction → snapshot expiry, verifying row-level
correctness and metrics at every stage. The 'day in the life' of the
engine — every layer from COVERAGE.md exercised in one flow."""

import pyspark.sql.functions as F

from icebergplus_spark.lake import LocalLakeCatalog, MetricsSink, compact, expire_snapshots
from icebergplus_spark.lake.rollup import full_recompute, refresh_rollup, rollup_table_schema
from icebergplus_spark.sources import load_table
from icebergplus_spark.streaming import read_events_stream, stream_to_lake


def test_full_lifecycle(spark, sf_dir, tmp_path):
    sink = MetricsSink()
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh"), metrics_sink=sink).start()
    ev = load_table(spark, sf_dir, "events")
    n_total = ev.count()

    # 1. stream events into a lake table, one snapshot per micro-batch
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    ev.filter(F.col("ts") < "2024-01-15").coalesce(2).write.parquet(
        str(stream_dir), mode="overwrite"
    )
    src = cat.create_table("prod.events", ev.schema)
    q = stream_to_lake(
        read_events_stream(spark, str(stream_dir), max_files_per_trigger=1),
        src,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    src.refresh()
    n_first = ev.filter(F.col("ts") < "2024-01-15").count()
    assert src.scan().count() == n_first
    assert "iceberg.commitReport.addedRecords" in sink.meter_names

    # 2. incremental rollup over the ingested snapshots
    rollup = cat.create_table("prod.events_hourly", rollup_table_schema())
    refresh_rollup(src, rollup)
    assert rollup.scan().count() == full_recompute(src).count()

    # 3. late batch lands → append → incremental refresh stays correct
    src.append(ev.filter(F.col("ts") >= "2024-01-15"))
    refresh_rollup(src, rollup)
    assert src.scan().count() == n_total
    got = {
        (str(r["bucket"]), r["event_type"]): r["n_events"]
        for r in rollup.scan().collect()
    }
    want = {
        (str(r["bucket"]), r["event_type"]): r["n_events"]
        for r in full_recompute(src).collect()
    }
    assert got == want

    # 4. compaction shrinks the small-file tail without changing content
    before = src.plan_files()
    summary = compact(src, target_file_size=512 * 1024 * 1024)
    assert summary["compacted"] > 1
    assert len(src.plan_files()) < len(before)
    assert src.scan().count() == n_total

    # 5. expiry vacuums pre-compaction snapshots; current view unaffected
    result = expire_snapshots(src, keep_last=1)
    assert result["expired"] >= 1
    assert src.scan().count() == n_total

    # 6. scan planning still prunes by time on the compacted table
    pruned = src.scan({"ts": (">=", "2024-01-25 00:00:00")})
    expected = ev.filter(F.col("ts") >= "2024-01-25").count()
    assert pruned.count() == expected
