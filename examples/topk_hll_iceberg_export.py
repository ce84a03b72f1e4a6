"""Round-12 surfaces in one runnable script:

    python examples/topk_hll_iceberg_export.py

- the "latest N rows" read: ``ORDER BY ts DESC LIMIT k`` scans only
  the files whose max(ts) can still reach the global top-k
  (``plan_files_topk`` — min-ordered row accounting proves the bound),
- APPROX_COUNT_DISTINCT answered from write-time HyperLogLog register
  sketches merged across files (``write.stats.hll-columns`` opt-in) —
  the metadata tier for columns whose exact distinct sets overflow
  ``write.stats.distinct-cap``,
- an insert-off MERGE whose lake-table SOURCE is pruned by the
  target's key domain (``scan_pruned_for_merge`` — the incremental-
  ingest shape where the source is also huge),
- ``export_iceberg_snapshot``: the table's current snapshot
  materialized as a genuine Apache Iceberg v2 metadata tree (readable
  by external Iceberg engines) over the very same parquet files.
"""

import json
import os
import sys
import tempfile
from datetime import datetime, timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.lake.iceberg_export import export_iceberg_snapshot
from icebergplus_spark.lake.sql_dml import lake_sql
from icebergplus_spark.session import get_spark
from icebergplus_spark.sources.avro_io import read_ocf_generic

T = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("user_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("amount", DoubleType(), True),
    ]
)


def main() -> None:
    spark = get_spark("topk-hll-export-example", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="r12_example_")
    cat = LocalLakeCatalog(spark, root).start()

    t = cat.create_table("demo.events", T)
    t.set_property("write.stats.hll-columns", "user_id")

    base = datetime(2026, 1, 1)
    n = 0
    for day in range(4):  # four daily ingests → four time-ordered files
        rows = [
            (
                n + i,
                (n + i) * 2654435761 % 50_000,  # high-NDV user ids
                base + timedelta(days=day, seconds=i),
                float(i % 100),
            )
            for i in range(2_000)
        ]
        t.append(spark.createDataFrame(rows, T).coalesce(1))
        n += 2_000

    # 1. latest-5 read: the planner keeps ONE of the four files
    kept = t.plan_files_topk("ts", 5, descending=True)
    print(f"top-k pruning: {len(kept)} of {len(t.plan_files())} files kept")
    lake_sql(
        cat,
        "SELECT event_id, ts FROM demo.events "
        "ORDER BY ts DESC, event_id ASC LIMIT 5",
    ).show(truncate=False)

    # 2. approximate NDV from merged write-time sketches (no data read)
    row = lake_sql(
        cat,
        "SELECT APPROX_COUNT_DISTINCT(user_id) AS approx_users, "
        "COUNT(*) AS n FROM demo.events",
    ).first()
    print(f"approx users: {row['approx_users']} of {row['n']} events")

    # 3. insert-off MERGE with a source-pruned lake table
    churn = cat.create_table(
        "demo.churned",
        StructType([StructField("user_id", LongType(), True)]),
    )
    # two chunk files: the second lies entirely above the target's
    # user_id domain, so the source pruner drops it unread
    for lo, hi in ((0, 30_000), (60_000, 120_000)):
        churn.append(
            spark.createDataFrame(
                [(i,) for i in range(lo, hi, 9)], churn.schema
            ).coalesce(1)
        )
    pruned = churn.scan_pruned_for_merge(t, ["user_id"])
    print(
        "merge source pruning:",
        "engaged" if pruned is not None else "declined (nothing to cut)",
    )
    lake_sql(
        cat,
        "MERGE INTO demo.events t USING demo.churned s "
        "ON t.user_id = s.user_id WHEN MATCHED THEN DELETE",
    )
    print("events after churn delete:", t.refresh().scan().count())

    # 4. export the snapshot as a genuine Iceberg v2 metadata tree
    dest = tempfile.mkdtemp(prefix="r12_iceberg_")
    meta_path = export_iceberg_snapshot(t, dest)
    with open(meta_path) as f:
        md = json.load(f)
    _, [mlist] = read_ocf_generic(md["snapshots"][0]["manifest-list"])
    _, entries = read_ocf_generic(mlist["manifest_path"])
    print(
        f"iceberg export: format v{md['format-version']}, "
        f"{len(entries)} data files, "
        f"{sum(e['data_file']['record_count'] for e in entries)} records, "
        f"metadata at {meta_path}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
