"""Medallion streaming ETL over lake tables, end to end:

    events parquet → (stream) → BRONZE lake table
    BRONZE → (snapshot-offset stream source) → transform → SILVER

Run:  python examples/streaming_medallion.py

Every bronze append commit becomes exactly one silver micro-batch;
re-running the script with the same checkpoint processes only new
commits (exactly-once from checkpointed snapshot offsets). Compactions
or manifest rewrites on bronze emit nothing downstream.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.session import get_spark
from icebergplus_spark.sources import load_table
from icebergplus_spark.streaming.lake_source import read_lake_stream
from icebergplus_spark.streaming.pipelines import stream_to_lake

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("medallion-example")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="medallion_")
    cat = LocalLakeCatalog(spark, os.path.join(root, "wh")).start()

    # -- bronze: raw events land as append commits ------------------------
    events = load_table(spark, SF_DIR, "events")
    bronze = cat.create_table("lake.events_bronze", events.schema)
    for day in [1, 2]:  # two ingest batches → two snapshots
        bronze.append(events.filter(F.dayofmonth("ts") % 2 == day % 2))
    print("bronze snapshots:", [s["operation"] for s in bronze.history()])

    # -- silver: incremental transform driven by the snapshot log ---------
    silver_src = (
        read_lake_stream(spark, bronze.table_dir)
        .filter(F.col("event_type") == "purchase")
        .withColumn("day", F.to_date("ts"))
    )
    silver = cat.create_table(
        "lake.purchases_silver", silver_src.schema, partition_cols=["day"]
    )
    q = stream_to_lake(silver_src, silver, os.path.join(root, "ckpt"), "silver")
    q.awaitTermination(300)
    silver.refresh()

    print("silver rows:", silver.count_rows(), "(metadata-only count)")
    print(
        "silver by day:",
        silver.scan().groupBy("day").count().orderBy("day").limit(5).collect(),
    )


if __name__ == "__main__":
    main()
