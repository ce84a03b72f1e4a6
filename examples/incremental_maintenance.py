"""Incremental-maintenance SQL surfaces (round 10) in one runnable script:

    python examples/incremental_maintenance.py

- the high-watermark consumer read: ``WHERE ts > (SELECT MAX(ts) FROM
  checkpoint)`` — the scalar answers from manifest stats (zero data
  reads when they cover) and inlines so the outer scan prunes,
- the compound-subquery DELETE: ``WHERE k IN (SELECT ...) AND ts < X``
  — one merge pass; the range conjunct both gates rows and keeps
  out-of-range files byte-identical,
- correlated EXISTS / NOT EXISTS DML (semi/anti joins, never a
  driver-side key collect),
- grouped SUM/AVG answered from write-time manifest column sums.
"""

import os
import sys
import tempfile
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icebergplus_spark import get_spark  # noqa: E402
from icebergplus_spark.lake import LocalLakeCatalog  # noqa: E402
from icebergplus_spark.lake.sql_dml import lake_sql  # noqa: E402

spark = get_spark("incremental-maintenance", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
catalog = LocalLakeCatalog(spark, tempfile.mkdtemp()).start()

# --- a fact table with one file per day, and a keep-list ------------------
events = catalog.create_table(
    "demo.events",
    spark.createDataFrame(
        [], "user_id long, ts timestamp, clicks long"
    ).schema,
)
for day in (1, 2, 3):
    events.append(
        spark.createDataFrame(
            [(u, datetime(2024, 1, day, u), u * day) for u in range(1, 6)],
            events.schema,
        ).coalesce(1)
    )
flagged = catalog.create_table(
    "demo.flagged", spark.createDataFrame([], "user_id long").schema
)
flagged.append(spark.createDataFrame([(2,), (4,)], flagged.schema))

# --- compound subquery DELETE: key set AND time bound ----------------------
# one merge pass; the day-3 file never rewrites (range-pruned)
lake_sql(
    catalog,
    "DELETE FROM demo.events WHERE user_id IN "
    "(SELECT user_id FROM demo.flagged) AND ts < '2024-01-03 00:00:00'",
)
print("after compound delete:", lake_sql(
    catalog, "SELECT COUNT(*) AS n FROM demo.events"
).first()["n"])

# --- NOT EXISTS anti-join DML ----------------------------------------------
keep = catalog.create_table(
    "demo.keep", spark.createDataFrame([], "user_id long").schema
)
keep.append(spark.createDataFrame([(u,) for u in range(1, 5)], keep.schema))
lake_sql(
    catalog,
    "DELETE FROM demo.events WHERE NOT EXISTS "
    "(SELECT 1 FROM demo.keep k WHERE k.user_id = events.user_id)",
)

# --- high-watermark incremental read ---------------------------------------
# the checkpoint row itself comes from a MAX fold; the outer read
# inlines it and plans only files past the watermark
cp = catalog.create_table(
    "demo.cp", spark.createDataFrame([], "wm timestamp").schema
)
lake_sql(
    catalog,
    "INSERT INTO demo.cp SELECT MAX(ts) AS wm FROM demo.events "
    "WHERE ts < '2024-01-03 00:00:00'",
)
fresh = lake_sql(
    catalog,
    "SELECT user_id, clicks FROM demo.events "
    "WHERE ts > (SELECT MAX(wm) FROM demo.cp)",
)
print("past watermark:", sorted((r["user_id"], r["clicks"]) for r in fresh.collect()))

# --- grouped SUM/AVG from manifest column sums ------------------------------
# integer sums are harvested at write time; this aggregate folds from
# metadata for fully-covered files
agg = lake_sql(
    catalog,
    "SELECT user_id, SUM(clicks) AS total, AVG(clicks) AS mean "
    "FROM demo.events GROUP BY user_id ORDER BY user_id",
)
print("click totals:")
for r in agg.collect():
    print(f"  user {r['user_id']}: total={r['total']} mean={r['mean']}")

spark.stop()
print("OK")
