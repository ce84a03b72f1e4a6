"""Round-5 surfaces in one runnable script:

    python examples/rest_and_deletion_vectors.py

- a warehouse served over the Iceberg-REST-style HTTP shim (the
  server's database-row CAS is the commit authority; this process is
  both server and client, as two catalog instances),
- deletion vectors (Iceberg v3): two stacked predicate deletes merge
  into one bitmap per data file, applied vectorized at scan,
- vector consolidation + auto-maintenance,
- a continuous aggregate that stays exact while the source takes
  deletes (changelog-driven bucket invalidation).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from icebergplus_spark import get_spark  # noqa: E402
from icebergplus_spark.lake import (  # noqa: E402
    LakeRestServer,
    RestLakeCatalog,
    rewrite_deletion_vectors,
)

spark = get_spark("rest-dv-demo", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")

# ---- REST catalog: server + HTTP client over one warehouse ----------------
server = LakeRestServer(tempfile.mkdtemp()).start()
print(f"REST catalog serving at {server.base_url}")
catalog = RestLakeCatalog(spark, server.base_url).start()

events = catalog.create_table(
    "demo.events",
    spark.createDataFrame([], "ts timestamp, kind string, value double").schema,
)
rows = [
    (f"2024-01-01 0{h}:{m:02d}:00", kind, float(h * 10 + m))
    for h in range(3)
    for m in (5, 25, 45)
    for kind in ("view", "click")
]
batch = spark.createDataFrame(rows, "ts string, kind string, value double").select(
    F.col("ts").cast("timestamp"), "kind", "value"
)
events.append(batch)
print("tables over HTTP:", catalog.list_tables())

# ---- deletion vectors: v3 MoR without delete-file pileup ------------------
events.set_property("delete.representation", "dv")
events.delete_where({"value": (">", 20.0)})   # vector per affected file
events.delete_where({"value": ("<", 1.0)})    # MERGES into the same vectors
snap = events.snapshot()
print(
    "after 2 vector deletes:",
    events.scan().count(),
    "rows live;",
    snap["summary"]["total-position-deletes"],
    "positions tombstoned in",
    snap["summary"]["total-delete-files"],
    "vector file(s)",
)
print("consolidation:", rewrite_deletion_vectors(events))

# ---- continuous aggregate staying exact under those deletes ---------------
from icebergplus_spark.lake.rollup import (  # noqa: E402
    full_recompute,
    refresh_rollup,
    rollup_table_schema,
)

ev_batch = batch.withColumnRenamed("kind", "event_type")
src = catalog.create_table("demo.src", ev_batch.schema)
roll = catalog.create_table("demo.rollup", rollup_table_schema())
src.append(ev_batch)
refresh_rollup(src, roll, window="hour")
src.delete_where({"value": (">", 20.0)})      # invalidates touched buckets
refresh_rollup(src, roll, window="hour")
inc = {
    (str(r["bucket"]), r["event_type"]): (r["n_events"], r["sum_value"])
    for r in roll.scan().collect()
}
full = {
    (str(r["bucket"]), r["event_type"]): (r["n_events"], r["sum_value"])
    for r in full_recompute(src, window="hour").collect()
}
assert inc == full, "incremental rollup diverged from full recompute"
print(f"rollup exact under deletes: {len(inc)} cells match the recompute")

server.stop()
print("done")
