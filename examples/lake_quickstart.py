"""Quickstart: the lake layer end-to-end in ~40 lines.

    python examples/lake_quickstart.py

Creates a versioned table, commits data, evolves the schema, compacts,
time-travels, and reads everything back with SQL.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from icebergplus_spark import get_spark  # noqa: E402
from icebergplus_spark.lake import LocalLakeCatalog, MetricsSink, compact  # noqa: E402

spark = get_spark("lake-quickstart", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")

sink = MetricsSink()
catalog = LocalLakeCatalog(spark, tempfile.mkdtemp(), metrics_sink=sink).start()

# create + append (each append = one atomic snapshot)
docs = catalog.create_table(
    "demo.docs", spark.createDataFrame([], "doc_id long, text string").schema
)
docs.append(spark.createDataFrame([(1, "hello world"), (2, "hello lake")], docs.schema))
docs.append(spark.createDataFrame([(3, "third commit")], docs.schema))
print("rows:", docs.scan().count(), "| snapshots:", len(docs.history()))

# schema evolution: metadata-only, old files read as NULL / renamed
docs = docs.add_column("lang", "string").rename_column("text", "content")
docs.append(spark.createDataFrame([(4, "vierter", "de")], docs.schema))
docs.to_view("docs")
spark.sql("SELECT doc_id, content, lang FROM docs ORDER BY doc_id").show()

# time travel: the world before the rename/append
print("at snapshot 1:", docs.scan(snapshot_id=1).count(), "rows")

# maintenance: bin-pack small files, stats-pruned scan planning
print("compaction:", compact(docs))
print("files matching doc_id>=3:", len(docs.plan_files({"doc_id": (">=", 3)})))

# observability: the reference's commit meters, accumulated —
# tableName-tagged counters AND untagged timers (Micrometer parity)
for name in sorted(sink.meter_names):
    counter = sink.get(name)
    if counter is not None:
        print(f"{name} = {counter.value}")
    else:
        timer = sink.get_timer(name)
        print(f"{name} = {timer.count} samples, {timer.total_time_s:.3f}s")

# row-level DML: copy-on-write UPDATE and multi-clause MERGE INTO
docs.update_where({"doc_id": ("=", 2)}, {"lang": "en"})
src = spark.createDataFrame([(2, "hello LAKE", "en"), (9, "ninth", "fr")], docs.schema)
docs.merge_into(
    src,
    on="doc_id",
    when_matched_update={"content": F.col("src_content")},
)
docs.to_view("docs")  # re-register: views capture the scan at a snapshot
spark.sql("SELECT doc_id, content, lang FROM docs ORDER BY doc_id").show()

# row-level CDC: every change since snapshot 2, tagged insert/delete
docs.scan_changelog(from_snapshot_id=2).orderBy(
    "_commit_snapshot_id", "_change_type", "doc_id"
).show(truncate=False)

# atomic upsert: equality tombstone + new rows in ONE snapshot
docs.upsert(
    spark.createDataFrame([(3, "third, revised", "en")], docs.schema), key="doc_id"
)

# zero-copy clone: a full-table sandbox in O(manifests) — experiments
# write to the clone's own directory, the source never sees them
sandbox = catalog.clone_table("demo.docs", "demo.docs_sandbox")
sandbox.append(spark.createDataFrame([(99, "experiment", "xx")], sandbox.schema))
print("source rows:", docs.refresh().scan().count(),
      "| sandbox rows:", sandbox.scan().count())

# rename: catalog-pointer move, files stay put
catalog.rename_table("demo.docs_sandbox", "demo.docs_experiment")
print("tables:", catalog.list_tables())
