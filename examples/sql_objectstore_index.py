"""Round-3 surfaces in one runnable script:

    python examples/sql_objectstore_index.py

- an S3-semantics catalog (no atomic rename; the conditional create of
  each metadata version is the commit CAS),
- SQL DML + view DDL routed through lake_sql,
- threshold-driven auto-maintenance,
- a persisted IVF vector index with a snapshot-freshness contract,
- the generic batch DataSource (spark.read/write.format("lake")).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from icebergplus_spark import get_spark  # noqa: E402
from icebergplus_spark.lake import (  # noqa: E402
    DirectoryLeaseCommitLock,
    LocalLakeCatalog,
    ObjectStoreCommitIO,
    auto_maintain,
)
from icebergplus_spark.lake.sql_dml import lake_sql  # noqa: E402
from icebergplus_spark.operators.vector_index import (  # noqa: E402
    build_ivf_index,
    query_index,
)
from icebergplus_spark.streaming.lake_source import (  # noqa: E402
    read_lake_batch,
    write_lake_batch,
)

spark = get_spark("sql-objectstore-index", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")

# S3-semantics commits: rename-less CAS + cross-host lease lock
catalog = LocalLakeCatalog(
    spark,
    tempfile.mkdtemp(),
    commit_io=ObjectStoreCommitIO(lock=DirectoryLeaseCommitLock()),
).start()

t = catalog.create_table(
    "demo.scores", spark.createDataFrame([], "k int, name string, score double").schema
)

# --- SQL DML + view DDL ----------------------------------------------------
lake_sql(catalog, "INSERT INTO demo.scores VALUES (1,'a',1.0), (2,'b',2.0), (3,'c',3.0)")
lake_sql(catalog, "UPDATE demo.scores SET score = score * 10 WHERE k = 2")
lake_sql(catalog, "DELETE FROM demo.scores WHERE score <= 1.0")
t.refresh().to_view("scores_v")
lake_sql(catalog, "CREATE VIEW demo.top AS SELECT MAX(score) AS m FROM scores_v")
print("view:", catalog.load_view("demo.top").first()["m"])  # 20.0

# --- auto-maintenance ------------------------------------------------------
print("maintain:", {
    k: (v if isinstance(v, str) else "ran")
    for k, v in auto_maintain(t, min_small_files=2, orphan_grace_s=0).items()
})

# --- batch DataSource writer/reader ---------------------------------------
write_lake_batch(
    spark.createDataFrame([(9, "z", 9.0)], t.schema), t.table_dir
)
print("dsv2 read:", sorted(r["k"] for r in read_lake_batch(spark, t.table_dir).collect()))

# --- persisted vector index ------------------------------------------------
emb = catalog.create_table(
    "demo.embeddings",
    spark.createDataFrame([], "vec_id long, embedding array<float>").schema,
)
vecs = spark.range(100).select(
    F.col("id").alias("vec_id"),
    F.transform(
        F.sequence(F.lit(1), F.lit(8)),
        lambda i: F.hash(F.col("id") * 31 + i).cast("float") / 2e9,
    ).alias("embedding"),
)
emb.append(vecs)
build_ivf_index(catalog, "demo.embeddings", "demo.idx", k=8)
queries = vecs.filter(F.col("vec_id") < 2).select(
    F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
)
print("ann:", query_index(catalog, "demo.idx", queries, top_k=3).count(), "results")
print("OK")
