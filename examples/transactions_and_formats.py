"""Round-4 surfaces in one runnable tour:

    python examples/transactions_and_formats.py

1. Multi-table transactions — write a fact and a dim atomically, watch
   an aborted transaction leave nothing behind, and crash-recover.
2. The catalog-service commit strategy (database row = commit
   authority, the JdbcCatalog design).
3. Avro ingest/export through the spec-native OCF codec.
4. The same transaction driven through SQL (BEGIN ... COMMIT).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from icebergplus_spark import get_spark  # noqa: E402
from icebergplus_spark.lake import (  # noqa: E402
    CatalogServiceCommitIO,
    LocalLakeCatalog,
    recover_transactions,
)
from icebergplus_spark.lake.sql_dml import lake_sql  # noqa: E402
from icebergplus_spark.sources.avro_io import (  # noqa: E402
    read_avro_dataset,
    write_avro_dataset,
)

spark = get_spark("txn-demo", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")

# --- a warehouse whose commit authority is a database row (sqlite
# embedded; Postgres/DynamoDB in production — the reference's H2 role)
catalog = LocalLakeCatalog(
    spark, tempfile.mkdtemp(), commit_io=CatalogServiceCommitIO()
).start()

fact = catalog.create_table(
    "demo.fact", spark.createDataFrame([], "k long, amount double").schema
)
dim = catalog.create_table(
    "demo.dim", spark.createDataFrame([], "k long, name string").schema
)

# --- 1. atomic multi-table write: both tables advance in one flip
with catalog.transaction() as txn:
    txn.append("demo.fact", spark.createDataFrame([(1, 10.0), (2, 20.0)], fact.schema))
    txn.append("demo.dim", spark.createDataFrame([(1, "one"), (2, "two")], dim.schema))
print("after txn:", fact.refresh().scan().count(), "facts,",
      dim.refresh().scan().count(), "dims")

# --- an aborted transaction leaves NOTHING visible, even though its
# staged metadata versions exist on disk
try:
    with catalog.transaction() as txn:
        txn.append("demo.fact", spark.createDataFrame([(3, 30.0)], fact.schema))
        raise RuntimeError("simulated failure before publish")
except RuntimeError:
    pass
print("after aborted txn:", fact.refresh().scan().count(), "facts (unchanged)")

# --- crash recovery is one idempotent sweep (catalog.start runs it too)
print("recovery sweep:", recover_transactions(catalog) or "nothing to settle")

# --- 2. the same atomicity through SQL
lake_sql(catalog, """
    BEGIN TRANSACTION;
    INSERT INTO demo.fact VALUES (3, 30.0), (4, 40.0);
    INSERT INTO demo.dim VALUES (3, 'three'), (4, 'four');
    COMMIT""")
print("after SQL txn:", lake_sql(
    catalog,
    "SELECT COUNT(*) AS n FROM demo.fact JOIN demo.dim USING (k)"
).collect()[0]["n"], "joined rows")

# --- 3. Avro round trip (spec-native codec; one OCF per partition out,
# per-file executor decode back in)
avro_dir = tempfile.mkdtemp() + "/fact_avro"
write_avro_dataset(fact.refresh().scan(), avro_dir)
back = read_avro_dataset(spark, avro_dir, fact.schema)
print("avro round trip:", back.count(), "rows,",
      back.agg(F.sum("amount")).collect()[0][0], "total amount")

# ... and straight into a table, idempotently (replay = no-op)
lake_sql(catalog, f"COPY INTO demo.fact FROM '{avro_dir}' FILEFORMAT = AVRO")
n1 = fact.refresh().scan().count()
lake_sql(catalog, f"COPY INTO demo.fact FROM '{avro_dir}' FILEFORMAT = AVRO")
assert fact.refresh().scan().count() == n1, "COPY INTO replay must be a no-op"
print("after COPY INTO + replay:", n1, "facts (replay skipped)")
