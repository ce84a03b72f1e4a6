"""End-to-end LLM training-data pipeline over the documents corpus.

    python examples/training_data_pipeline.py [sf_dir]

Chains the engine's north-star operators the way a data-curation run
would: ingest to a versioned lake table, exact + near-dup dedup,
benchmark decontamination, quality/repetition filtering, deterministic
train/val/test split, then context-window packing and balanced shard
assignment — printing corpus survival counts at each gate.

Every step is a DataFrame plan (no driver-side loops over rows); at
100 TB the same code runs with the lake table as the source and each
gate materialized as a snapshot, giving per-step time travel and CDC.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from icebergplus_spark import get_spark  # noqa: E402
from icebergplus_spark import registry  # noqa: E402
from icebergplus_spark.lake import LocalLakeCatalog  # noqa: E402
from icebergplus_spark.sources import load_table  # noqa: E402

registry.load_all()
Q = registry.QUERIES

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("training-data-pipeline", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

# -- 0. ingest: land the raw corpus as a versioned lake table -------------
catalog = LocalLakeCatalog(spark, tempfile.mkdtemp()).start()
raw = load_table(spark, sf_dir, "documents")
corpus = catalog.create_table("pipeline.documents", raw.schema)
corpus.append(raw)
n0 = corpus.scan().count()
print(f"[0 ingest       ] {n0} docs in snapshot {corpus.current_snapshot_id}")

# -- 1. exact dedup: keep the lowest doc_id per identical text ------------
keep_exact = Q["d01_exact_dedup"](spark, sf_dir).select(
    F.col("keeper_id").alias("doc_id")
)
n1 = keep_exact.count()
print(f"[1 exact dedup  ] {n1} kept ({n0 - n1} exact dupes dropped)")

# -- 2. near-dup dedup: drop every cluster member except the keeper -------
clusters = Q["d07_dup_clusters"](spark, sf_dir)
drop_near = (
    clusters.select(F.explode(F.split("members", ",")).alias("doc_id"), "keeper_id")
    .filter(F.col("doc_id").cast("long") != F.col("keeper_id"))
    .select(F.col("doc_id").cast("long").alias("doc_id"))
)
survivors = keep_exact.join(drop_near, "doc_id", "left_anti")
n2 = survivors.count()
print(f"[2 near dedup   ] {n2} kept ({n1 - n2} near-dupes dropped)")

# -- 3. decontamination: drop docs overlapping the eval benchmark ---------
contaminated = (
    Q["t20_decontaminate"](spark, sf_dir)
    .filter(F.col("contamination_rate") > 0.2)
    .select("doc_id")
)
survivors = survivors.join(contaminated, "doc_id", "left_anti")
n3 = survivors.count()
print(f"[3 decontaminate] {n3} kept ({n2 - n3} eval-contaminated dropped)")

# -- 4. quality + repetition gates ---------------------------------------
low_quality = (
    Q["t02_quality_score"](spark, sf_dir)
    .filter(~F.col("passes_quality"))
    .select("doc_id")
)
repetitive = (
    Q["t22_repetition_filter"](spark, sf_dir)
    .filter(F.col("rep_ratio") > 0.2)
    .select("doc_id")
)
survivors = survivors.join(low_quality, "doc_id", "left_anti").join(
    repetitive, "doc_id", "left_anti"
)
n4 = survivors.count()
print(f"[4 quality gates] {n4} kept ({n3 - n4} low-quality/repetitive dropped)")

# -- 5. deterministic split (md5 buckets: stable across runs/engines) -----
splits = Q["t07_hash_split"](spark, sf_dir)
print("[5 hash split   ]", {r["split"]: r["n_docs"] for r in splits.collect()})

# -- 6. pack to context windows + balance across training shards ----------
packed = Q["t12_sequence_packing"](spark, sf_dir)
shards = Q["t16_balanced_shards"](spark, sf_dir)
print(f"[6 pack + shard ] {packed.count()} packed chunks over "
      f"{shards.count()} shards")
tok = shards.agg(
    F.max("shard_tokens").alias("mx"), F.min("shard_tokens").alias("mn")
).first()
print(f"                  shard token spread: {tok['mn']}..{tok['mx']} "
      f"({100 * (tok['mx'] - tok['mn']) / max(tok['mx'], 1):.1f}%)")

# -- 7. persist the curated set as a new snapshot (time-travelable) -------
curated = corpus.scan().join(survivors, "doc_id", "left_semi")
corpus.overwrite(curated)
print(f"[7 publish      ] curated corpus snapshot "
      f"{corpus.current_snapshot_id}: {corpus.scan().count()} docs "
      f"(raw still at snapshot 1 for time travel)")

# -- 8. corpus-diversity report (r11): COUNT(DISTINCT) folds from the
#       write-time per-file value sets — per-language distinct sources
#       without scanning data files, and a batch-scoped read whose
#       IN-subquery prunes the corpus down to the recent batch's key
#       range before any row is read.
from icebergplus_spark.lake.sql_dml import lake_sql  # noqa: E402

corpus.set_property("write.stats.distinct-columns", "source")
corpus.set_property("write.stats.distinct-cap", "4096")
corpus.overwrite(corpus.scan())  # rewrite once so files carry the sets
diversity = lake_sql(
    catalog,
    "SELECT lang, COUNT(DISTINCT source) AS n_sources, COUNT(*) AS n "
    "FROM pipeline.documents GROUP BY lang ORDER BY lang",
)
print("[8 diversity    ]", {r["lang"]: r["n_sources"] for r in diversity.collect()})
