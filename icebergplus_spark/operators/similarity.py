"""Embedding similarity search (north star; SURVEY.md §2.B "similarity").

- s01: brute-force cosine top-k — the exactness baseline. Query set is
  broadcast; the big side streams once. At 100 TB this is the pattern
  for "small query batch × huge corpus" (broadcast-nested-loop with
  vectorized dot products), NOT corpus × corpus.
- s02: LSH (random-hyperplane) bucketed ANN — the scale path: corpus is
  hashed once into 2^P sign buckets; probes only touch matching buckets
  (+ multiprobe neighbors), turning O(N·Q) into O(N/2^P · Q) per probe.

Dot products are computed with JVM higher-order functions in DOUBLE with
left-to-right folds so Spark and the DuckDB oracle agree bit-for-bit
(then rounded to 6dp for the hash anyway).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from icebergplus_spark.localrel import local_rows_df
from icebergplus_spark.registry import register
from icebergplus_spark.session import prepare_session
from icebergplus_spark.sources import load_table

N_QUERIES = 10  # vec_id < 10 are the probe vectors
TOP_K = 5

# Index artifacts (vector dim, trained centroids/codebooks, query LUTs)
# are built once per corpus and reused across searches — that is what an
# ANN *index* is. Keyed by sf_dir: testdata is immutable, and at 100 TB
# the same artifacts live in the table's metadata next to the data.
_INDEX_CACHE: dict[tuple, object] = {}


def _cached(key: tuple, build):
    if key not in _INDEX_CACHE:
        _INDEX_CACHE[key] = build()
    return _INDEX_CACHE[key]


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, "embeddings")


def _dim(emb: DataFrame, sf_dir: str) -> int:
    return _cached(("dim", sf_dir), lambda: emb.select(F.size("embedding")).first()[0])


def dot(a, b):
    """Σ a[i]*b[i] in double, strict left-to-right fold (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a, b):
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


# ---------------------------------------------------------------------------
# Planted ANN ground truth (r11): the three approximate methods
# (s02 LSH, s04 IVF, s05 PQ) are approximate BY CONSTRUCTION over
# arbitrary queries, so their raw top-k was rows-only-checkable. The
# registered queries are reshaped to a HASH-EXACT report instead:
#
#   * PLANT_TARGETS corpus vectors are copied verbatim as extra query
#     vectors (query_id = -(vec_id+1)). The true nearest neighbor of a
#     planted query is its source vector at cosine 1.0 (verified: the
#     testdata corpus has no duplicate embeddings; runner-up cosine
#     ≤ 0.5 at every SF), and EVERY sane ANN index must retrieve an
#     identical vector — same sign bits, same IVF cell, same PQ codes.
#   * The report emits, per planted query: the exact top-1 recomputed
#     by brute force (expected_id — the DuckDB oracle recomputes this
#     via real SQL, not a literal), the id the ANN pipeline actually
#     retrieved at rank 1 (retrieved_id), its exact rounded cosine,
#     and the method's recall@5-above-floor boolean over the standard
#     N_QUERIES query set (floors from ANN_RECALL_FLOORS, measured in
#     r4 and re-gated by s09 + tests/test_similarity.py).
#
# A broken index (missed planted vector, wrong rerank order, recall
# regression) flips retrieved_id / drops a row / flips the boolean —
# all hash-visible to the driver. The approximate top-k surface stays
# testable through the *_topk functions (s09 + tests consume them).
# ---------------------------------------------------------------------------
PLANT_TARGETS = [17, 123, 321]  # corpus ids copied as queries -(id+1)
# Floors one margin below the r4 measured minima across sf0.001/0.01/0.1
# (s02: 0.72/0.76/0.84, s04: 0.86/0.82/0.86, s05: 0.80/0.88/0.62)
ANN_RECALL_FLOORS = {"s02_ann_lsh": 0.65, "s04_ann_ivf": 0.70, "s05_ann_pq": 0.50}


def _ext_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding) with PLANT_TARGETS copied as negative-id
    query rows. Planted rows are QUERIES only — every corpus side below
    filters vec_id >= 0 so index contents are unchanged."""
    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id").isin(PLANT_TARGETS)).select(
        (-(F.col("vec_id") + F.lit(1))).alias("vec_id"), "embedding"
    )
    return emb.unionByName(planted)


def _ext_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard + planted QUERY rows only (N_QUERIES + planted —
    tiny). The index-side pipelines hash/encode the corpus from the
    original table in ONE pass and run the same UDF separately over
    this small frame; routing the whole union through the corpus UDF
    doubled every scan branch (measured ~2× wall on s04, r11)."""
    return _ext_emb(spark, sf_dir).filter(F.col("vec_id") < N_QUERIES)


def _exact_top1_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, expected_id): brute-force exact top-1 for each planted
    query — the s01 shape (broadcast query batch × corpus stream)."""
    emb = _emb(spark, sf_dir)
    pq = emb.filter(F.col("vec_id").isin(PLANT_TARGETS)).select(
        (-(F.col("vec_id") + F.lit(1))).alias("query_id"),
        F.col("embedding").alias("qv"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("expected_id"), F.col("embedding").alias("cv")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("c").desc(), "expected_id")
    return (
        corpus.crossJoin(F.broadcast(pq))
        .select(
            "query_id",
            "expected_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("c"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", "expected_id")
    )


def _exact_pairs(spark: SparkSession, sf_dir: str) -> set:
    """The exact (query_id, neighbor_id) top-k pairs for the standard
    query set, collected ONCE per corpus and session-cached — shared
    by all three ANN reports and s09 (50 tuples; the brute-force job
    runs once, not once per method)."""
    return _cached(
        ("exact_pairs", sf_dir),
        lambda: {
            (r["query_id"], r["neighbor_id"])
            for r in s01_topk_bruteforce(spark, sf_dir)
            .select("query_id", "neighbor_id")
            .collect()
        },
    )


def _ann_report(spark: SparkSession, sf_dir: str, method: str, topk: DataFrame) -> DataFrame:
    """Hash-exact report for one ANN method (see block comment above).
    ONE action over the approximate pipeline: the full top-k is tiny
    ((N_QUERIES + planted) × TOP_K rows), so it collects once and the
    recall boolean + planted rows derive driver-side — two actions
    over the same lineage would execute the whole index build twice
    (measured ~2× wall on s04, r11)."""
    rows = topk.collect()
    exact = _exact_pairs(spark, sf_dir)
    hits = sum(
        1
        for r in rows
        if r["query_id"] >= 0 and (r["query_id"], r["neighbor_id"]) in exact
    )
    recall_ok = bool(
        hits / (N_QUERIES * TOP_K) >= ANN_RECALL_FLOORS[method]
    )
    expected = _cached(
        ("planted_top1", sf_dir),
        lambda: {
            r["query_id"]: r["expected_id"]
            for r in _exact_top1_planted(spark, sf_dir).collect()
        },
    )
    out = [
        (
            int(r["query_id"]),
            int(expected[r["query_id"]]),
            int(r["neighbor_id"]),
            float(r["cos_sim"]),
            recall_ok,
        )
        for r in rows
        if r["query_id"] < 0 and r["rk"] == 1
    ]
    return local_rows_df(
        spark,
        sorted(out),
        "query_id long, expected_id long, retrieved_id long, "
        "cos_sim double, recall_ok boolean",
    )


def _ann_planted_oracle() -> str:
    """DuckDB twin of the planted half of the report: recomputes each
    planted query's exact top-1 by brute force (the ANN pipeline must
    agree on retrieved_id + cosine for the hash to match); recall_ok
    is the Spark-computed floor gate and is TRUE whenever the method
    meets its measured floor."""
    vals = ", ".join(
        f"(CAST({-(t + 1)} AS BIGINT), CAST({t} AS BIGINT))" for t in PLANT_TARGETS
    )
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
t(query_id, tid) AS (SELECT * FROM (VALUES {vals})),
scored AS (
  SELECT t.query_id, e.vec_id,
         ROUND(list_dot_product(q.v, e.v) /
               (SQRT(list_dot_product(q.v, q.v)) * SQRT(list_dot_product(e.v, e.v))),
               6) AS cos_sim
  FROM t JOIN e q ON q.vec_id = t.tid CROSS JOIN e
),
ranked AS (
  SELECT query_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rn
  FROM scored
)
SELECT query_id,
       vec_id AS expected_id,
       vec_id AS retrieved_id,
       cos_sim,
       TRUE AS recall_ok
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# s01 — brute-force cosine top-k (exact baseline)
# ---------------------------------------------------------------------------
@register(
    "s01_topk_bruteforce",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
c AS (
  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings
),
scored AS (
  SELECT query_id, neighbor_id,
         ROUND(list_dot_product(qv, cv) /
               (SQRT(list_dot_product(qv, qv)) * SQRT(list_dot_product(cv, cv))), 6)
           AS cos_sim
  FROM q, c
  WHERE query_id <> neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
         ) AS INTEGER) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rk FROM ranked WHERE rk <= {TOP_K}
""",
)
def s01_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


# ---------------------------------------------------------------------------
# s02 — LSH random-hyperplane ANN (rows-only check; recall vs s01 is
# asserted in tests/test_similarity.py)
#
# Multi-table sign-LSH: T tables × P planes, querying each table's own
# bucket plus all 1-bit flips (multiprobe). The testdata embeddings are
# near-random (true-neighbor cos ≈ 0.3 → per-plane agreement ≈ 0.6),
# the adversarial case for sign-LSH — real text embeddings cluster much
# tighter and hit far higher recall at the same cost. Candidates stay
# sublinear: T·(P+1)·N/2^P expected bucket-mates per query.
# ---------------------------------------------------------------------------
N_PLANES = 8   # per table → 2^8 = 256 sign buckets
N_TABLES = 12  # r4: 8 → 12 raised measured recall@5 at sf0.1 from 0.68
#               to 0.84 (near-random corpus); candidate volume is
#               T·(P+1)/2^P ≈ 0.42·N per query — still sublinear, and on
#               real clustered embeddings the same T hits far higher
#               recall at far lower candidate volume


def _hyperplanes(dim: int, table: int):
    """Deterministic seeded hyperplanes for one LSH table."""
    import numpy as np

    rng = np.random.RandomState(42 + table)
    return rng.standard_normal((N_PLANES, dim)).tolist()


def s02_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN top-k over the standard + planted query set (the raw
    approximate surface; s02_ann_lsh reports on it hash-exactly)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    emb = _emb(spark, sf_dir)
    dim = _dim(emb, sf_dir)
    # (T*P, dim) matrix of all tables' hyperplanes — one matmul per batch
    # computes every sign bit (vectorized Arrow path; interpreted JVM
    # folds cost ~T*P per-row expression evaluations).
    planes = np.concatenate(
        [np.asarray(_hyperplanes(dim, t), dtype="float64") for t in range(N_TABLES)]
    )
    powers = (1 << np.arange(N_PLANES, dtype=np.int64))

    @pandas_udf("array<int>")
    def table_buckets(col: pd.Series) -> pd.Series:
        x = np.stack(col.map(lambda a: np.asarray(a, dtype="float64")))
        bits = (x @ planes.T) >= 0  # (n, T*P)
        b = bits.reshape(len(x), N_TABLES, N_PLANES) @ powers  # (n, T)
        return pd.Series([row.astype("int32").tolist() for row in b])

    # Corpus: one (table, bucket) row per table — T rows per vector,
    # hashed from the ORIGINAL table in one pass. Queries (standard +
    # planted, a tiny frame) run the same UDF separately.
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.posexplode(table_buckets("embedding")).alias("table_id", "bucket"),
    )
    queries = _ext_queries(spark, sf_dir).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.posexplode(table_buckets("embedding")).alias("table_id", "qbucket"),
    )
    # Multiprobe: each table probes the query's bucket + all 1-bit flips.
    probes = queries.select(
        "query_id",
        "qv",
        "table_id",
        F.explode(
            F.array(
                F.col("qbucket"),
                *[F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(N_PLANES)],
            )
        ).alias("bucket"),
    )
    cands = (
        probes.join(corpus, ["table_id", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        # ONE exchange for dedup + the later per-query window (r12,
        # guide §2.4): hash-partitioning by query_id alone satisfies
        # both the (query_id, neighbor_id) dedup's clustering and the
        # query_id window's, so Catalyst inserts no further Exchange —
        # previously this pipeline shuffled twice (by pair, then by
        # query). Candidate rows still carry the vectors, so shuffling
        # them once instead of twice also halves the shuffled bytes.
        .repartition("query_id")
        .dropDuplicates(["query_id", "neighbor_id"])  # dedupe across tables
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


@register("s02_ann_lsh", oracle=_ann_planted_oracle())
def s02_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ann_report(spark, sf_dir, "s02_ann_lsh", s02_topk(spark, sf_dir))


# ---------------------------------------------------------------------------
# s04 — IVF (inverted-file) ANN: coarse k-means quantizer + nprobe search
# (the other scale path the north star names alongside LSH).
#
# Train: deterministic k-means on a driver-side sample (at 100 TB: a
# 100k-row sample — centroid training is O(sample), never O(corpus)).
# Index: each vector assigned to its nearest centroid (one JVM-side pass;
# at scale this is the partition/bucket key for a write).
# Search: each query probes its NPROBE nearest centroids → candidates are
# corpus rows in those cells only (~NPROBE/K of the corpus per query).
# ---------------------------------------------------------------------------
IVF_K = 16
IVF_NPROBE = 8  # r4: 4 → 8 raised measured recall@5 at sf0.1 from 0.62
#                to 0.86. On this near-random corpus recall tracks the
#                probed fraction (nprobe/K = 1/2); clustered production
#                embeddings reach the same recall at nprobe ≈ K/8 —
#                tune per-corpus, the knob is the whole point of IVF


def _train_centroids(emb: DataFrame, dim: int):
    import numpy as np

    sample = (
        emb.filter(F.col("vec_id") >= 0)  # corpus only, never planted queries
        .select("vec_id", "embedding")
        .orderBy("vec_id")  # deterministic sample
        .limit(512)
        .collect()
    )
    x = np.array([r["embedding"] for r in sample], dtype="float64")
    rng = np.random.RandomState(7)
    cents = x[rng.choice(len(x), IVF_K, replace=False)]
    for _ in range(10):  # plain Lloyd iterations, fixed count
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(IVF_K):
            pts = x[assign == c]
            if len(pts):
                cents[c] = pts.mean(axis=0)
    return cents.tolist()


def s04_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k over the standard + planted query set (the raw
    approximate surface; s04_ann_ivf reports on it hash-exactly)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    emb = _emb(spark, sf_dir)
    dim = _dim(emb, sf_dir)
    cents_np = _cached(
        ("ivf_centroids", sf_dir),
        lambda: np.array(_train_centroids(emb, dim), dtype="float64"),
    )

    # Dense linear algebra (distances to all K centroids) is the one place
    # JVM higher-order folds lose badly to Arrow-batched numpy: one matmul
    # per batch vs K interpreted folds per row (~5× wall time here).
    @pandas_udf("array<int>")
    def nearest_cells(col: pd.Series) -> pd.Series:
        x = np.stack(col.map(lambda a: np.asarray(a, dtype="float64")))
        # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row → drop
        d = -2.0 * (x @ cents_np.T) + (cents_np**2).sum(axis=1)[None, :]
        order = np.argsort(d, axis=1, kind="stable")
        return pd.Series([row.astype("int32").tolist() for row in order])

    # Corpus assigned from the ORIGINAL table in one pass; queries
    # (standard + planted, tiny) run the same UDF separately.
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.element_at(nearest_cells("embedding"), 1).alias("cell"),
    )
    queries = _ext_queries(spark, sf_dir).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.explode(
            F.slice(nearest_cells("embedding"), 1, IVF_NPROBE)
        ).alias("cell"),
    )
    scored = (
        queries.join(corpus, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
        # ONE exchange for dedup + the later per-query window (r12,
        # guide §2.4): hash-partitioning by query_id alone satisfies
        # both the (query_id, neighbor_id) dedup's clustering and the
        # query_id window's, so Catalyst inserts no further Exchange —
        # previously this pipeline shuffled twice (by pair, then by
        # query). Candidate rows still carry the vectors, so shuffling
        # them once instead of twice also halves the shuffled bytes.
        .repartition("query_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


@register("s04_ann_ivf", oracle=_ann_planted_oracle())
def s04_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ann_report(spark, sf_dir, "s04_ann_ivf", s04_topk(spark, sf_dir))


# ---------------------------------------------------------------------------
# s06 — IVF-flat ANN with deterministic reference centroids, fully
# oracle-checked. The coarse quantizer is the first S06_K corpus vectors
# themselves (no training step), so the ENTIRE index+search pipeline —
# cell assignment by L2 argmin, nprobe probing, candidate gathering,
# exact cosine re-rank — is replayed bit-for-bit by DuckDB SQL. s04 is
# the same shape with trained k-means centroids (better cells, rows-only
# check); this query is the proof the cell/probe/rerank plumbing is
# exact. All arithmetic stays in JVM folds (no UDF) so the doubles match
# list_dot_product on the oracle side.
# ---------------------------------------------------------------------------
S06_K = 16
S06_NPROBE = 4


@register(
    "s06_ivf_flat",
    oracle=f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cents AS (
  SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {S06_K}
),
assign AS (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM (
    SELECT e.vec_id, c.cid,
           list_dot_product(e.v, e.v)
             - 2 * list_dot_product(e.v, c.cv)
             + list_dot_product(c.cv, c.cv) AS dist
    FROM e, cents c
  )
),
cells AS (SELECT vec_id, cid AS cell FROM assign WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, cid AS cell
  FROM assign WHERE vec_id < {N_QUERIES} AND rn <= {S06_NPROBE}
),
cand AS (
  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
  FROM probes p JOIN cells c ON c.cell = p.cell
  WHERE c.vec_id <> p.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         ROUND(list_dot_product(q.v, n.v) /
               (SQRT(list_dot_product(q.v, q.v)) * SQRT(list_dot_product(n.v, n.v))),
               6) AS cos_sim
  FROM cand
  JOIN e q ON q.vec_id = cand.query_id
  JOIN e n ON n.vec_id = cand.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
         ) AS INTEGER) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rk FROM ranked WHERE rk <= {TOP_K}
""",
)
def s06_ivf_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    e = emb.select("vec_id", F.col("embedding").alias("v"))
    cents = e.filter(F.col("vec_id") < S06_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    dist = (
        dot(F.col("v"), F.col("v"))
        - F.lit(2.0) * dot(F.col("v"), F.col("cv"))
        + dot(F.col("cv"), F.col("cv"))
    )
    wassign = Window.partitionBy("vec_id").orderBy("dist", "cid")
    assign = (
        e.crossJoin(F.broadcast(cents))
        .select("vec_id", "cid", "v", dist.alias("dist"))
        .withColumn("rn", F.row_number().over(wassign))
    )
    cells = assign.filter(F.col("rn") == 1).select(
        F.col("vec_id").alias("neighbor_id"), F.col("cid").alias("cell"), F.col("v").alias("cv")
    )
    probes = assign.filter((F.col("vec_id") < N_QUERIES) & (F.col("rn") <= S06_NPROBE)).select(
        F.col("vec_id").alias("query_id"), F.col("cid").alias("cell"), F.col("v").alias("qv")
    )
    # the probe set is (queries × nprobe) rows — tiny at any corpus
    # scale — so broadcast it against the cell-assigned corpus
    cand = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        # ONE exchange for dedup + the later per-query window (r12,
        # guide §2.4): hash-partitioning by query_id alone satisfies
        # both the (query_id, neighbor_id) dedup's clustering and the
        # query_id window's, so Catalyst inserts no further Exchange —
        # previously this pipeline shuffled twice (by pair, then by
        # query). Candidate rows still carry the vectors, so shuffling
        # them once instead of twice also halves the shuffled bytes.
        .repartition("query_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


# ---------------------------------------------------------------------------
# s03 — vector norms + per-label centroid distance (SQL-expressible
# aggregate over vectors: the "is my embedding column healthy" audit)
# ---------------------------------------------------------------------------
@register(
    "s03_norm_stats",
    oracle="""
WITH n AS (
  SELECT label,
         SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
)
SELECT label,
       COUNT(*) AS n_vecs,
       ROUND(MIN(nrm), 4) AS min_norm,
       ROUND(MAX(nrm), 4) AS max_norm,
       ROUND(AVG(nrm), 4) AS avg_norm
FROM n
GROUP BY label
""",
)
def s03_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    nrm = F.sqrt(dot(F.col("embedding"), F.col("embedding")))
    return (
        emb.select("label", nrm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.min("nrm"), 4).alias("min_norm"),
            F.round(F.max("nrm"), 4).alias("max_norm"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
        )
    )


# ---------------------------------------------------------------------------
# s05 — product-quantization ANN (PQ + exact re-rank): the memory-bound
# scale path. Vectors are L2-normalized, split into PQ_M subspaces, and
# each subspace is k-means-coded to one of PQ_K ids — the corpus
# becomes PQ_M small ints per vector (8 bytes vs 256 bytes of float32
# here, 32×; the reason billion-vector indexes fit in RAM). Queries
# never touch raw corpus vectors during the scan: per-query lookup
# tables LUT[m][code] = q_sub·codebook[m][code] turn the inner product
# into PQ_M table lookups per candidate (asymmetric distance, ADC) — an
# Arrow-batched numpy gather, memory-bandwidth-bound by design. The
# top PQ_RERANK ADC candidates per query are then re-ranked with exact
# cosine (the standard PQ accuracy restore). At 100 TB: combine with
# the IVF cells of s04 (IVF-PQ) so each probe gathers over one cell's
# codes, and replace the global candidate window with per-partition
# top-C + final merge. Deterministic end-to-end (fixed sample, fixed
# seed, stable argmins).
# ---------------------------------------------------------------------------
PQ_M = 8       # subspaces (64-dim → 8 dims each)
PQ_K = 32      # codes per subspace → 5 bits; 8 codes ≈ 8 bytes/vector
PQ_RERANK = 10 * TOP_K


def _train_pq_codebooks(emb: DataFrame, dim: int):
    """Per-subspace Lloyd k-means on a deterministic normalized sample."""
    import numpy as np

    sample = emb.select("embedding").orderBy("vec_id").limit(512).collect()
    x = np.array([r["embedding"] for r in sample], dtype="float64")
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    rng = np.random.RandomState(11)
    dm = dim // PQ_M
    books = np.empty((PQ_M, PQ_K, dm))
    for m in range(PQ_M):
        xm = x[:, m * dm : (m + 1) * dm]
        cents = xm[rng.choice(len(xm), PQ_K, replace=False)]
        for _ in range(10):
            d = ((xm[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(PQ_K):
                pts = xm[assign == c]
                if len(pts):
                    cents[c] = pts.mean(axis=0)
        books[m] = cents
    return books


def s05_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN top-k over the standard + planted query set (the raw
    approximate surface; s05_ann_pq reports on it hash-exactly)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    emb = _emb(spark, sf_dir)
    qbase = _ext_queries(spark, sf_dir)
    dim = _dim(emb, sf_dir)
    dm = dim // PQ_M
    books = _cached(("pq_codebooks", sf_dir), lambda: _train_pq_codebooks(emb, dim))
    bnorm2 = (books**2).sum(axis=2)  # (M, K)

    def _build_lut():
        # Standard + planted queries; LUT row order = vec_id ascending,
        # so qids maps LUT position back to the real query id.
        qrows = qbase.select("vec_id", "embedding").collect()
        qrows = sorted(qrows, key=lambda r: r["vec_id"])
        qids = [int(r["vec_id"]) for r in qrows]
        qmat = np.array([r["embedding"] for r in qrows], dtype="float64")
        qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
        # LUT[q, m, k] = q's m-th subvector · codebook[m][k]
        return (
            np.einsum("qmd,mkd->qmk", qmat.reshape(len(qmat), PQ_M, dm), books),
            qids,
        )

    lut, qids = _cached(("pq_query_lut_ext", sf_dir), _build_lut)
    qid_of_pos = F.array(*[F.lit(q).cast("long") for q in qids])

    @pandas_udf("array<int>")
    def pq_encode(col: pd.Series) -> pd.Series:
        x = np.stack(col.map(lambda a: np.asarray(a, dtype="float64")))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        codes = np.empty((len(x), PQ_M), dtype="int32")
        for m in range(PQ_M):
            xm = x[:, m * dm : (m + 1) * dm]
            d = -2.0 * (xm @ books[m].T) + bnorm2[m][None, :]
            codes[:, m] = d.argmin(axis=1)
        return pd.Series(list(codes))

    @pandas_udf("array<double>")
    def adc_scores(col: pd.Series) -> pd.Series:
        codes = np.stack(col.map(np.asarray))  # (B, M)
        s = np.zeros((len(codes), lut.shape[0]))
        for m in range(PQ_M):
            s += lut[:, m, :][:, codes[:, m]].T  # (B, Q) gather
        return pd.Series([row.tolist() for row in s])

    enc = emb.select("vec_id", "embedding", pq_encode("embedding").alias("codes"))
    cand = (
        enc.select(
            F.col("vec_id").alias("neighbor_id"),
            F.posexplode(adc_scores("codes")).alias("qpos", "adc_ip"),
        )
        # posexplode yields the LUT row position — map back to the real
        # query id (negative for planted queries) before self-exclusion
        .withColumn("query_id", F.element_at(qid_of_pos, F.col("qpos") + 1))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("adc_ip").desc(), "neighbor_id"
    )
    shortlist = (
        cand.withColumn("crk", F.row_number().over(wc))
        .filter(F.col("crk") <= PQ_RERANK)
        .select("query_id", "neighbor_id")
    )
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    qdf = qbase.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    rer = (
        shortlist.join(corpus, "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        rer.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


@register("s05_ann_pq", oracle=_ann_planted_oracle())
def s05_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ann_report(spark, sf_dir, "s05_ann_pq", s05_topk(spark, sf_dir))


# ---------------------------------------------------------------------------
# s07 — portable sign-LSH ANN, fully oracle-checked: the random
# hyperplanes are md5-derived INTEGER coefficient vectors, embedded as
# literal arrays in the oracle SQL, and every dot product runs as the
# strict left-to-right JVM fold that bit-matches DuckDB's
# list_dot_product — so bucket sign decisions, multiprobe candidates
# and the exact cosine re-rank replay identically in SQL. Completes the
# hash-verified sibling tier for the LSH family (s02 keeps the
# Arrow/numpy fast path with the same architecture).
# ---------------------------------------------------------------------------
S07_DIM = 64      # testdata embedding dimension (asserted at runtime)
S07_TABLES = 4
S07_PLANES = 8    # 2^8 sign buckets per table


def _s07_coeffs() -> list[list[list[int]]]:
    """coeffs[t][p] = 64 integers in [-2^31, 2^31), md5('t:p:i')-derived
    — deterministic, engine-neutral, exactly representable as doubles."""
    import hashlib

    return [
        [
            [
                int(hashlib.md5(f"{t}:{p}:{i}".encode()).hexdigest()[:8], 16)
                - 2**31
                for i in range(S07_DIM)
            ]
            for p in range(S07_PLANES)
        ]
        for t in range(S07_TABLES)
    ]


def _s07_oracle() -> str:
    coeffs = _s07_coeffs()

    def lit(cs):
        return "[" + ", ".join(f"{c}.0" for c in cs) + "]"

    buckets = ",\n         ".join(
        "("
        + " + ".join(
            f"CASE WHEN list_dot_product(v, {lit(coeffs[t][p])}) >= 0 "
            f"THEN {1 << p} ELSE 0 END"
            for p in range(S07_PLANES)
        )
        + f") AS b{t}"
        for t in range(S07_TABLES)
    )
    bucket_rows = " UNION ALL ".join(
        f"SELECT vec_id, v, {t} AS table_id, b{t} AS bucket FROM bucketed"
        for t in range(S07_TABLES)
    )
    probe_flips = ", ".join(
        ["bucket"] + [f"xor(bucket, {1 << i})" for i in range(S07_PLANES)]
    )
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
bucketed AS (
  SELECT vec_id, v,
         {buckets}
  FROM e
),
corpus AS ({bucket_rows}),
probes0 AS (SELECT * FROM corpus WHERE vec_id < {N_QUERIES}),
probes AS (
  SELECT vec_id AS query_id, v AS qv, table_id,
         unnest([{probe_flips}]) AS bucket
  FROM probes0
),
cand AS (
  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
  FROM probes p
  JOIN corpus c ON c.table_id = p.table_id AND c.bucket = p.bucket
  WHERE c.vec_id <> p.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         ROUND(list_dot_product(q.v, n.v) /
               (SQRT(list_dot_product(q.v, q.v)) * SQRT(list_dot_product(n.v, n.v))),
               6) AS cos_sim
  FROM cand
  JOIN e q ON q.vec_id = cand.query_id
  JOIN e n ON n.vec_id = cand.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
         ) AS INTEGER) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rk FROM ranked WHERE rk <= {TOP_K}
"""


@register("s07_lsh_portable", oracle=_s07_oracle())
def s07_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    coeffs = _s07_coeffs()
    emb = _emb(spark, sf_dir)
    if _dim(emb, sf_dir) != S07_DIM:  # oracle literals are dim-bound
        raise ValueError(f"s07 expects {S07_DIM}-dim embeddings")
    e = emb.select("vec_id", F.col("embedding").alias("v"))

    def plane_dot(cs):
        # strict left-to-right fold against a literal coefficient array:
        # bit-identical to DuckDB's list_dot_product over the same lists
        carr = F.array(*[F.lit(float(c)) for c in cs])
        return F.aggregate(
            F.zip_with(F.col("v"), carr, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bucket_cols = [
        sum(
            [
                F.when(plane_dot(coeffs[t][p]) >= 0, F.lit(1 << p)).otherwise(0)
                for p in range(S07_PLANES)
            ],
            F.lit(0),
        ).alias(f"b{t}")
        for t in range(S07_TABLES)
    ]
    bucketed = e.select("vec_id", "v", *bucket_cols)
    corpus = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.posexplode(F.array(*[F.col(f"b{t}") for t in range(S07_TABLES)])).alias(
            "table_id", "bucket"
        ),
    )
    probes = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.posexplode(F.array(*[F.col(f"b{t}") for t in range(S07_TABLES)])).alias(
            "table_id", "qb"
        ),
    ).select(
        "query_id",
        "qv",
        "table_id",
        F.explode(
            F.array(
                F.col("qb"),
                *[F.col("qb").bitwiseXOR(F.lit(1 << i)) for i in range(S07_PLANES)],
            )
        ).alias("bucket"),
    )
    cand = (
        corpus.join(F.broadcast(probes), ["table_id", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        # ONE exchange for dedup + the later per-query window (r12,
        # guide §2.4): hash-partitioning by query_id alone satisfies
        # both the (query_id, neighbor_id) dedup's clustering and the
        # query_id window's, so Catalyst inserts no further Exchange —
        # previously this pipeline shuffled twice (by pair, then by
        # query). Candidate rows still carry the vectors, so shuffling
        # them once instead of twice also halves the shuffled bytes.
        .repartition("query_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )
