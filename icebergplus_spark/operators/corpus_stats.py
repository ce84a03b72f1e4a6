"""Corpus-level statistics for training-data curation, round 3b:
collocation mining, cross-entropy rarity scoring, and cross-document
chunk-level duplication.

These are the corpus-wide statistics an LLM data pipeline computes next
to dedup/quality filtering (reference scope: the data-curation surface
SURVEY.md §2 extends beyond icebergplus's lake core):

- t28: PMI collocations — pointwise mutual information over adjacent
  token pairs, the classic phrase/term-of-art miner. Unigram and bigram
  counts are two-phase aggregations (map-side combine) on token keys;
  the final PMI join touches only vocabulary-scale tables, which are
  broadcast. The corpus is streamed exactly twice (once per n-gram
  order) and never shuffled at document granularity.
- t29: token-rarity score — per-document cross-entropy against the
  corpus unigram distribution (mean -log2 p(token)), the cheap
  perplexity proxy used for quality bucketing. The unigram model is
  vocabulary-scale and broadcast; the per-doc mean shuffles on doc_id
  only.
- d15: chunk-level cross-document duplication — fixed-width token
  chunks (boilerplate detector). Whole-doc dedup (d01/d02) misses
  partially-copied documents; this shreds each doc into 20-token
  chunks, counts global chunk multiplicity, and reports the fraction
  of each doc that is shared verbatim with other docs. Chunk keys are
  md5 digests so the wide groupBy shuffles fixed-width keys, not raw
  text (same trick as d02's fingerprint dedup).

All three are pure JVM plans (split/slice/explode/groupBy — no Python
UDFs) with DuckDB oracle twins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from icebergplus_spark.localrel import local_rows_df
from icebergplus_spark.registry import register
from icebergplus_spark.session import prepare_session
from icebergplus_spark.sources import load_table

MIN_PAIR_COUNT = 5  # collocation support threshold
CHUNK_TOKENS = 20  # d15 chunk width


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, "documents")


# the SAME tokenizer as the dedup family — the oracles of both families
# assume one tokenization; importing it keeps them from drifting
from icebergplus_spark.operators.dedup import _tokens  # noqa: E402


# ---------------------------------------------------------------------------
# t28 — PMI collocations over adjacent token pairs.
# ---------------------------------------------------------------------------
@register(
    "t28_collocations",
    oracle=f"""
WITH words AS (
  SELECT regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS w FROM documents
),
tok AS (
  SELECT w[i] AS t, w[i+1] AS nxt
  FROM (SELECT w, unnest(generate_series(1, len(w))) AS i FROM words)
),
uni AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
bi AS (
  SELECT t AS t1, nxt AS t2, COUNT(*) AS c
  FROM tok WHERE nxt IS NOT NULL GROUP BY t, nxt
),
tot AS (SELECT SUM(c) AS n_uni FROM uni),
btot AS (SELECT SUM(c) AS n_bi FROM bi)
SELECT t1, t2, CAST(bi.c AS BIGINT) AS pair_count,
       ROUND(LOG2((CAST(bi.c AS DOUBLE) / n_bi)
                  / ((u1.c / CAST(n_uni AS DOUBLE))
                     * (u2.c / CAST(n_uni AS DOUBLE)))), 3) AS pmi
FROM bi, tot, btot
JOIN uni u1 ON bi.t1 = u1.t
JOIN uni u2 ON bi.t2 = u2.t
WHERE bi.c >= {MIN_PAIR_COUNT}
""",
)
def t28_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    w = _tokens()
    base = docs.select(w.alias("w"))

    # Unigram counts: two-phase hash agg on the token key.
    uni = (
        base.select(F.explode("w").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Adjacent pairs via two array slices zipped — no positional self-join,
    # so the corpus never shuffles at (doc, position) granularity.
    m = F.greatest(F.size("w") - F.lit(1), F.lit(0))
    pairs = (
        base.select(
            F.slice("w", F.lit(1), m).alias("a1"),
            F.slice("w", F.lit(2), m).alias("a2"),
        )
        .select(F.explode(F.arrays_zip("a1", "a2")).alias("p"))
        .select(F.col("p.a1").alias("t1"), F.col("p.a2").alias("t2"))
    )
    bi = pairs.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("c"))

    # Totals are 1-row aggregates; vocabulary tables are broadcast — the
    # PMI join never shuffles anything corpus-sized. At 100 TB the
    # unigram table is vocab-scale (bounded by distinct tokens), which
    # is exactly the broadcastable case; if a tokenizer made it huge,
    # dropping the hints degrades to a vocab-key shuffle, still never
    # corpus-scale.
    n_uni = uni.agg(F.sum("c").alias("n_uni"))
    n_bi = bi.agg(F.sum("c").alias("n_bi"))
    u1 = uni.select(F.col("t").alias("t1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("t").alias("t2"), F.col("c").alias("c2"))
    p_pair = F.col("c").cast("double") / F.col("n_bi")
    p1 = F.col("c1") / F.col("n_uni").cast("double")
    p2 = F.col("c2") / F.col("n_uni").cast("double")
    return (
        bi.filter(F.col("c") >= MIN_PAIR_COUNT)
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .join(F.broadcast(u1), "t1")
        .join(F.broadcast(u2), "t2")
        .select(
            "t1",
            "t2",
            F.col("c").alias("pair_count"),
            F.round(F.log2(p_pair / (p1 * p2)), 3).alias("pmi"),
        )
    )


# ---------------------------------------------------------------------------
# t29 — per-document rarity (cross-entropy vs the corpus unigram model).
# ---------------------------------------------------------------------------
@register(
    "t29_rarity_score",
    oracle="""
WITH tok AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '\\s+')) AS t
  FROM documents
),
uni AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
tot AS (SELECT SUM(c) AS n FROM uni)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       ROUND(AVG(-LOG2(c / CAST(n AS DOUBLE))), 4) AS rarity_bits
FROM tok JOIN uni USING (t), tot
GROUP BY doc_id
""",
)
def t29_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(_tokens()).alias("t"))
    uni = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    n = uni.agg(F.sum("c").alias("n"))
    # The unigram model is vocab-scale → broadcast to every corpus task;
    # the only wide shuffle is the per-doc mean on doc_id.
    bits = -F.log2(F.col("c") / F.col("n").cast("double"))
    return (
        tok.join(F.broadcast(uni), "t")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(bits), 4).alias("rarity_bits"),
        )
    )


# ---------------------------------------------------------------------------
# d15 — cross-document chunk duplication (boilerplate detector).
# ---------------------------------------------------------------------------
@register(
    "d15_chunk_dedup",
    oracle=f"""
WITH words AS (
  SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS w
  FROM documents
),
chunks AS (
  SELECT doc_id, MD5(array_to_string(w[i:i+{CHUNK_TOKENS - 1}], ' ')) AS k
  FROM (
    SELECT doc_id, w,
           unnest(generate_series(1, len(w), {CHUNK_TOKENS})) AS i
    FROM words
  )
),
freq AS (SELECT k, COUNT(DISTINCT doc_id) AS docs FROM chunks GROUP BY k)
SELECT c.doc_id,
       COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN f.docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS shared_chunks,
       ROUND(CAST(SUM(CASE WHEN f.docs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS shared_ratio
FROM chunks c JOIN freq f ON c.k = f.k
GROUP BY c.doc_id
""",
)
def d15_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    w = _tokens()
    # Fixed-stride chunking: sequence(1, len, 20) start offsets, one
    # md5 digest per chunk. Digesting BEFORE the shuffle means the wide
    # groupBy moves 32-byte keys, not 20-token strings.
    starts = F.sequence(F.lit(1), F.greatest(F.size("w"), F.lit(1)), F.lit(CHUNK_TOKENS))
    chunk = F.md5(F.concat_ws(" ", F.slice("w", F.col("i"), CHUNK_TOKENS)))
    chunks = (
        docs.select("doc_id", w.alias("w"))
        .select("doc_id", F.explode(starts).alias("i"), "w")
        .select("doc_id", chunk.alias("k"))
    )
    # Global chunk multiplicity by distinct source doc: two-phase agg on
    # the digest key — scales to any corpus size, skew bounded by how
    # often one exact chunk repeats (boilerplate — AQE splits it).
    freq = chunks.groupBy("k").agg(
        F.countDistinct("doc_id").alias("docs")
    )
    shared = F.sum(F.when(F.col("docs") > 1, 1).otherwise(0))
    return (
        chunks.join(freq, "k")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            shared.cast("bigint").alias("shared_chunks"),
            F.round(shared.cast("double") / F.count(F.lit(1)), 6).alias(
                "shared_ratio"
            ),
        )
    )


# ---------------------------------------------------------------------------
# d16 — MinHash estimator accuracy under the oracle gate: for each
# consecutive-doc pair, the fraction of agreeing MinHash components is
# an unbiased estimator of the exact shingle-set Jaccard. The gated
# columns are the EXACT per-pair Jaccard stats plus a boolean asserting
# the estimator's mean absolute error stays under 0.12 (128 hashes →
# se ≈ sqrt(J(1-J)/128) ≤ 0.045; 0.12 is ~2.5σ headroom over the mean)
# — a broken signature (wrong hash, wrong min, wrong fold) blows the
# bound and flips the gated boolean. This is the quantitative guarantee
# behind every LSH threshold choice in the dedup family.
# ---------------------------------------------------------------------------
@register(
    "d16_minhash_accuracy",
    oracle="""
WITH words AS (
  SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS w
  FROM documents
),
sh AS (
  SELECT doc_id,
         list(DISTINCT CASE WHEN len(w) >= 3
                            THEN array_to_string(w[i:i+2], ' ')
                            ELSE array_to_string(w, ' ') END) AS grams
  FROM (
    SELECT doc_id, w,
           unnest(generate_series(1, GREATEST(len(w) - 2, 1))) AS i
    FROM words
  )
  GROUP BY doc_id
),
pairs AS (
  SELECT a.doc_id AS doc_a,
         CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
           / len(list_distinct(list_concat(a.grams, b.grams))) AS jac
  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
)
SELECT COUNT(*) AS n_pairs,
       ROUND(AVG(jac), 4) AS mean_exact_jaccard,
       TRUE AS estimator_within_bound
FROM pairs
""",
)
def d16_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergplus_spark.operators.dedup import minhash_signature, shingles

    docs = _docs(spark, sf_dir)
    base = docs.select(
        "doc_id",
        shingles("text", 3).alias("grams"),
    ).select(
        "doc_id",
        "grams",
        minhash_signature(F.col("grams")).alias("sig"),
    )
    a = base.select(
        F.col("doc_id").alias("doc_a"),
        F.col("grams").alias("ga"),
        F.col("sig").alias("sa"),
    )
    b = base.select(
        (F.col("doc_id") - 1).alias("doc_a"),
        F.col("grams").alias("gb"),
        F.col("sig").alias("sb"),
    )
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    match = F.size(
        F.filter(F.zip_with("sa", "sb", lambda x, y: x == y), lambda v: v)
    )
    pairs = a.join(b, "doc_a").select(
        "doc_a",
        (inter.cast("double") / union).alias("jac"),
        (match.cast("double") / F.size("sa")).alias("est"),
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("jac"), 4).alias("mean_exact_jaccard"),
        (F.avg(F.abs(F.col("est") - F.col("jac"))) < 0.12).alias(
            "estimator_within_bound"
        ),
    )


# ---------------------------------------------------------------------------
# s09 — ANN quality report under the oracle gate: the three approximate
# ANN methods (multi-table LSH, IVF, PQ) are rows-only by construction
# (bucketing differs per engine), but their QUALITY is exactly
# checkable: recall@5 against the exact brute-force baseline, computed
# entirely in Spark and gated as a boolean per method. The oracle emits
# the expected constant rows — a parameter regression (fewer probes /
# tables / cells than intended) drops recall below its floor and flips
# a hash-gated boolean the driver sees. Floors sit one noise-margin
# under the measured range across sf0.001/0.01/0.1 (s02 0.54-0.68,
# s04 0.60-0.72, s05 0.62-0.88 — near-random embeddings, the
# adversarial corpus for every ANN family).
# Floors live beside the methods (similarity.ANN_RECALL_FLOORS) since r11:
# the registered s02/s04/s05 reports gate on them per-method too.


@register(
    "s09_ann_quality_report",
    oracle="""
SELECT 's02_ann_lsh' AS method, TRUE AS recall_ok
UNION ALL SELECT 's04_ann_ivf', TRUE
UNION ALL SELECT 's05_ann_pq', TRUE
""",
)
def s09_ann_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergplus_spark.operators import similarity as sim

    prepare_session(spark)
    exact = sim._exact_pairs(spark, sf_dir)  # session-cached, 50 tuples
    topk_fns = {
        "s02_ann_lsh": sim.s02_topk,
        "s04_ann_ivf": sim.s04_topk,
        "s05_ann_pq": sim.s05_topk,
    }
    reports = []
    for method, floor in sorted(sim.ANN_RECALL_FLOORS.items()):
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in topk_fns[method](spark, sf_dir).collect()
            if r["query_id"] >= 0  # standard queries only
        }
        reports.append((method, len(approx & exact) / len(exact) >= floor))
    return local_rows_df(spark, reports, "method string, recall_ok boolean")


# ---------------------------------------------------------------------------
# t30 — novelty score: the fraction of a document's distinct 3-grams
# whose FIRST corpus occurrence (lowest doc_id) is this document — the
# first-seen/novelty metric curation pipelines use to favor fresh
# content over recombinations when ordering or pruning a crawl. Global
# first-occurrence is one groupBy(min) on the gram key; attribution is
# a vocab... gram-scale join back — never an all-pairs comparison, so
# it scales like the dedup family's shingle machinery it reuses.
# ---------------------------------------------------------------------------
@register(
    "t30_novelty_score",
    oracle="""
WITH words AS (
  SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS w
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(w) >= 3 THEN array_to_string(w[i:i+2], ' ')
              ELSE array_to_string(w, ' ') END AS g
  FROM (
    SELECT doc_id, w,
           unnest(generate_series(1, GREATEST(len(w) - 2, 1))) AS i
    FROM words
  )
),
first_seen AS (SELECT g, MIN(doc_id) AS first_doc FROM sh GROUP BY g)
SELECT sh.doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS novel_grams,
       ROUND(CAST(SUM(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS novelty
FROM sh JOIN first_seen ON sh.g = first_seen.g
GROUP BY sh.doc_id
""",
)
def t30_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergplus_spark.operators.dedup import shingles

    docs = _docs(spark, sf_dir)
    sh = docs.select("doc_id", F.explode(shingles("text", 3)).alias("g"))
    first_seen = sh.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        sh.join(first_seen, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            novel.cast("bigint").alias("novel_grams"),
            F.round(novel.cast("double") / F.count(F.lit(1)), 6).alias(
                "novelty"
            ),
        )
    )
