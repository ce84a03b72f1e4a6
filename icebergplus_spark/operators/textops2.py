"""Training-data pipeline text ops, round 2: normalization-aware
dedup, context-window sequence packing, and corpus n-gram contamination.

These are the document-preparation steps that sit between raw-crawl
ingest and tokenizer sharding in an LLM data pipeline. All three are
pure JVM-side DataFrame plans (no Python UDFs) with DuckDB oracle
twins, and each states its 100 TB scaling story in the docstring.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from icebergplus_spark.registry import register
from icebergplus_spark.session import prepare_session
from icebergplus_spark.sources import load_table

# Context-window budget for sequence packing (tokens per chunk). Docs
# average ~60 whitespace tokens, so ~8 docs/chunk at test scale.
PACK_BUDGET = 512


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, "documents")


def _norm(col):
    """Aggressive normalization for dedup: lowercase, strip
    non-alphanumerics to spaces, collapse runs, trim. Mirrors the
    oracle's regexp_replace(…, 'g') chain exactly."""
    x = F.lower(col)
    x = F.regexp_replace(x, "[^a-z0-9 ]", " ")
    x = F.regexp_replace(x, " +", " ")
    return F.trim(x)


# ---------------------------------------------------------------------------
# t11 — normalization-aware dedup stats: how many docs per source
# collapse once text is canonicalized (the "soft duplicate" rate that
# exact-hash dedup misses). One scan + one partial-agg shuffle on
# source; COUNT(DISTINCT) expands to a two-phase distinct aggregate
# that stays map-side-partial at 100 TB.
# ---------------------------------------------------------------------------
@register(
    "t11_normalized_dedup",
    oracle="""
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT norm) AS n_distinct_norm,
       COUNT(*) - COUNT(DISTINCT norm) AS n_soft_dups
FROM (
  SELECT source,
         TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g')) AS norm
  FROM documents
)
GROUP BY source
""",
)
def t11_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("source", _norm(F.col("text")).alias("norm"))
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("norm").alias("n_distinct_norm"),
        (F.count(F.lit(1)) - F.countDistinct("norm")).alias("n_soft_dups"),
    )


# ---------------------------------------------------------------------------
# t12 — sequence packing: concatenate each source's docs in doc_id
# order and cut into PACK_BUDGET-token context windows (chunk_id =
# running-token-offset // budget — the streaming concat-then-chunk
# packing used for pretraining shards). The window partitions by
# source (20 strata here); at 100 TB the stratum is (source,
# shard = hash(doc_id) % N) so no single sort partition exceeds an
# executor, at the cost of one partial chunk per shard.
# ---------------------------------------------------------------------------
@register(
    "t12_sequence_packing",
    oracle="""
WITH t AS (
  SELECT source, doc_id,
         len(regexp_split_to_array(TRIM(text), '\\s+')) AS n_tok
  FROM documents
),
c AS (
  SELECT source, n_tok,
         SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM t
)
SELECT source,
       CAST(FLOOR((cum - n_tok) / 512.0) AS INTEGER) AS chunk_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS chunk_tokens
FROM c
GROUP BY source, chunk_id
""",
)
def t12_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select(
        "source",
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = docs.withColumn("cum", F.sum("n_tok").over(w))
    return (
        c.select(
            "source",
            F.floor((F.col("cum") - F.col("n_tok")) / float(PACK_BUDGET))
            .cast("int")
            .alias("chunk_id"),
            "n_tok",
        )
        .groupBy("source", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("chunk_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# t13 — n-gram contamination: per document, the fraction of its
# distinct word 5-grams that occur in at least one OTHER scope of the
# corpus (nd > 1) — the standard duplicated-span contamination metric.
# Plan: shingle (JVM higher-order fns, dedup.shingles) → explode →
# window COUNT over the shingle key → re-group by doc. Two shuffles
# (by shingle, by doc); both partial-aggregate. At 100 TB the shingle
# count becomes a pre-aggregated frequency table joined in, so hot
# shingles ("the of and …") don't skew a window partition.
# ---------------------------------------------------------------------------
@register(
    "t13_ngram_contamination",
    oracle="""
WITH words AS (
  SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS w
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(w) >= 5 THEN array_to_string(w[i:i+4], ' ')
              ELSE array_to_string(w, ' ') END AS g
  FROM (
    SELECT doc_id, w,
           unnest(generate_series(1, GREATEST(len(w) - 4, 1))) AS i
    FROM words
  )
),
cnt AS (SELECT g, COUNT(*) AS nd FROM sh GROUP BY g)
SELECT s.doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN c.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_shingles,
       ROUND(CAST(SUM(CASE WHEN c.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
         AS dup_rate
FROM sh s JOIN cnt c ON s.g = c.g
GROUP BY s.doc_id
""",
)
def t13_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergplus_spark.operators.dedup import shingles

    docs = _docs(spark, sf_dir)
    # shingles() is already distinct-per-doc and falls back to the whole
    # text for docs shorter than n — the oracle mirrors both behaviors.
    sh = docs.select("doc_id", F.explode(shingles("text", 5)).alias("g"))
    nd = F.count(F.lit(1)).over(Window.partitionBy("g"))
    dup = F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
    return (
        sh.withColumn("nd", nd)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            dup.alias("dup_shingles"),
            F.round(dup.cast("double") / F.count(F.lit(1)), 6).alias("dup_rate"),
        )
    )


# ---------------------------------------------------------------------------
# t16 — balanced shard assignment: distribute docs over N_SHARDS data-
# parallel training shards so per-shard token totals stay even, with a
# deterministic serpentine (boustrophedon) rank→shard layout: rank by
# token count desc, then snake across shards (0..7, 7..0, …) so each
# shard gets one doc per "round" from alternating ends of the size
# distribution. The global rank is the scalable two-pass form
# (functions/global_rank.py: range-repartition + per-partition offsets)
# — exact ranks, no single-partition window even at 100 TB. Balance is
# asserted in the test; evenness here comes out < 1% spread. Ties
# broken by doc_id so both engines agree.
# ---------------------------------------------------------------------------
N_SHARDS = 8


@register(
    "t16_balanced_shards",
    oracle="""
WITH ranked AS (
  SELECT doc_id,
         LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1 AS n_tok,
         ROW_NUMBER() OVER (
           ORDER BY LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1
                    DESC, doc_id) - 1 AS rk
  FROM documents
),
assigned AS (
  SELECT n_tok,
         CASE WHEN (rk // 8) % 2 = 0 THEN rk % 8 ELSE 7 - (rk % 8) END AS shard
  FROM ranked
)
SELECT CAST(shard AS INT) AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS shard_tokens
FROM assigned
GROUP BY shard
""",
)
def t16_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        # whitespace token count via space positions — identical formula
        # both engines (split-based size() counts differently on DuckDB)
        (
            F.length(F.trim("text"))
            - F.length(F.regexp_replace(F.trim("text"), " ", ""))
            + 1
        ).alias("n_tok"),
    )
    # Exact global rank without the single-partition window: range-
    # repartition + per-partition offsets (functions/global_rank.py).
    from icebergplus_spark.functions.global_rank import with_global_rank

    ranked = with_global_rank(
        docs, F.desc("n_tok"), F.asc("doc_id"), rank_col="rk", zero_based=True
    ).select("n_tok", "rk")
    fwd = F.col("rk") % N_SHARDS
    shard = F.when(
        (F.col("rk") / N_SHARDS).cast("long") % 2 == 0, fwd
    ).otherwise(N_SHARDS - 1 - fwd)
    return (
        ranked.select("n_tok", shard.cast("int").alias("shard"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("shard_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# t17 — temperature-based source mixture weights: the data-recipe step
# that up-weights small/rare sources (w ∝ p^α, α=0.5) when composing a
# pretraining mixture. Token totals are exact BIGINT sums; the derived
# weights are expressed as sqrt of an exact ratio and normalized by the
# MAX weight (max is order-independent, unlike a float SUM across
# sources — that's what keeps both engines bit-identical). One scan +
# one 20-group agg + one tiny window.
# ---------------------------------------------------------------------------
@register(
    "t17_mixture_weights",
    oracle="""
WITH s AS (
  SELECT source,
         COUNT(*) AS n_docs,
         CAST(SUM(LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1)
              AS BIGINT) AS tok_total
  FROM documents
  GROUP BY source
),
w AS (
  SELECT *,
         SQRT(CAST(tok_total AS DOUBLE) / (SELECT SUM(tok_total) FROM s)) AS w_raw
  FROM s
)
SELECT source,
       n_docs,
       tok_total,
       ROUND(w_raw, 6) AS w_raw,
       ROUND(w_raw / MAX(w_raw) OVER (), 6) AS w_rel
FROM w
""",
)
def t17_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    n_tok = (
        F.length(F.trim("text"))
        - F.length(F.regexp_replace(F.trim("text"), " ", ""))
        + 1
    )
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok).cast("long").alias("tok_total"),
    )
    # corpus total via a window over the ~20 source rows (exact: BIGINT
    # sum), then the α=0.5 temperature weight. Constant-but-unfoldable
    # partition key (pmod(n,1)=0): the input is already the tiny
    # post-agg frame, and it keeps WindowExec off its unpartitioned
    # code path.
    w_all = Window.partitionBy(F.pmod(F.col("n_docs"), F.lit(1))).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    total = F.sum("tok_total").over(w_all)
    w = s.withColumn(
        "w_raw", F.sqrt(F.col("tok_total").cast("double") / total)
    )
    wmax = F.max("w_raw").over(w_all)
    return w.select(
        "source",
        "n_docs",
        "tok_total",
        F.round("w_raw", 6).alias("w_raw"),
        F.round(F.col("w_raw") / wmax, 6).alias("w_rel"),
    )


# ---------------------------------------------------------------------------
# t18 — PII scrubbing (LLM-data-pipeline redaction stage): deterministic
# fake contact strings (email on doc_id%3==0, phone on doc_id%2==0) are
# injected into each document IDENTICALLY on both engines, then redacted
# with anchored regexes; the aggregate proves the scrub found and
# replaced exactly the planted PII (counts per source + net length
# delta). The synthetic corpus has no real PII, so planting is what
# makes the redaction path oracle-checkable end to end. Single scan, one
# small agg — regex work stays in whole-stage codegen (no UDF).
# ---------------------------------------------------------------------------
_T18_EMAIL = r"user[0-9]+@mail\.example\.org"
_T18_PHONE = r"555-[0-9]{4}"


@register(
    "t18_pii_scrub",
    oracle=r"""
WITH planted AS (
  SELECT source,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.org'
                 ELSE '' END
         || CASE WHEN doc_id % 2 = 0
                 THEN ' call 555-' || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END AS full_text
  FROM documents
),
scrubbed AS (
  SELECT source,
         full_text,
         REGEXP_REPLACE(
           REGEXP_REPLACE(full_text, 'user[0-9]+@mail\.example\.org', '<EMAIL>', 'g'),
           '555-[0-9]{4}', '<PHONE>', 'g') AS clean,
         LEN(REGEXP_EXTRACT_ALL(full_text, 'user[0-9]+@mail\.example\.org')) AS n_emails,
         LEN(REGEXP_EXTRACT_ALL(full_text, '555-[0-9]{4}')) AS n_phones
  FROM planted
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_emails) AS BIGINT) AS emails_redacted,
       CAST(SUM(n_phones) AS BIGINT) AS phones_redacted,
       CAST(SUM(LENGTH(full_text) - LENGTH(clean)) AS BIGINT) AS chars_removed
FROM scrubbed
GROUP BY source
""",
)
def t18_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    full = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example.org"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    clean = F.regexp_replace(
        F.regexp_replace(full, _T18_EMAIL, "<EMAIL>"), _T18_PHONE, "<PHONE>"
    )
    return (
        docs.select(
            "source",
            full.alias("full_text"),
            clean.alias("clean"),
            F.size(F.regexp_extract_all(full, F.lit(_T18_EMAIL), F.lit(0))).alias(
                "n_emails"
            ),
            F.size(F.regexp_extract_all(full, F.lit(_T18_PHONE), F.lit(0))).alias(
                "n_phones"
            ),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_emails").alias("emails_redacted"),
            F.sum("n_phones").alias("phones_redacted"),
            F.sum(F.length("full_text") - F.length("clean")).alias("chars_removed"),
        )
    )
