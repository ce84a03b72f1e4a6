"""Text-analysis operators for training-data pipelines (north star;
absent in the reference — SURVEY.md §2.B "Extension" rows).

Everything here is JVM built-ins (split/filter/transform/regexp) — the
hot path of a 100 TB text pipeline must not cross into Python per row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from icebergplus_spark.registry import register
from icebergplus_spark.session import prepare_session
from icebergplus_spark.sources import load_table

# A small function-word inventory per language for the lang-id heuristic.
# (Real pipelines use fastText/CLD3 — not available in this container; the
# n-gram/stopword heuristic is the deterministic, SQL-expressible stand-in.)
STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "it"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# t01 — token & char statistics
# ---------------------------------------------------------------------------
@register(
    "t01_text_stats",
    oracle="""
WITH toks AS (
  SELECT doc_id, n_chars, string_split(LOWER(TRIM(text)), ' ') AS tok
  FROM documents
)
SELECT doc_id,
       n_chars,
       CAST(len(tok) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct(tok)) AS INTEGER) AS n_unique_tokens,
       ROUND(CAST(len(list_distinct(tok)) AS DOUBLE) / CAST(len(tok) AS DOUBLE), 6)
         AS ttr
FROM toks
""",
)
def t01_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    tok = F.split(F.lower(F.trim(F.col("text"))), " ")
    return docs.select(
        "doc_id",
        "n_chars",
        F.size(tok).alias("n_tokens"),
        F.size(F.array_distinct(tok)).alias("n_unique_tokens"),
        F.round(
            F.size(F.array_distinct(tok)).cast("double") / F.size(tok).cast("double"), 6
        ).alias("ttr"),
    )


# ---------------------------------------------------------------------------
# t02 — quality scoring: length bounds, stopword ratio, mean token length
# (the classic Gopher/C4-style filters, deterministic subset)
# ---------------------------------------------------------------------------
@register(
    "t02_quality_score",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(LOWER(TRIM(text)), ' ') AS tok, LENGTH(text) AS c
  FROM documents
),
feat AS (
  SELECT doc_id,
         CAST(len(tok) AS INTEGER) AS n_tokens,
         ROUND(CAST(len(list_filter(tok, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS DOUBLE)
               / CAST(len(tok) AS DOUBLE), 6) AS stopword_ratio,
         ROUND(CAST(c - len(tok) + 1 AS DOUBLE) / CAST(len(tok) AS DOUBLE), 6) AS mean_token_len
  FROM toks
)
SELECT doc_id, n_tokens, stopword_ratio, mean_token_len,
       CASE WHEN n_tokens BETWEEN 5 AND 1000
             AND stopword_ratio >= 0.01
             AND mean_token_len BETWEEN 2.0 AND 12.0
            THEN TRUE ELSE FALSE END AS passes_quality
FROM feat
""",
)
def t02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    tok = F.split(F.lower(F.trim(F.col("text"))), " ")
    sw = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    feat = docs.select(
        "doc_id",
        F.size(tok).alias("n_tokens"),
        F.round(
            F.size(F.filter(tok, lambda x: F.array_contains(sw, x))).cast("double")
            / F.size(tok).cast("double"),
            6,
        ).alias("stopword_ratio"),
        # chars minus (n_tokens-1) separators, over n_tokens
        F.round(
            (F.length("text") - F.size(tok) + 1).cast("double") / F.size(tok).cast("double"),
            6,
        ).alias("mean_token_len"),
    )
    return feat.withColumn(
        "passes_quality",
        F.col("n_tokens").between(5, 1000)
        & (F.col("stopword_ratio") >= 0.01)
        & F.col("mean_token_len").between(2.0, 12.0),
    )


# ---------------------------------------------------------------------------
# t03 — language-ID heuristic (stopword-hit ratio → en / unknown)
# ---------------------------------------------------------------------------
@register(
    "t03_lang_id",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang, string_split(LOWER(TRIM(text)), ' ') AS tok
  FROM documents
),
score AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(tok, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS DOUBLE)
           / CAST(len(tok) AS DOUBLE) AS en_score
  FROM toks
)
SELECT doc_id, lang,
       CASE WHEN en_score >= 0.05 THEN 'en' ELSE 'unknown' END AS pred_lang,
       ROUND(en_score, 6) AS en_score
FROM score
""",
)
def t03_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    tok = F.split(F.lower(F.trim(F.col("text"))), " ")
    sw = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    score = F.size(F.filter(tok, lambda x: F.array_contains(sw, x))).cast("double") / F.size(
        tok
    ).cast("double")
    return docs.select(
        "doc_id",
        "lang",
        F.when(score >= 0.05, "en").otherwise("unknown").alias("pred_lang"),
        F.round(score, 6).alias("en_score"),
    )


# ---------------------------------------------------------------------------
# t04 — document fingerprinting: md5 digest + BPE-ish token estimate
# ---------------------------------------------------------------------------
@register(
    "t04_fingerprint_tokens",
    oracle="""
SELECT doc_id,
       md5(text) AS digest,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER)
         AS n_bpeish_tokens,
       CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS n_tokens_est
FROM documents
""",
)
def t04_fingerprint_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    # BPE-ish pre-tokenizer regex: letter runs, digit runs, lone symbols —
    # same pattern dialect in both engines (RE2/Java compatible subset).
    pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    return docs.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("digest"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0))).alias(
            "n_bpeish_tokens"
        ),
        F.ceil(F.length("text") / 4.0).alias("n_tokens_est"),
    )


# ---------------------------------------------------------------------------
# t05 — corpus-level source statistics (the aggregation layer of a
# data-mixing pipeline)
# ---------------------------------------------------------------------------
@register(
    "t05_source_mix",
    oracle="""
SELECT source, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(AVG(CAST(n_chars AS DOUBLE)), 4) AS avg_chars,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM documents
GROUP BY source, lang
""",
)
def t05_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg(F.col("n_chars").cast("double")), 4).alias("avg_chars"),
        F.min("doc_id").alias("first_doc"),
    )


# ---------------------------------------------------------------------------
# t09 — word count (explode-group-count over the corpus; the canonical
# distributed-text benchmark, oracle-checked top-k with total order)
# ---------------------------------------------------------------------------
@register(
    "t09_wordcount",
    oracle="""
SELECT word, n
FROM (
  SELECT word, COUNT(*) AS n,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word) AS rk
  FROM (
    SELECT unnest(string_split(LOWER(TRIM(text)), ' ')) AS word
    FROM documents
  ) w
  GROUP BY word
) t
WHERE rk <= 20
""",
)
def t09_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# t10 — rolling-hash document fingerprint (Rabin-Karp style polynomial
# fold over token keys, mod a large prime — identical arithmetic in both
# engines, so fully oracle-checked)
# ---------------------------------------------------------------------------
@register(
    "t10_rolling_hash",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         list_transform(string_split(LOWER(TRIM(text)), ' '),
                        t -> CAST(LENGTH(t) * 31 + unicode(t) AS BIGINT)) AS ks
  FROM documents
)
SELECT doc_id,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), ks),
                        (a, b) -> (a * 31 + b) % 1000000007) AS BIGINT)
         AS rolling_hash
FROM toks
""",
)
def t10_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = F.split(F.lower(F.trim(F.col("text"))), " ")
    keys = F.transform(
        toks, lambda t: (F.length(t) * 31 + F.ascii(t)).cast("long")
    )
    rolling = F.aggregate(
        keys, F.lit(0).cast("long"), lambda a, b: (a * 31 + b) % 1000000007
    )
    return docs.select("doc_id", rolling.alias("rolling_hash"))


# ---------------------------------------------------------------------------
# q141 — the WHOLE preprocessing pipeline as ONE hash-gated query: the
# narrative close of the training-data family. documents → quality
# filter (t02's exact features and thresholds) → exact dedup on the
# normalized fingerprint (d02's rule, min-doc_id keeper) → per-language
# corpus summary. Three shuffles end to end (quality is shuffle-free,
# dedup groups on the md5 key, summary groups on lang); every stage's
# arithmetic is the engine-exact construction its standalone query
# already proved, so the COMPOSITION is hash-exact too — a user can run
# the full pipeline and diff nothing.
# ---------------------------------------------------------------------------
@register(
    "q141_pipeline_end_to_end",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang, text,
         string_split(LOWER(TRIM(text)), ' ') AS tok, LENGTH(text) AS c
  FROM documents
),
feat AS (
  SELECT doc_id, lang, text,
         CAST(len(tok) AS INTEGER) AS n_tokens,
         CAST(len(list_filter(tok, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS BIGINT) AS sw_hits,
         ROUND(CAST(len(list_filter(tok, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS DOUBLE)
               / CAST(len(tok) AS DOUBLE), 6) AS stopword_ratio,
         ROUND(CAST(c - len(tok) + 1 AS DOUBLE) / CAST(len(tok) AS DOUBLE), 6) AS mean_token_len
  FROM toks
),
kept AS (
  SELECT * FROM feat
  WHERE n_tokens BETWEEN 5 AND 1000
    AND stopword_ratio >= 0.01
    AND mean_token_len BETWEEN 2.0 AND 12.0
),
keepers AS (
  SELECT md5(LOWER(TRIM(text))) AS fp, MIN(doc_id) AS keeper_id
  FROM kept GROUP BY 1
),
final AS (
  SELECT k.* FROM kept k JOIN keepers d ON k.doc_id = d.keeper_id
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       -- exact: two integer sums and ONE IEEE division (order-free),
       -- never a sum of rounded doubles
       CAST(SUM(sw_hits) AS DOUBLE) / CAST(SUM(n_tokens) AS DOUBLE)
         AS corpus_stopword_rate
FROM final
GROUP BY lang
""",
)
def q141_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    tok = F.split(F.lower(F.trim(F.col("text"))), " ")
    sw = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    feat = docs.select(
        "doc_id",
        "lang",
        "text",
        F.size(tok).alias("n_tokens"),
        F.size(F.filter(tok, lambda x: F.array_contains(sw, x)))
        .cast("bigint")
        .alias("sw_hits"),
        F.round(
            F.size(F.filter(tok, lambda x: F.array_contains(sw, x))).cast("double")
            / F.size(tok).cast("double"),
            6,
        ).alias("stopword_ratio"),
        F.round(
            (F.length("text") - F.size(tok) + 1).cast("double")
            / F.size(tok).cast("double"),
            6,
        ).alias("mean_token_len"),
    )
    kept = feat.filter(
        F.col("n_tokens").between(5, 1000)
        & (F.col("stopword_ratio") >= 0.01)
        & F.col("mean_token_len").between(2.0, 12.0)
    )
    keepers = (
        kept.groupBy(F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))
        .agg(F.min("doc_id").alias("keeper_id"))
        .select("keeper_id")
    )
    final = kept.join(
        keepers, kept["doc_id"] == keepers["keeper_id"]
    )
    return final.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (
            F.sum("sw_hits").cast("double")
            / F.sum("n_tokens").cast("double")
        ).alias("corpus_stopword_rate"),
    )
