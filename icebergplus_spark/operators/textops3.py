"""Training-data pipeline text ops, round 3: benchmark decontamination
and within-doc repetition filtering.

- t20: eval-set decontamination — the step that removes benchmark
  leakage from a training corpus (docs sharing any word 5-gram with a
  held-out eval set). The eval side of the join is the small side by
  construction (benchmarks are a few thousand docs even when the corpus
  is 100 TB), so it is broadcast: the corpus streams once, no shuffle
  of the big side, no skew surface.
- t22: within-doc repetition (Gopher-style "fraction of the doc that is
  its most frequent n-gram") — a pure per-doc aggregation: shuffle on
  (doc_id) only, two-phase count, no cross-doc state at all, so it
  scales embarrassingly.

Both are JVM-only plans (no Python UDF) with DuckDB oracle twins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from icebergplus_spark.registry import register
from icebergplus_spark.session import prepare_session
from icebergplus_spark.sources import load_table

N_EVAL_DOCS = 50  # doc_id < 50 plays the held-out benchmark set


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# t20 — benchmark decontamination: flag training docs that share any
# word 5-gram with the eval set; per-doc contamination rate.
# ---------------------------------------------------------------------------
_T20_SHINGLES = """
words AS (
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
)
"""


@register(
    "t20_decontaminate",
    oracle=f"""
WITH {_T20_SHINGLES},
ev AS (SELECT DISTINCT g FROM sh WHERE doc_id < {N_EVAL_DOCS})
SELECT s.doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS contaminated,
       ROUND(CAST(SUM(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS contamination_rate
FROM sh s LEFT JOIN ev e ON s.g = e.g
WHERE s.doc_id >= {N_EVAL_DOCS}
GROUP BY s.doc_id
""",
)
def t20_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergplus_spark.operators.dedup import shingles

    docs = _docs(spark, sf_dir)
    sh = docs.select("doc_id", F.explode(shingles("text", 5)).alias("g"))
    # eval grams: small by construction → broadcast to every corpus task
    ev = (
        sh.filter(F.col("doc_id") < N_EVAL_DOCS)
        .select("g")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = sh.filter(F.col("doc_id") >= N_EVAL_DOCS)
    hit = F.sum(F.when(F.col("hit").isNotNull(), 1).otherwise(0))
    return (
        train.join(F.broadcast(ev), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            hit.alias("contaminated"),
            F.round(hit.cast("double") / F.count(F.lit(1)), 6).alias(
                "contamination_rate"
            ),
        )
    )


# ---------------------------------------------------------------------------
# t22 — within-doc repetition filter: most-frequent-trigram share
# (Gopher repetition rule). Trigram counts keep multiplicity — this is
# deliberately NOT the distinct shingle set the dedup ops use.
# ---------------------------------------------------------------------------
def _grams_with_multiplicity(col: str, n: int):
    """Word n-gram array WITHOUT dedup (repetition is the signal)."""
    toks = F.split(F.trim(F.lower(F.col(col))), r"\s+")
    m = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    out = F.slice(toks, 1, m)
    for j in range(1, n):
        nxt = F.slice(toks, j + 1, m)
        out = F.zip_with(out, nxt, lambda x, y: F.concat(x, F.lit(" "), y))
    return F.when(F.size(toks) >= n, out).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


@register(
    "t22_repetition_filter",
    oracle="""
WITH words AS (
  SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS w
  FROM documents
),
g AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3 THEN array_to_string(w[i:i+2], ' ')
              ELSE array_to_string(w, ' ') END AS g
  FROM (
    SELECT doc_id, w,
           unnest(generate_series(1, GREATEST(len(w) - 2, 1))) AS i
    FROM words
  )
),
c AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY doc_id, g)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_grams,
       COUNT(*) AS n_distinct,
       CAST(MAX(c) AS BIGINT) AS top_gram_count,
       ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS rep_ratio
FROM c GROUP BY doc_id
""",
)
def t22_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    grams = docs.select(
        "doc_id", F.explode(_grams_with_multiplicity("text", 3)).alias("g")
    )
    per_gram = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_gram_count"),
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias("rep_ratio"),
    )


# ---------------------------------------------------------------------------
# t23 — stratified sampling with exact per-stratum quotas: take
# ceil(30%) of each source, choosing docs in deterministic md5 order
# (a reproducible shuffle — rerunning on a grown corpus keeps the
# earlier picks' relative order, unlike rand()). One window per
# stratum: shuffle on source only, rank, cut at the quota. At 100 TB
# the per-stratum window is the bounded-key case (sources are few);
# an unbounded stratum key would switch to the t08 hash-rate filter,
# which needs no window at all.
# ---------------------------------------------------------------------------
SAMPLE_FRAC = 0.3


@register(
    "t23_stratified_sample",
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk,
         COUNT(*) OVER (PARTITION BY source) AS stratum_n
  FROM documents
)
SELECT source,
       COUNT(*) AS n_sampled,
       CAST(MIN(stratum_n) AS BIGINT) AS stratum_n,
       CAST(SUM(n_chars) AS BIGINT) AS sampled_chars,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM ranked
WHERE rk <= CEIL(stratum_n * {SAMPLE_FRAC})
GROUP BY source
""",
)
def t23_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    wn = Window.partitionBy("source")
    ranked = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("stratum_n"),
    )
    return (
        ranked.filter(F.col("rk") <= F.ceil(F.col("stratum_n") * SAMPLE_FRAC))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("stratum_n").alias("stratum_n"),
            F.sum("n_chars").alias("sampled_chars"),
            F.min("doc_id").alias("first_doc"),
        )
    )


# ---------------------------------------------------------------------------
# d13 — incremental dedup: admit only NEW docs whose fingerprint does
# not already exist in the historical corpus (docs below the watermark
# id play "history"). This is the steady-state shape of corpus dedup —
# each ingest batch is deduped against the accumulated fingerprint set,
# never corpus-vs-corpus. The history side reduces to (fingerprint)
# only before the anti-join: at 100 TB that column is the only thing
# shuffled (or looked up from the fingerprint table the lake layer
# maintains), and the batch side is small by construction.
# ---------------------------------------------------------------------------
HISTORY_WATERMARK = 400  # doc_id < 400 = already-ingested corpus


@register(
    "d13_incremental_dedup",
    oracle=f"""
WITH fp AS (
  SELECT doc_id, source, md5(LOWER(TRIM(text))) AS fingerprint
  FROM documents
),
hist AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id < {HISTORY_WATERMARK}),
batch AS (SELECT * FROM fp WHERE doc_id >= {HISTORY_WATERMARK}),
novel AS (
  SELECT b.* FROM batch b LEFT JOIN hist h USING (fingerprint)
  WHERE h.fingerprint IS NULL
)
SELECT source,
       (SELECT COUNT(*) FROM batch b2 WHERE b2.source = novel.source) AS batch_docs,
       COUNT(*) AS admitted,
       CAST(MIN(doc_id) AS BIGINT) AS first_admitted
FROM novel
GROUP BY source
""",
)
def d13_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    fp = docs.select(
        "doc_id", "source", F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint")
    )
    hist = (
        fp.filter(F.col("doc_id") < HISTORY_WATERMARK)
        .select("fingerprint")
        .distinct()
    )
    batch = fp.filter(F.col("doc_id") >= HISTORY_WATERMARK)
    batch_sizes = batch.groupBy("source").agg(F.count(F.lit(1)).alias("batch_docs"))
    novel = batch.join(hist, "fingerprint", "left_anti")
    return (
        novel.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("admitted"),
            F.min("doc_id").alias("first_admitted"),
        )
        .join(batch_sizes, "source")
        .select("source", "batch_docs", "admitted", "first_admitted")
    )


# ---------------------------------------------------------------------------
# t24 — TF-IDF keyword search: rank docs for a keyword query with an
# inverted-index plan — explode tokens, keep only query terms (the
# filter IS the inverted-index probe: at 100 TB the explode+filter is a
# pre-materialized postings table and this becomes a semi-join on it),
# score = Σ tf·idf over matched terms, global top-20.
# ---------------------------------------------------------------------------
SEARCH_TERMS = ("spark", "stream", "vector")
TOP_DOCS = 20


@register(
    "t24_keyword_search",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(LOWER(TRIM(text)), '\\s+')) AS tok
  FROM documents
),
n_docs AS (SELECT COUNT(*) AS n FROM documents),
tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks
  WHERE tok IN {SEARCH_TERMS!r}
  GROUP BY doc_id, tok
),
df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
scored AS (
  SELECT tf.doc_id,
         SUM(tf.tf * LN(CAST(n.n AS DOUBLE) / df.df)) AS score,
         COUNT(*) AS terms_hit
  FROM tf JOIN df USING (tok) CROSS JOIN n_docs n
  GROUP BY tf.doc_id
)
SELECT doc_id, ROUND(score, 6) AS score, terms_hit,
       -- rank on the ROUNDED score: raw double sums differ at ulp level
       -- across engines (different accumulation order over terms)
       CAST(ROW_NUMBER() OVER (ORDER BY ROUND(score, 6) DESC, doc_id) AS INTEGER) AS rk
FROM scored
ORDER BY rk
LIMIT {TOP_DOCS}
""",
)
def t24_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    # corpus size as a broadcast 1-row frame — keeps the whole query one
    # lazy plan (no separate driver-side count action)
    n_df = docs.agg(F.count(F.lit(1)).alias("__n"))
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    )
    tf = (
        toks.filter(F.col("tok").isin(*SEARCH_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "tok")
        .crossJoin(F.broadcast(n_df))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("tf") * F.log(F.col("__n").cast("double") / F.col("df"))
            ).alias("score"),
            F.count(F.lit(1)).alias("terms_hit"),
        )
    )
    rounded = scored.select(
        "doc_id", F.round("score", 6).alias("score"), "terms_hit"
    )
    # Global top-k FIRST (TakeOrderedAndProject — per-partition heaps, no
    # single-partition sort of every scored doc), then rank only the k
    # survivors. The constant-but-unfoldable partition key (pmod(x,1)=0)
    # keeps WindowExec off its unpartitioned path; the window sees
    # TOP_DOCS rows, not the corpus.
    topk = rounded.orderBy(F.col("score").desc(), "doc_id").limit(TOP_DOCS)
    w = Window.partitionBy(F.pmod(F.col("doc_id"), F.lit(1))).orderBy(
        F.col("score").desc(), "doc_id"
    )
    return topk.withColumn("rk", F.row_number().over(w))


# ---------------------------------------------------------------------------
# t26 — corpus report: the per-source "dataset card" numbers a curation
# run publishes — volume, exact-dup rate, language spread, length
# profile. One scan, one two-phase aggregate per source; the distinct
# counts expand to Spark's standard two-phase distinct aggregate (still
# map-side partial at 100 TB).
# ---------------------------------------------------------------------------
@register(
    "t26_corpus_report",
    oracle="""
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(COUNT(DISTINCT text) AS BIGINT) AS distinct_texts,
       ROUND(1.0 - CAST(COUNT(DISTINCT text) AS DOUBLE) / COUNT(*), 6)
         AS dup_rate,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY source
""",
)
def t26_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("text").alias("distinct_texts"),
        F.round(
            F.lit(1.0) - F.countDistinct("text").cast("double") / F.count(F.lit(1)),
            6,
        ).alias("dup_rate"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# t27 — curation filter funnel (FineWeb/RefinedWeb-style): the ordered
# filter chain a web-scale curation run applies, reported as a funnel —
# each document is charged to the FIRST stage that drops it, and
# duplicates are ranked only among docs that survived every earlier
# stage (dedup after filtering, the standard pipeline order). One scan,
# one window over the fingerprint, one small group-by: the funnel
# report costs no more than the filters themselves at 100 TB.
# ---------------------------------------------------------------------------
@register(
    "t27_filter_funnel",
    oracle="""
WITH feat AS (
  SELECT doc_id, lang, n_chars, md5(LOWER(TRIM(text))) AS fp,
         string_split(LOWER(TRIM(text)), ' ') AS tok
  FROM documents
),
f2 AS (
  SELECT doc_id, lang, n_chars, fp,
         len(tok) AS n_tokens,
         CAST(len(list_filter(tok, x -> list_contains(
           ['the','a','of','and','to','in','is','it'], x))) AS DOUBLE)
           / CAST(len(tok) AS DOUBLE) AS swr
  FROM feat
),
f3 AS (
  SELECT *,
         (lang = 'en') AND (n_chars BETWEEN 100 AND 450)
           AND (n_tokens BETWEEN 5 AND 1000) AND (swr >= 0.05) AS pre_pass,
         ROW_NUMBER() OVER (
           PARTITION BY fp,
             (lang = 'en') AND (n_chars BETWEEN 100 AND 450)
               AND (n_tokens BETWEEN 5 AND 1000) AND (swr >= 0.05)
           ORDER BY doc_id) AS dup_rn
  FROM f2
),
staged AS (
  SELECT CASE
           WHEN lang <> 'en' THEN 'lang'
           WHEN n_chars NOT BETWEEN 100 AND 450 THEN 'length'
           WHEN n_tokens NOT BETWEEN 5 AND 1000 OR swr < 0.05 THEN 'quality'
           WHEN dup_rn > 1 THEN 'dup'
           ELSE 'kept' END AS stage
  FROM f3
)
SELECT stage,
       CAST(CASE stage WHEN 'lang' THEN 1 WHEN 'length' THEN 2
                  WHEN 'quality' THEN 3 WHEN 'dup' THEN 4 ELSE 5
       END AS BIGINT) AS stage_order,
       COUNT(*) AS n_docs
FROM staged GROUP BY stage
""",
)
def t27_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from icebergplus_spark.operators.textops import STOPWORDS_EN

    docs = _docs(spark, sf_dir)
    tok = F.split(F.lower(F.trim(F.col("text"))), " ")
    sw = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    f2 = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp"),
        F.size(tok).alias("n_tokens"),
        (
            F.size(F.filter(tok, lambda x: F.array_contains(sw, x))).cast("double")
            / F.size(tok).cast("double")
        ).alias("swr"),
    )
    pre_pass = (
        (F.col("lang") == "en")
        & F.col("n_chars").between(100, 450)
        & F.col("n_tokens").between(5, 1000)
        & (F.col("swr") >= 0.05)
    )
    # dedup AFTER filtering: rank within (fingerprint, survived-so-far)
    # so dropped docs never claim keeper slots
    w = Window.partitionBy("fp", pre_pass).orderBy("doc_id")
    f3 = f2.withColumn("pre_pass", pre_pass).withColumn(
        "dup_rn", F.row_number().over(w)
    )
    stage = (
        F.when(F.col("lang") != "en", F.lit("lang"))
        .when(~F.col("n_chars").between(100, 450), F.lit("length"))
        .when(
            ~F.col("n_tokens").between(5, 1000) | (F.col("swr") < 0.05),
            F.lit("quality"),
        )
        .when(F.col("dup_rn") > 1, F.lit("dup"))
        .otherwise(F.lit("kept"))
    )
    order = (
        F.when(F.col("stage") == "lang", 1)
        .when(F.col("stage") == "length", 2)
        .when(F.col("stage") == "quality", 3)
        .when(F.col("stage") == "dup", 4)
        .otherwise(5)
    )
    return (
        f3.select(stage.alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("stage_order", order.cast("long"))
        .select("stage", "stage_order", "n_docs")
    )
