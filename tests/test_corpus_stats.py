"""Semantic properties of the corpus-statistics ops (t28/t29/d15).

The driver's oracle gate proves value equality vs DuckDB; these tests
pin the *meaning*: PMI ranks genuinely associated pairs above chance,
rarity is a proper cross-entropy (bounded by the corpus entropy range),
and chunk-dup detection recovers a planted boilerplate block.
"""

import pyspark.sql.functions as F
import pytest

from icebergplus_spark import registry

registry.load_all()


def test_pmi_properties(spark, sf_dir):
    rows = registry.QUERIES["t28_collocations"](spark, sf_dir).collect()
    assert rows, "no collocations above the support threshold"
    for r in rows:
        assert r.pair_count >= 5
        assert r.pmi == pytest.approx(r.pmi)  # finite, not NaN
    # PMI is information content: |pmi| can't exceed -log2(p_min) of the
    # rarer member; with this vocab everything sits well inside ±16 bits.
    assert all(abs(r.pmi) < 16 for r in rows)


def test_rarity_is_cross_entropy(spark, sf_dir):
    df = registry.QUERIES["t29_rarity_score"](spark, sf_dir)
    rows = df.collect()
    n_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    assert len(rows) == n_docs  # every doc scored
    # cross-entropy vs the corpus unigram model is >= the model entropy
    # of the doc's own tokens; with a closed vocab it is positive and
    # bounded by log2(vocab) plus slack for rare tokens.
    assert all(0 < r.rarity_bits < 32 for r in rows)


def test_chunk_dedup_flags_planted_boilerplate(spark, sf_dir, tmp_path):
    from icebergplus_spark.operators.corpus_stats import d15_chunk_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # Plant: two docs that share one exact 20-token block but differ
    # otherwise, plus one pristine doc.
    block = " ".join(f"tok{i}" for i in range(20))
    planted = spark.createDataFrame(
        [
            (900001, block + " unique left tail", "en", "plant", 1),
            (900002, block + " different right tail", "en", "plant", 1),
            (900003, "entirely novel words only here", "en", "plant", 1),
        ],
        schema=docs.schema,
    )
    out = str(tmp_path / "documents.parquet")
    docs.unionByName(planted).write.mode("overwrite").parquet(out)
    tmp_sf = str(tmp_path)
    # d15 loads <sf_dir>/documents.parquet
    res = {
        r.doc_id: r
        for r in d15_chunk_dedup(spark, tmp_sf).filter(
            F.col("doc_id") >= 900001
        ).collect()
    }
    assert res[900001].shared_chunks >= 1
    assert res[900002].shared_chunks >= 1
    assert res[900003].shared_chunks == 0
    assert 0.0 <= res[900001].shared_ratio <= 1.0
