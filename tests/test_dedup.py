"""Dedup operator unit tests: MinHash/LSH finds planted near-dups,
SimHash collides on identical docs, shingles behave."""

import pyspark.sql.functions as F

from icebergplus_spark.operators.dedup import (
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_K,
    shingles,
)


def test_lsh_config():
    assert MINHASH_K == LSH_BANDS * LSH_ROWS


def test_shingles_distinct_and_ordered(spark):
    df = spark.createDataFrame([("a b c d e",), ("a b",)], "text string")
    rows = df.select(shingles("text", 3).alias("sh")).collect()
    assert sorted(rows[0]["sh"]) == ["a b c", "b c d", "c d e"]
    # shorter than n → whole text as single shingle
    assert rows[1]["sh"] == ["a b"]


def test_minhash_lsh_finds_planted_neardup(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.filter(F.col("doc_id") == 0).select("doc_id", "text").first()
    # Plant a near-duplicate: copy of doc 0 with a couple words changed.
    words = base["text"].split()
    words[3] = "ZZZ"
    near = " ".join(words)
    planted = docs.select("doc_id", "text", "lang", "source", "n_chars").unionByName(
        spark.createDataFrame(
            [(100000, near, "en", "synthetic", len(near))],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    )
    out_dir = str(tmp_path / "docs_planted")
    planted.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    from icebergplus_spark.registry import QUERIES

    pairs = QUERIES["d04_minhash_lsh"](spark, out_dir).collect()
    found = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs}
    assert (0, 100000) in found
    assert found[(0, 100000)] > 0.7


def test_simhash_identical_docs_collide(spark, tmp_path):
    rows = [(i, "alpha beta gamma delta epsilon zeta", "en", "s", 35) for i in range(2)]
    rows.append((2, "totally different words entirely here now", "en", "s", 41))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out_dir = str(tmp_path / "docs_sim")
    df.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    from icebergplus_spark.registry import QUERIES

    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in QUERIES["d05_simhash"](spark, out_dir).collect()}
    assert pairs.get((0, 1)) == 0
    assert (0, 2) not in pairs


def test_d08_size_guard(spark, monkeypatch):
    """d08's exact all-pairs baseline refuses to run past its size
    bound (the weak-by-design foot-gun flagged in VERDICT r3)."""
    import pytest as _pytest

    from icebergplus_spark.operators.dedup import d08_embedding_neardup

    monkeypatch.setenv("D08_MAX_ROWS", "3")
    with _pytest.raises(ValueError, match="all-pairs baseline refused"):
        d08_embedding_neardup(spark, "/root/testdata/sf0.001").count()


def test_d08_numpy_kernel_matches_jvm_fold(spark, tmp_path):
    """r12: d08's vectorized kernel must reproduce the JVM higher-order
    fold bit-for-bit — same per-dimension rounding order — on a synthetic
    corpus with varied magnitudes (run both the old broadcast-join
    expression and the new pipeline over the same parquet)."""
    import numpy as np
    import pyspark.sql.functions as F

    from icebergplus_spark.operators.dedup import d08_embedding_neardup
    from icebergplus_spark.operators.similarity import cosine

    rng = np.random.RandomState(7)
    n, dim = 120, 16
    M = (rng.randn(n, dim) * rng.choice([1e-3, 1.0, 1e3], size=(n, 1))).astype(
        "float32"
    )
    rows = [(i, M[i].tolist(), 0) for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf}/embeddings.parquet")
    got = sorted(
        tuple(r) for r in d08_embedding_neardup(spark, sf).collect()
    )
    a = df.select(F.col("vec_id").alias("doc_a"), F.col("embedding").alias("ea"))
    b = df.select(F.col("vec_id").alias("doc_b"), F.col("embedding").alias("eb"))
    old = (
        a.join(F.broadcast(b), F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.35)
    )
    want = sorted(tuple(r) for r in old.collect())
    assert got == want and len(got) > 0


def test_d08_null_rows_are_inert(spark, tmp_path):
    """Rows with NULL vec_id or NULL embedding emit no pair (the old
    plan's NULL-join/NULL-filter behavior)."""
    from icebergplus_spark.operators.dedup import d08_embedding_neardup

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.0], 0),
        (None, [1.0, 0.0], 0),
        (3, None, 0),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf}/embeddings.parquet")
    got = sorted(tuple(r) for r in d08_embedding_neardup(spark, sf).collect())
    assert got == [(1, 2, 1.0)]
