"""Persisted IVF index (lake tables as the index medium): results match
the equivalent session computation (s06's construction), freshness is
enforced through the source snapshot id, rebuild restores it."""

import pytest

import pyspark.sql.functions as F

from icebergplus_spark.lake import LocalLakeCatalog
from icebergplus_spark.operators.vector_index import (
    StaleIndexError,
    build_ivf_index,
    index_is_fresh,
    query_index,
)
from icebergplus_spark.sources import load_table


@pytest.fixture
def indexed(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    cat = LocalLakeCatalog(spark, str(tmp_path / "wh")).start()
    t = cat.create_table("vec.corpus", emb.schema)
    t.append(emb)
    build_ivf_index(cat, "vec.corpus", "vec.idx", k=16)
    return cat, emb


def test_query_matches_session_ivf(spark, indexed):
    """Same deterministic construction as s06 (first-K centroids), so
    the persisted-index search must reproduce the in-session query
    path's results exactly."""
    from icebergplus_spark.registry import QUERIES, load_all

    load_all()
    cat, emb = indexed
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    got = {
        (r["query_id"], r["rk"]): (r["neighbor_id"], r["cos_sim"])
        for r in query_index(cat, "vec.idx", queries, nprobe=4, top_k=5).collect()
    }
    import tests.conftest as c

    want = {
        (r["query_id"], r["rk"]): (r["neighbor_id"], r["cos_sim"])
        for r in QUERIES["s06_ivf_flat"](spark, c.SF_DIR).collect()
    }
    assert got == want


def test_staleness_contract(spark, indexed):
    cat, emb = indexed
    assert index_is_fresh(cat, "vec.idx")
    # source advances → index is stale → query refuses
    src = cat.load_table("vec.corpus")
    bump = emb.limit(1).select(
        *[
            (F.col(c) + 100000).alias(c) if c == "vec_id" else F.col(c)
            for c in emb.columns
        ]
    )
    src.append(bump)
    assert not index_is_fresh(cat, "vec.idx")
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    with pytest.raises(StaleIndexError, match="advanced"):
        query_index(cat, "vec.idx", queries)
    # knowing opt-out still works; rebuild restores freshness
    assert query_index(cat, "vec.idx", queries, allow_stale=True).count() > 0
    build_ivf_index(cat, "vec.corpus", "vec.idx", k=16)
    assert index_is_fresh(cat, "vec.idx")
    assert query_index(cat, "vec.idx", queries).count() > 0


def test_index_survives_restart(spark, indexed, tmp_path):
    """The index is durable catalog state: a fresh catalog instance
    over the warehouse serves queries with no rebuild."""
    cat, emb = indexed
    cat2 = LocalLakeCatalog(spark, cat.root_dir).start()
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    out = query_index(cat2, "vec.idx", queries, top_k=3)
    assert out.count() == 9
