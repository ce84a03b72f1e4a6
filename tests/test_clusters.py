"""Connected-components and deterministic sampling tests."""

import pyspark.sql.functions as F

from icebergplus_spark.operators.clusters import connected_components
from icebergplus_spark.registry import QUERIES, load_all

load_all()


def test_connected_components_known_graph(spark):
    # components: {1,2,3,4} (chain), {10,11}, {20} (self-edge only)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20)], "doc_a long, doc_b long"
    )
    comps = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_long_chain(spark):
    # a 12-node chain needs multiple propagation rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    comps = connected_components(edges)
    assert comps.select("comp").distinct().count() == 1
    assert comps.count() == 13


def test_hash_split_is_deterministic_and_disjoint(spark, sf_dir):
    a = QUERIES["t07_hash_split"](spark, sf_dir).collect()
    b = QUERIES["t07_hash_split"](spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    total = sum(r["n_docs"] for r in a)
    assert total == 500  # every doc in exactly one split
    frac = {r["split"]: r["n_docs"] / total for r in a}
    assert 0.7 < frac["train"] < 0.9  # ~80/10/10


def test_dup_clusters_cover_pair_nodes(spark, sf_dir):
    # d07 clusters the portable (oracle-checked) d12 candidate pairs
    pairs = QUERIES["d12_minhash_portable"](spark, sf_dir).select("doc_a", "doc_b")
    n_nodes = (
        pairs.select(F.col("doc_a").alias("n"))
        .union(pairs.select(F.col("doc_b").alias("n")))
        .distinct()
        .count()
    )
    clusters = QUERIES["d07_dup_clusters"](spark, sf_dir).collect()
    assert sum(r["cluster_size"] for r in clusters) == n_nodes
    # keeper is always the smallest member (members is a sorted csv string)
    assert all(
        r["keeper_id"] == min(int(m) for m in r["members"].split(","))
        for r in clusters
    )


def test_connected_components_tiers_agree(spark):
    """r12 size tier: the driver union-find (default) and the iterative
    distributed tier (driver_cap=0) must produce the identical
    (node, comp) partition on the same graph."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20), (5, 4), (11, 12)],
        "doc_a long, doc_b long",
    )
    fast = {
        r["node"]: r["comp"] for r in connected_components(edges).collect()
    }
    slow = {
        r["node"]: r["comp"]
        for r in connected_components(edges, driver_cap=0).collect()
    }
    assert fast == slow == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20
    }


def test_connected_components_string_nodes(spark):
    """The driver tier preserves the node column type (string ids)."""
    edges = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "x")], "doc_a string, doc_b string"
    )
    comps = connected_components(edges)
    assert dict(comps.collect()) == {"a": "a", "b": "a", "c": "a", "x": "x"}
    assert comps.schema["comp"].dataType.simpleString() == "string"
