"""Duplicate-cluster resolution + deterministic sampling/mixing —
the policy layer of a dedup pipeline (SURVEY.md §2.B MinHash row:
"connected components via iterative joins").

Connected components turns pairwise near-dup candidates (d04/d05) into
dedup groups: every doc in a component keeps/drops together. Implemented
as iterative label propagation (small-star style): each node adopts the
minimum label in its neighborhood until a fixed point. Iterations are
bounded by the component diameter (near-dup clusters are shallow);
each round is one join + one aggregation, all shuffle-on-key.

Deterministic hash sampling uses md5 (identical in Spark and DuckDB) so
the SAME rows are selected in both engines — reproducible train/eval
splits that survive re-runs and engine changes, unlike rand()-based
sampling.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from icebergplus_spark.registry import register
from icebergplus_spark.session import prepare_session
from icebergplus_spark.sources import load_table


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
    driver_cap: int = 100_000,
) -> DataFrame:
    """(node, component) for every node in the edge list; component id =
    min node id in the component.

    Size-tiered (r12, guide §1.2/§5): the edge list is the SMALL derived
    artifact of a dedup pipeline (candidate pairs, not the corpus — the
    caller's own output is the same magnitude), so up to ``driver_cap``
    edges a driver-side union-find answers in microseconds what the
    iterative tier pays ~2 Spark actions PER ROUND for (join + sum
    fixpoint probe + localCheckpoint; measured 18.5 s at sf0.1 for a
    ~250-edge graph — pure per-round fixed cost). Past the cap, the
    distributed label-propagation runs unchanged; both tiers compute
    the identical min-label fixed point."""
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
    )

    node_type = edges.schema[src].dataType
    # The driver tier needs hashable, Python-orderable node values whose
    # order matches Spark's min aggregation: atomic ints and strings
    # qualify; arrays/structs aren't dict keys, and float NaN orders
    # differently than Spark's min (ADVICE r12) — those fall through to
    # the distributed tier, like NULL endpoints below.
    atomic = isinstance(
        node_type, (ByteType, ShortType, IntegerType, LongType, StringType)
    )
    if atomic and node_type == edges.schema[dst].dataType:
        # ONE capped collect answers both the size probe and the edge
        # fetch (the C2 fused-probe pattern): an over-cap result falls
        # through with only cap+1 rows ever reaching the driver — the
        # accepted one-time tier-probe cost (bounded; avoiding it would
        # put an extra count action on the common under-cap path).
        rows = (
            edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
            .limit(driver_cap + 1)
            .collect()
        )
    else:
        rows = None
    if rows is not None and len(rows) <= driver_cap:
        if all(r["a"] is not None and r["b"] is not None for r in rows):
            parent: dict = {}

            def find(x):
                r = x
                while parent[r] != r:
                    r = parent[r]
                while parent[x] != r:  # path compression
                    parent[x], x = r, parent[x]
                return r

            for r_ in rows:
                a, b = r_["a"], r_["b"]
                for v in (a, b):
                    if v not in parent:
                        parent[v] = v
                ra, rb = find(a), find(b)
                if ra != rb:  # smaller root wins → root == component min
                    parent[max(ra, rb)] = min(ra, rb)
            out = sorted((v, find(v)) for v in parent)
            from pyspark.sql.types import StructField, StructType

            from icebergplus_spark.localrel import local_rows_df

            return local_rows_df(
                edges.sparkSession,
                out,
                StructType(
                    [
                        StructField("node", node_type),
                        StructField("comp", node_type),
                    ]
                ),
            )
        # null endpoints: degenerate input — let the join tier's NULL
        # semantics handle it exactly as before
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    # undirected adjacency incl. self-loop (keeps isolated endpoints)
    adj = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .union(nodes.select(F.col("node").alias("a"), F.col("node").alias("b")))
        .distinct()
    )
    labels = nodes.select("node", F.col("node").alias("comp"))
    prev_sum: int | None = None
    for _ in range(max_iter):
        # each node adopts min(label of neighbors ∪ self)
        new_labels = (
            adj.join(labels, adj["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("comp").alias("comp"))
        ).localCheckpoint(eager=True)  # cut the lineage each round
        # labels only decrease under min-propagation → the label sum is
        # strictly monotone until the fixed point: one cheap aggregate
        # per round instead of a join-based change detector
        cur_sum = new_labels.agg(F.sum("comp")).first()[0]
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


# ---------------------------------------------------------------------------
# d07 — near-dup clusters: LSH candidate pairs → components → keep min id.
# Oracle-checked end-to-end: pairs come from the portable md5 MinHash-LSH
# (d12), and DuckDB replays the connected-components step with a
# recursive CTE (min label over every reachable node == the iterative
# min-propagation fixed point Spark computes).
# ---------------------------------------------------------------------------
import icebergplus_spark.operators.dedup  # noqa: E402  (registers d12's oracle)
from icebergplus_spark.registry import ORACLES as _ORACLES

# d12's oracle is reused verbatim as the edge list so the two queries
# stay in lockstep (same shingles, same md5 minhash, same banding).
_D12_PAIRS_SQL = _ORACLES["d12_minhash_portable"]


@register("d07_dup_clusters", oracle=f"""
WITH pairs AS ({_D12_PAIRS_SQL}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
nodes AS (SELECT DISTINCT a AS node FROM edges),
walk AS (
  WITH RECURSIVE w(node, lbl) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT e.b, w.lbl FROM w JOIN edges e ON e.a = w.node
  )
  SELECT node, MIN(lbl) AS comp FROM w GROUP BY node
)
SELECT comp,
       COUNT(*) AS cluster_size,
       MIN(node) AS keeper_id,
       array_to_string(list(node ORDER BY node), ',') AS members
FROM walk
GROUP BY comp
""")
def d07_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergplus_spark.operators.dedup import d12_minhash_portable

    pairs = d12_minhash_portable(spark, sf_dir).select("doc_a", "doc_b")
    comps = connected_components(pairs)
    # members as a joined string, not array<long>: the driver's result
    # canonicalizer hashes column values and cannot sort ndarray cells
    return comps.groupBy("comp").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.min("node").alias("keeper_id"),
        F.array_join(F.sort_array(F.collect_list("node")), ",").alias("members"),
    )


# ---------------------------------------------------------------------------
# t07 — deterministic hash split: reproducible train/eval assignment
# (md5 agrees across engines → fully oracle-checkable)
# ---------------------------------------------------------------------------
@register(
    "t07_hash_split",
    oracle="""
WITH h AS (
  SELECT doc_id, lang,
         CAST(('0x' || SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS INTEGER) % 100
           AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM h
GROUP BY 1
""",
)
def t07_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long") % 100
    )
    return (
        docs.select(
            "doc_id",
            F.when(bucket < 80, "train")
            .when(bucket < 90, "val")
            .otherwise("test")
            .alias("split"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
    )


# ---------------------------------------------------------------------------
# t08 — deterministic source mixing: per-source hash-rate downsampling
# (data-mixing layer of a training pipeline; same rows in both engines)
# ---------------------------------------------------------------------------
@register(
    "t08_source_mix_sample",
    oracle="""
WITH h AS (
  SELECT doc_id, source, n_chars,
         CAST(('0x' || SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS INTEGER) % 100
           AS bucket
  FROM documents
),
sampled AS (
  SELECT * FROM h
  WHERE (source IN ('src0','src1','src2','src3','src4') AND bucket < 50)
     OR (source NOT IN ('src0','src1','src2','src3','src4') AND bucket < 100)
)
SELECT source, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS kept_chars
FROM sampled
GROUP BY source
""",
)
def t08_source_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long") % 100
    )
    downsampled = F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    keep = (downsampled & (bucket < 50)) | (~downsampled & (bucket < 100))
    return (
        docs.filter(keep)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
        )
    )
