"""Similarity search tests: brute-force agrees with numpy; LSH recall."""

import numpy as np
import pyspark.sql.functions as F

from icebergplus_spark.operators import similarity as sim
from icebergplus_spark.registry import QUERIES, load_all

load_all()


def _numpy_topk(sf_dir, n_queries=10, k=5):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    mat = np.stack(t["embedding"].map(np.asarray)).astype("float64")
    ids = t["vec_id"].to_numpy()
    norms = np.linalg.norm(mat, axis=1)
    out = {}
    for qi in range(len(ids)):
        if ids[qi] >= n_queries:
            continue
        cos = (mat @ mat[qi]) / (norms * norms[qi])
        cos[qi] = -np.inf
        # mirror the query's ordering: (-cos rounded to 6dp, neighbor id)
        order = sorted(range(len(ids)), key=lambda i: (-round(cos[i], 6), ids[i]))[:k]
        out[ids[qi]] = [ids[i] for i in order]
    return out


def test_bruteforce_matches_numpy(spark, sf_dir):
    expected = _numpy_topk(sf_dir)
    got = {}
    for r in QUERIES["s01_topk_bruteforce"](spark, sf_dir).collect():
        got.setdefault(r["query_id"], []).append((r["rk"], r["neighbor_id"]))
    for q, lst in got.items():
        assert [n for _, n in sorted(lst)] == expected[q]


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    exact = QUERIES["s01_topk_bruteforce"](spark, sf_dir).collect()
    approx = sim.s02_topk(spark, sf_dir).filter("query_id >= 0").collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # testdata embeddings are near-random (true-neighbor cos ≈ 0.3), the
    # adversarial case for sign-LSH — 12-table multiprobe measured 0.72
    # at this SF (r4); gate sits one margin below
    assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_norms_positive(spark, sf_dir):
    rows = QUERIES["s03_norm_stats"](spark, sf_dir).collect()
    assert all(r["min_norm"] > 0 for r in rows)


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    exact = QUERIES["s01_topk_bruteforce"](spark, sf_dir).collect()
    approx = sim.s04_topk(spark, sf_dir).filter("query_id >= 0").collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # nprobe=8 of 16 cells; measured 0.86 at this SF (r4) — gate one
    # margin below
    assert recall >= 0.7, f"IVF recall too low: {recall}"


def test_ivf_deterministic(spark, sf_dir):
    a = sorted(map(tuple, sim.s04_topk(spark, sf_dir).filter("query_id >= 0").collect()))
    b = sorted(map(tuple, sim.s04_topk(spark, sf_dir).filter("query_id >= 0").collect()))
    assert a == b


def test_pq_recall_vs_bruteforce(spark, sf_dir):
    exact = QUERIES["s01_topk_bruteforce"](spark, sf_dir).collect()
    approx = sim.s05_topk(spark, sf_dir).filter("query_id >= 0").collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # ADC scans ALL codes (no cell pruning) then exact-re-ranks 10k — on
    # near-random data the quantization error is the only loss source
    assert recall >= 0.5, f"PQ recall too low: {recall}"


def test_pq_deterministic_and_shaped(spark, sf_dir):
    a = sorted(map(tuple, sim.s05_topk(spark, sf_dir).filter("query_id >= 0").collect()))
    b = sorted(map(tuple, sim.s05_topk(spark, sf_dir).filter("query_id >= 0").collect()))
    assert a == b
    per_q = {}
    for q, n, c, rk in a:
        per_q.setdefault(q, []).append(rk)
    assert set(per_q) == set(range(10))
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_recall_gates_at_sf01(spark):
    """Quantitative recall guarantee at the driver's bench scale
    (sf0.1, 5k vectors): measured recall@5 on this corpus is
    s02 = 0.84, s04 = 0.86, s05 = 0.62 (r4: T=12 tables, nprobe=8) (near-random embeddings — the
    adversarial case for every ANN family; COVERAGE.md records the
    values). Gates sit one noise-margin below measured so a parameter
    regression (fewer probes/tables/cells than intended) fails loudly
    while hash-seed jitter does not."""
    import os

    sf_dir = "/root/testdata/sf0.1"
    if not os.path.isdir(sf_dir):
        import pytest as _pytest

        _pytest.skip("sf0.1 testdata not generated")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["s01_topk_bruteforce"](spark, sf_dir).collect()
    }
    gates = {"s02_ann_lsh": 0.8, "s04_ann_ivf": 0.8, "s05_ann_pq": 0.55}
    topk_fns = {
        "s02_ann_lsh": sim.s02_topk,
        "s04_ann_ivf": sim.s04_topk,
        "s05_ann_pq": sim.s05_topk,
    }
    for name, gate in gates.items():
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in topk_fns[name](spark, sf_dir).filter("query_id >= 0").collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= gate, f"{name} recall@5 {recall:.3f} < {gate}"


def test_ann_reports_retrieve_planted_vectors(spark, sf_dir):
    """r11 hash-exact reshape: each registered ANN query emits, per
    planted query (an exact copy of a corpus vector), the brute-force
    expected top-1 and the id its own index actually retrieved — they
    must agree, at cosine 1.0, with the recall floor met. This is the
    same contract the DuckDB oracle enforces via the driver hash."""
    for name in ("s02_ann_lsh", "s04_ann_ivf", "s05_ann_pq"):
        rows = QUERIES[name](spark, sf_dir).collect()
        assert len(rows) == len(sim.PLANT_TARGETS), name
        by_q = {r["query_id"]: r for r in rows}
        for t in sim.PLANT_TARGETS:
            r = by_q[-(t + 1)]
            assert r["expected_id"] == t, (name, t, r)
            assert r["retrieved_id"] == t, (name, t, r)
            assert r["cos_sim"] == 1.0, (name, t, r)
            assert r["recall_ok"] is True, (name, t, r)
