"""Physical-plan quality gates — the 100 TB design checks (prompt:
"after each operator works, explain the plan and iterate").

These assert the *shape* of the plan Catalyst produces, not its output:
- dimension joins broadcast (no shuffle of the fact side against dims)
- filters reach the parquet scan (PushedFilters)
- scans prune columns (ReadSchema ⊆ needed columns)
- no cartesian product outside the intentional cross/brute-force queries
- whole-stage codegen present in the hot path
"""

import pytest

from icebergplus_spark.registry import QUERIES, load_all

load_all()


def plan_of(spark, sf_dir, name: str) -> str:
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_dim_joins_are_broadcast(spark, sf_dir):
    # Queries whose joins touch true dimensions (nation/region/supplier/
    # part) must ride a broadcast. Fact-fact joins (orders/customer vs
    # lineitem) are exempt — they must NOT be hinted (see
    # test_no_fact_scale_broadcast_hints); AQE may still broadcast them
    # at small SF, which is fine.
    for q in ("q05_local_supplier_volume", "q07_brand_volume"):
        plan = plan_of(spark, sf_dir, q)
        assert "BroadcastHashJoin" in plan, f"{q}: dimension join not broadcast"
        assert "CartesianProduct" not in plan, f"{q}: cartesian product leaked"


FACT_SCALE_NAMES = (
    # frames that grow linearly with SF — broadcasting any of these is a
    # guaranteed OOM at the 100 TB design point (SCALING.md: fact-fact
    # joins must shuffle). `orders` ≈ ¼ of lineitem; `customer` is ~1.5%
    # of it but still linear. Derived per-customer/per-order aggregates
    # count too.
    "orders",
    "cust",
    "customer",
    "li",
    "lineitem",
    "docs",
    "events",
    "emb",
    "per_cust_max",
)


def test_no_fact_scale_broadcast_hints():
    """Inverse gate: no source file may put an explicit F.broadcast()
    hint on an SF-scaling table. An explicit hint overrides AQE's size
    threshold, so it cannot degrade gracefully at scale. (d08's
    all-pairs exact baseline is the documented exemption: its broadcast
    of the aliased embeddings side is what keeps the intentional O(n²)
    theta join a BNLJ instead of a shuffled cartesian.)"""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parents[1] / "icebergplus_spark"
    pat = re.compile(
        r"F\.broadcast\(\s*(%s)\s*[),]" % "|".join(FACT_SCALE_NAMES)
    )
    hits = []
    for p in sorted(root.rglob("*.py")):
        for i, line in enumerate(p.read_text().splitlines(), 1):
            if pat.search(line):
                hits.append(f"{p.relative_to(root)}:{i}: {line.strip()}")
    assert not hits, (
        "explicit broadcast of SF-scaling tables (OOM at design scale):\n"
        + "\n".join(hits)
    )


def test_filters_pushed_to_scan(spark, sf_dir):
    df = QUERIES["q06_forecast_revenue"](spark, sf_dir)
    plan = formatted(df)
    assert "PushedFilters: [" in plan
    # range predicates on l_shipdate/l_discount/l_quantity must reach parquet
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_column_pruning(spark, sf_dir):
    df = QUERIES["q06_forecast_revenue"](spark, sf_dir)
    plan = formatted(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # q06 needs exactly 4 lineitem columns; the 11-column table must not
    # be fully read
    assert "l_orderkey" not in read_schema
    assert "l_returnflag" not in read_schema
    for needed in ("l_extendedprice", "l_discount", "l_quantity", "l_shipdate"):
        assert needed in read_schema


def test_no_unintended_cartesian(spark, sf_dir):
    # every oracle-checked query except the intentional cross joins.
    # Building ~200 plans is mostly driver/py4j latency plus small
    # setup jobs — a thread pool overlaps them (guide §2.6); Spark's
    # scheduler handles concurrent jobs from one session natively.
    from concurrent.futures import ThreadPoolExecutor

    intentional = {"q46_cross_join", "s01_topk_bruteforce"}
    # Python-DataSource registration (spark.dataSource.register) is not
    # thread-safe against concurrent lookups — keep those few serial.
    serial_only = {
        "q104_lake_batch_source",
        "q105_lake_batch_writer",
        "q82_python_datasource",
    }
    names = [
        n
        for n in sorted(QUERIES)
        if n not in intentional and not n.startswith(("d0", "s0", "m0", "q49"))
    ]

    def check(name):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, f"{name}: unexpected cartesian product"

    with ThreadPoolExecutor(max_workers=6) as pool:
        for _ in pool.map(check, [n for n in names if n not in serial_only]):
            pass
    for n in names:
        if n in serial_only:
            check(n)


def test_whole_stage_codegen_in_hot_path(spark, sf_dir):
    df = QUERIES["q01_pricing_summary"](spark, sf_dir)
    df.collect()  # AQE finalizes the plan only on execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    # codegen stages render as "*(N) Operator" in the plan string
    assert "*(" in plan
    assert "AQEShuffleRead coalesced" in plan  # AQE right-sizing active


def test_aggregates_are_partial_final(spark, sf_dir):
    # hash aggregation must be two-phase (map-side combine before shuffle)
    plan = plan_of(spark, sf_dir, "q01_pricing_summary")
    assert plan.count("HashAggregate") >= 2


@pytest.mark.parametrize("name", ["d04_minhash_lsh", "d05_simhash", "s02_ann_lsh"])
def test_extension_ops_avoid_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, f"{name}: LSH must bucket, not cross-join"


def test_star_join_shuffle_budget(spark, sf_dir):
    """Dimension joins must not add shuffles — dims ride broadcasts.
    Fact-fact joins (lineitem⋈orders⋈customer) are ALLOWED their
    shuffles: at scale they must shuffle, so the gate is a budget
    (fact-join exchanges + the final agg), not a broadcast mandate.
    At test SF the static planner usually broadcasts the facts too and
    the counts come in under budget; the budget is what survives a
    100× scale-up."""
    from icebergplus_spark.plans import audit

    for name, max_shuffles in [
        # budget = one exchange per fact-fact join side + final agg
        ("q05_local_supplier_volume", 5),
        ("q03_shipping_priority", 5),
        ("q07_brand_volume", 1),  # li⋈part only: part broadcast, 1 agg shuffle
        ("q62_returned_items", 5),
    ]:
        a = audit(QUERIES[name](spark, sf_dir))
        assert a.n_shuffles <= max_shuffles, (
            f"{name}: {a.n_shuffles} shuffles (expected <= {max_shuffles})"
        )
        assert not a.has_cartesian, f"{name}: cartesian product"
    # the dim-heavy stars must still carry at least one broadcast
    for name in ("q05_local_supplier_volume", "q07_brand_volume", "q62_returned_items"):
        a = audit(QUERIES[name](spark, sf_dir))
        assert a.n_broadcasts >= 1, f"{name}: no broadcast in plan"


def test_scan_only_queries_have_no_shuffle(spark, sf_dir):
    from icebergplus_spark.plans import audit

    for name in ("q02_filter_project", "q13_sort_limit", "m01_multimodal_meta"):
        a = audit(QUERIES[name](spark, sf_dir))
        assert a.n_shuffles == 0, f"{name}: unexpected shuffle"


def test_round2_ops_plan_shapes(spark, sf_dir):
    # decontamination: eval gram set must be the broadcast side
    plan = plan_of(spark, sf_dir, "t20_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # IVF-flat search: probe set broadcast, no sort-merge join anywhere
    plan = plan_of(spark, sf_dir, "s06_ivf_flat")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # portable MinHash twin keeps the LSH discipline: bucket join, no
    # cartesian, shingle sets fetched by id-equi joins only
    plan = plan_of(spark, sf_dir, "d12_minhash_portable")
    assert "CartesianProduct" not in plan


def test_d14_semantic_dedup_is_bucketed(spark, sf_dir):
    """SemDeDup-style prune must join on the LSH bucket key — an
    equi-join whose quadratic term is per-bucket — never a corpus-wide
    cartesian/BNLJ (that's d08, the documented all-pairs baseline)."""
    plan = plan_of(spark, sf_dir, "d14_semantic_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_m03_frame_sampling_stays_arrow(spark, sf_dir):
    """The expanding frame sampler must run as ONE Arrow-batched python
    stage (mapInPandas), not a row-at-a-time PythonUDF chain."""
    plan = plan_of(spark, sf_dir, "m03_frame_sampling")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_runtime_bloom_filter_join_available(spark, sf_dir):
    """Runtime bloom-filter semijoin pushdown (Spark's third runtime
    filter next to DPP and AQE): a selective filter on one join side
    injects a bloom_filter_agg probe into the other side's scan, culling
    fact rows BEFORE the shuffle. The trigger thresholds are sized for
    clusters (application side >= 10 GB), so at test SF we lower them to
    prove the engine config leaves the optimization armed — at 100 TB it
    engages on its own."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        assert (
            spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
            == "true"
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderstatus")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, "runtime bloom filter not injected"
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_funnel_exchange_count_constant_in_depth(spark, sf_dir):
    """event_funnel's contract (r5): ANY funnel depth costs one shuffle
    + one reused partitioning — the exchange count must NOT grow from
    the 3-step to the 4-step funnel (the naive join-back plan grows by
    ~2 exchanges per added step)."""
    p3 = plan_of(spark, sf_dir, "q136_event_funnel")
    p4 = plan_of(spark, sf_dir, "q145_event_funnel_4step")
    assert p3.count("Exchange") == p4.count("Exchange") == 2
    assert "Join" not in p4  # no join-back rounds at any depth
