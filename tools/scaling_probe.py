"""Opt-in scaling probe (VERDICT r12 #6): sf0.1 is overhead-bound, so
8-vs-32-core ratios there say nothing about parallel scaling. This tool
synthesizes a ~20x dataset (deterministic row replication with
perturbed keys — no randomness, so reruns are identical), then times
the heaviest data-bound headline queries at two core counts in SEPARATE
processes (master local[N] comes from SPARK_GRAFT_CPUS, same as
bench.py) and prints the low/high-core ratio per query.

Usage:
    python tools/scaling_probe.py            # orchestrator: builds data,
                                             # runs both core counts
    python tools/scaling_probe.py --worker <dir> <out.json>   # internal

NOT part of bench.py — the driver's bench contract is unchanged. Run it
manually; commit the resulting table to plans/r13/scaling_probe.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FACTOR = int(os.environ.get("SCALING_PROBE_FACTOR", "20"))
QUERIES = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q40_tumbling_window",
    "q42_sessionize",
    "q65_large_orders",
]
# tables the probe queries touch and how to scale them; everything else
# is hard-linked from the base sf dir unchanged
SCALED = {
    "lineitem": ("l_orderkey", None),
    "orders": ("o_orderkey", None),
    "events": ("event_id", "ts"),
}


def build(base: str, out_dir: str) -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from icebergplus_spark.session import get_spark

    spark = get_spark("scaling-probe-gen")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    for fn in sorted(os.listdir(base)):
        if not fn.endswith(".parquet"):
            continue
        name = fn[: -len(".parquet")]
        src, dst = os.path.join(base, fn), os.path.join(out_dir, fn)
        if os.path.exists(dst):
            continue
        if name not in SCALED:
            if os.path.isdir(src):
                os.makedirs(dst, exist_ok=True)
                for f in os.listdir(src):
                    os.link(os.path.join(src, f), os.path.join(dst, f))
            else:
                os.link(src, dst)
            continue
        key, ts = SCALED[name]
        df = spark.read.parquet(src)
        rep = df.withColumn(
            "__copy", F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1)))
        )
        # key perturbation keeps join/group cardinalities scaling with
        # the data instead of multiplying duplicates per key
        rep = rep.withColumn(
            key, F.col(key) + F.col("__copy").cast("long") * 1_000_000_000
        )
        if ts:
            if "timestamp" in rep.schema[ts].dataType.simpleString():
                rep = rep.withColumn(
                    ts,
                    F.expr(f"{ts} + make_interval(0, 0, 0, 0, 0, 0, __copy)"),
                )
            else:  # nanos-as-long raw events
                rep = rep.withColumn(
                    ts, F.col(ts) + F.col("__copy").cast("long")
                )
        rep.drop("__copy").repartition(32).write.mode("overwrite").parquet(dst)
        print(f"scaled {name} x{FACTOR}", flush=True)
    spark.stop()


def worker(sf_dir: str, out_path: str) -> None:
    from icebergplus_spark import registry
    from icebergplus_spark.session import get_spark

    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    out = {}
    for name in QUERIES:
        fn = registry.QUERIES[name]
        times = []
        for run in range(3):  # 1 warmup + 2 timed
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if run:
                times.append(dt)
        out[name] = round(min(times), 3)
        print(f"{name}: {times}", flush=True)
    with open(out_path, "w") as f:
        json.dump({"cpus": os.environ.get("SPARK_GRAFT_CPUS"), "sec": out}, f)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], sys.argv[3])
        return
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get("SCALING_PROBE_DIR", "/tmp/scaling_probe_sf2")
    build(base, out_dir)
    results = {}
    for cpus in ("8", "32"):
        out = f"/tmp/scaling_probe_c{cpus}.json"
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", out_dir, out],
            check=True,
            env=env,
        )
        with open(out) as f:
            results[cpus] = json.load(f)["sec"]
    print("\n| query | 8 cores s | 32 cores s | ratio (8/32) |")
    print("|---|---|---|---|")
    for q in QUERIES:
        lo, hi = results["8"][q], results["32"][q]
        print(f"| {q} | {lo:.3f} | {hi:.3f} | {lo / hi:.2f} |")


if __name__ == "__main__":
    main()
