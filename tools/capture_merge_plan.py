"""Capture the physical plan of a MERGE rewrite's internal write job.

merge_into executes its join+rewrite inside the call (the returned
handle is the table, not a frame), so capture_plans.py can't see it.
This tool builds the w08-shaped fixture (orders ingest + churn source,
insert-off MERGE DELETE), intercepts DataFrameWriter.parquet for writes
landing in a merge-* dir, and dumps .explain('formatted') of the frame
being written — the evidence file for the merge join-strategy claims.

Usage: python tools/capture_merge_plan.py <tag> <suffix>
e.g.   python tools/capture_merge_plan.py r12 audit
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.readwriter import DataFrameWriter  # noqa: E402

from icebergplus_spark.lake import LocalLakeCatalog  # noqa: E402
from icebergplus_spark.lake.sql_dml import lake_sql  # noqa: E402
from icebergplus_spark.session import get_spark  # noqa: E402
from icebergplus_spark.sources import load_table  # noqa: E402

CAPTURED: list[tuple[str, str]] = []

_orig_parquet = DataFrameWriter.parquet


def _spy_parquet(self, path, *a, **kw):
    if "/merge-" in path or "/delete-" in path:
        df = self._df
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        CAPTURED.append((os.path.basename(path.rstrip("/")), plan))
    return _orig_parquet(self, path, *a, **kw)


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join("plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("merge-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")

    orders = load_table(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="mergeplan_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.w8_ord", orders.schema)
    years = sorted(
        r["y"]
        for r in orders.select(F.year("o_orderdate").alias("y"))
        .distinct()
        .collect()
    )
    for y in years:
        t.append(orders.filter(F.year("o_orderdate") == y).repartition(2))
    src = cat.create_table(
        "bench.w8_churn", orders.select("o_custkey", "o_orderpriority").schema
    )
    src.append(
        orders.select("o_custkey", "o_orderpriority")
        .filter(F.col("o_custkey") % 7 == 0)
        .dropDuplicates(["o_custkey"])
        .repartition(4)
    )
    DataFrameWriter.parquet = _spy_parquet
    try:
        lake_sql(
            cat,
            "MERGE INTO bench.w8_ord t USING bench.w8_churn s "
            "ON t.o_custkey = s.o_custkey "
            "WHEN MATCHED AND s.o_orderpriority = '1-URGENT' THEN DELETE",
        )
    finally:
        DataFrameWriter.parquet = _orig_parquet
    for i, (_name, plan) in enumerate(CAPTURED):
        fn = f"w08_merge_rewrite_{suffix}.txt" if i == 0 else (
            f"w08_merge_rewrite_{i}_{suffix}.txt"
        )
        path = os.path.join(out_dir, fn)
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
