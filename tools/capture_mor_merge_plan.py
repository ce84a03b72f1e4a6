"""Capture the MoR MERGE's join plan at the localCheckpoint boundary.

The MoR merge materializes `target JOIN src` eagerly via
localCheckpoint, so neither the returned frame nor the rewrite write
shows the join — this tool patches DataFrame.localCheckpoint to dump
.explain('formatted') of the frame being checkpointed while running a
q151-shaped insert-off MERGE on a dv-mode table.

Usage: python tools/capture_mor_merge_plan.py <tag> <suffix>
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402

from icebergplus_spark.lake import LocalLakeCatalog  # noqa: E402
from icebergplus_spark.session import get_spark  # noqa: E402
from icebergplus_spark.sources import load_table  # noqa: E402

CAPTURED: list[str] = []
_orig = DataFrame.localCheckpoint


def _spy(self, *a, **kw):
    plan = self._sc._jvm.PythonSQLUtils.explainString(
        self._jdf.queryExecution(), "formatted"
    )
    if "Join" in plan:
        CAPTURED.append(plan)
    return _orig(self, *a, **kw)


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join("plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("mor-merge-plan")
    spark.sparkContext.setLogLevel("ERROR")

    orders = load_table(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="morplan_")
    cat = LocalLakeCatalog(spark, root).start()
    t = cat.create_table("bench.orders_mor", orders.schema)
    t.set_property("delete.representation", "dv")
    t.append(orders.repartition(2))
    DataFrame.localCheckpoint = _spy
    try:
        t.merge_into(
            orders.filter(F.col("o_orderkey") % 131 == 0),
            on="o_orderkey",
            when_matched_delete=True,
            when_not_matched_insert=False,
        )
    finally:
        DataFrame.localCheckpoint = _orig
    for i, plan in enumerate(CAPTURED):
        fn = (
            f"q151_mor_merge_join_{suffix}.txt"
            if i == 0
            else f"q151_mor_merge_join_{i}_{suffix}.txt"
        )
        path = os.path.join(out_dir, fn)
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
