"""Per-phase profiler for the bench's w-headlines (guide §1: isolate
the expensive query before changing anything).

Wraps LakeTable.append / delete_where / compact / lake_sql /
create_table with wall-clock timers, runs each w-headline once (after
one warm-up), and prints a per-call breakdown so optimization work
attributes to a phase, not an 8-commit bundle.

Usage: python tools/profile_phases.py [w01 w06 ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from icebergplus_spark.session import get_spark  # noqa: E402

CALLS: list[tuple[str, float]] = []


def _wrap(obj, name: str, label: str | None = None):
    orig = getattr(obj, name)

    def timed(*a, **kw):
        t0 = time.time()
        try:
            return orig(*a, **kw)
        finally:
            arg = ""
            if name == "lake_sql" and len(a) > 1:
                arg = " " + " ".join(str(a[1]).split())[:72]
            elif a and hasattr(a[0], "identifier"):
                arg = f" {getattr(a[0], 'identifier', '')}"
            CALLS.append(((label or name) + arg, time.time() - t0))

    setattr(obj, name, timed)
    return orig


def main() -> None:
    want = sys.argv[1:] or ["w01", "w02", "w03", "w04", "w05", "w06", "w07", "w08"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("phase-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    from icebergplus_spark.lake import table as tmod
    from icebergplus_spark.lake import sql_dml as smod
    from icebergplus_spark.lake import catalog as cmod
    from icebergplus_spark.lake import maintenance as mmod

    _wrap(tmod.LakeTable, "append")
    _wrap(tmod.LakeTable, "delete_where")
    _wrap(tmod.LakeTable, "merge_into")
    _wrap(cmod.LocalLakeCatalog, "create_table")
    for mod in (bench, smod):
        if hasattr(mod, "lake_sql"):
            _wrap(mod, "lake_sql")
    _wrap(mmod, "compact")
    # bench functions import lake_sql/compact by name at call time inside
    # the function body (import inside def) — those bind from the module,
    # so the smod/mmod wrap covers them.

    for short in want:
        fn = next(
            (f for n, f in bench.LOCAL_QUERIES.items() if n.startswith(short)),
            None,
        )
        if fn is None:
            print(f"## {short}: not a LOCAL_QUERIES headline, skipping")
            continue
        # one warm-up (untimed), then the profiled run
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        CALLS.clear()
        t0 = time.time()
        df = fn(spark, sf_dir)
        t_build = time.time() - t0
        t1 = time.time()
        df.write.mode("overwrite").format("noop").save()
        t_action = time.time() - t1
        total = t_build + t_action
        print(f"\n## {short}: total {total:.3f}s (build {t_build:.3f} + action {t_action:.3f})")
        accounted = 0.0
        for label, sec in CALLS:
            print(f"  {sec:7.3f}s  {label}")
            accounted += sec
        print(f"  {total - accounted:7.3f}s  <other (load/driver/misc)>")


if __name__ == "__main__":
    main()
