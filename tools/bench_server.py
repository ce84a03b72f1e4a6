"""A/B bench subprocess (r12, VERDICT r11 "Next round" #2).

Launched by ``bench.py --ab <git-ref>`` with argv[1] = the worktree of
the REFERENCE tree (the git ref being compared against). Imports THAT
tree's ``icebergplus_spark`` + ``bench`` modules, builds its own
SparkSession, and then serves a line protocol on stdin/stdout:

    warm <query>   -> run once untimed       -> ABJSON:{"ok":true}
    time <query>   -> run once, report secs  -> ABJSON:{"ok":true,"sec":1.23}
    exit           -> shut down

Every response line is prefixed ``ABJSON:`` so Spark/py4j stdout noise
can never corrupt the protocol. The parent strictly alternates timed
runs between the two trees (current, ref, current, ref ...), so the
two JVMs never compute simultaneously and ambient load hits both
measurements of a pair equally — the per-query ratio is load-immune
in a way eight rounds of quiet-window triage never were.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _say(obj: dict) -> None:
    sys.stdout.write("ABJSON:" + json.dumps(obj) + "\n")
    sys.stdout.flush()


def main() -> None:
    tree = os.path.abspath(sys.argv[1])
    # the ref tree's modules shadow everything else
    sys.path.insert(0, tree)

    import bench as refbench  # the REF tree's bench.py (sys.path[0])

    assert os.path.dirname(os.path.abspath(refbench.__file__)) == tree, (
        f"imported bench from {refbench.__file__}, wanted {tree}"
    )
    from icebergplus_spark import registry
    from icebergplus_spark.session import get_spark

    registry.load_all()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("icebergplus-bench-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    local = getattr(refbench, "LOCAL_QUERIES", {})

    def run(name: str) -> None:
        fn = local.get(name) or registry.QUERIES[name]
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

    _say({"ok": True, "ready": True, "tree": tree})
    for line in sys.stdin:
        parts = line.strip().split(None, 1)
        if not parts:
            continue
        cmd = parts[0]
        if cmd == "exit":
            break
        name = parts[1] if len(parts) > 1 else ""
        try:
            if cmd == "clear":
                spark.catalog.clearCache()
                _say({"ok": True})
            elif cmd == "warm":
                run(name)
                _say({"ok": True})
            elif cmd == "time":
                t0 = time.time()
                run(name)
                _say({"ok": True, "sec": round(time.time() - t0, 4)})
            else:
                _say({"ok": False, "err": f"unknown command {cmd!r}"})
        except Exception as e:  # a query absent in the ref tree, etc.
            _say({"ok": False, "err": f"{type(e).__name__}: {e}"})
    spark.stop()


if __name__ == "__main__":
    main()
