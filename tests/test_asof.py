"""as-of join unit tests: backward semantics, tie-breaking, inner/left."""

import datetime as dt

from icebergplus_spark.operators.asof import asof_join


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_and_ties(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), "e1"),
         (1, ts("2024-01-01 12:00:00"), "e2"),
         (2, ts("2024-01-01 09:00:00"), "e3")],
        "key long, t timestamp, ev string",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 09:00:00"), 100),
         (1, ts("2024-01-01 11:00:00"), 101),
         (1, ts("2024-01-01 11:00:00"), 102),  # tie on ts → max id wins
         (2, ts("2024-01-01 10:00:00"), 200)],  # after e3 → no match
        "key long, t2 timestamp, rid int",
    )
    out = asof_join(
        left, right, "key", "key", "t", "t2", ["rid"], tiebreak="rid", how="inner"
    )
    got = {r["ev"]: r["rid"] for r in out.collect()}
    assert got == {"e1": 100, "e2": 102}

    out_left = asof_join(
        left, right, "key", "key", "t", "t2", ["rid"], tiebreak="rid", how="left"
    )
    got_left = {r["ev"]: r["rid"] for r in out_left.collect()}
    assert got_left == {"e1": 100, "e2": 102, "e3": None}


def test_asof_equal_timestamp_matches(spark):
    # right row AT the probe instant must match (<= semantics)
    left = spark.createDataFrame([(1, ts("2024-01-01 10:00:00"), "e")], "key long, t timestamp, ev string")
    right = spark.createDataFrame([(1, ts("2024-01-01 10:00:00"), 7)], "key long, t2 timestamp, rid int")
    out = asof_join(left, right, "key", "key", "t", "t2", ["rid"], tiebreak="rid")
    assert out.collect()[0]["rid"] == 7


def test_asof_forward_direction(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), "e1")], "key long, t timestamp, ev string"
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 09:00:00"), 1),
         (1, ts("2024-01-01 10:30:00"), 2),
         (1, ts("2024-01-01 11:00:00"), 3)],
        "key long, t2 timestamp, rid int",
    )
    out = asof_join(
        left, right, "key", "key", "t", "t2", ["rid"],
        tiebreak="rid", direction="forward",
    )
    # earliest right AT-OR-AFTER the probe: 10:30 (rid 2)
    assert out.collect()[0]["rid"] == 2


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), "e1"),
         (2, ts("2024-01-01 10:00:00"), "e2")],
        "key long, t timestamp, ev string",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 09:59:00"), 1),      # 60s before e1 → within
         (2, ts("2024-01-01 08:00:00"), 2)],     # 2h before e2 → beyond
        "key long, t2 timestamp, rid int",
    )
    out = asof_join(
        left, right, "key", "key", "t", "t2", ["rid"],
        tiebreak="rid", how="left", tolerance_seconds=300,
    )
    got = {r["ev"]: r["rid"] for r in out.collect()}
    assert got == {"e1": 1, "e2": None}
