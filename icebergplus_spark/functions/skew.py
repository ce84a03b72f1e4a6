"""Skew-aware join helper: key salting (SURVEY.md §2.B scale notes;
"skewed keys → salting or AQE skew-join").

AQE's skew-join splitting handles most cases at runtime; explicit
salting is for the pathological hot key (one user with 10% of a 100 TB
fact table) where even a split partition floods its reducer. The salted
join replicates the build side ``salt_n`` ways and scatters the probe
side uniformly, bounding any single reducer at ~1/salt_n of the hot key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salt spreading: probe rows get a random-ish salt
    (deterministic hash of the full row id via monotonically increasing
    id is NOT reproducible, so we hash the probe key + a per-row uniform
    component from ``rand`` seeded for determinism); build rows are
    replicated across all salts.

    Use when one probe-side key dominates; costs salt_n× replication of
    the build side — keep the build side the smaller input.
    """
    salt = (F.abs(F.hash(F.col(probe_key), F.monotonically_increasing_id())) % salt_n)
    p = probe.withColumn("__salt", salt)
    b = build.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    out = p.join(
        b,
        (F.col(probe_key) == F.col(build_key)) & (p["__salt"] == b["__salt"]),
        how,
    )
    return out.drop("__salt")


# ---------------------------------------------------------------------------
# Stats-driven join planning: turn a table's persisted ANALYZE result
# into a join-side strategy, the decision a CBO makes from NDV +
# heavy-hitter statistics. AQE re-plans at runtime from observed sizes;
# this advisor plans BEFORE launch from persisted stats — the layer
# that decides whether to even attempt a broadcast, and whether the
# pathological hot key needs explicit salting that AQE's split-by-size
# cannot fully fix (every split of the hot key still joins the same
# build rows).
# ---------------------------------------------------------------------------
BROADCAST_BYTES_DEFAULT = 100 << 20  # align with a typical AQE threshold
SKEW_FACTOR_DEFAULT = 8.0  # top key > 8× the mean key load → salt


def advise_join(
    table,
    key: str,
    broadcast_bytes: int = BROADCAST_BYTES_DEFAULT,
    skew_factor: float = SKEW_FACTOR_DEFAULT,
) -> dict:
    """Recommend a strategy for joining ``table`` (a LakeTable) on
    ``key``: ``{"strategy": "broadcast" | "shuffle" | "salted",
    "salt_n": int | None, "reason": str}``.

    - broadcast: the whole table fits under ``broadcast_bytes`` (from
      snapshot metadata — exact, free).
    - salted: fresh heavy-hitter stats (``analyze(top_k=...)``) show the
      top key holds more than ``skew_factor``× the mean per-key rows;
      ``salt_n`` is sized so the hot key's reducer share drops to ~the
      mean key load.
    - shuffle: everything else — the hash join AQE will manage.
    """
    snap = table.snapshot()
    total_rows = snap["summary"].get("total-records", 0) if snap else 0
    total_bytes = snap["summary"].get("total-files-size", 0) if snap else 0
    if total_bytes <= broadcast_bytes:
        return {
            "strategy": "broadcast",
            "salt_n": None,
            "reason": f"table is {total_bytes}B <= {broadcast_bytes}B",
        }

    stats = table.statistics
    col = (stats or {}).get("columns", {}).get(key)
    if table.statistics_fresh and col and col.get("top") and col["ndv"] > 0:
        mean_per_key = max(total_rows / col["ndv"], 1.0)
        hot = col["top"][0]["count"]
        if hot > skew_factor * mean_per_key:
            # size the salt so hot/salt_n ≈ mean key load, capped sanely
            salt_n = min(int(hot / mean_per_key), 256)
            return {
                "strategy": "salted",
                "salt_n": max(salt_n, 2),
                "reason": (
                    f"hot key {col['top'][0]['value']!r} has {hot} rows, "
                    f"{hot / mean_per_key:.0f}x the mean per-key load"
                ),
            }
    return {
        "strategy": "shuffle",
        "salt_n": None,
        "reason": "no broadcast fit, no fresh heavy-hitter evidence of skew",
    }
