"""Event-stream analytics in batch form: tumbling/sliding windows,
sessionization, as-of enrichment (SURVEY.md §2.B "Streaming" rows —
batch-first; true Structured Streaming lives in
``icebergplus_spark.streaming``).

``F.window`` is the same operator Structured Streaming uses, so these
plans lift to ``readStream`` unchanged (watermark added).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from icebergplus_spark.operators.asof import asof_join
from icebergplus_spark.registry import register
from icebergplus_spark.session import prepare_session
from icebergplus_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q40 — tumbling 1-hour window aggregation
# ---------------------------------------------------------------------------
@register(
    "q40_tumbling_window",
    oracle="""
SELECT DATE_TRUNC('hour', ts)                    AS wstart,
       DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR  AS wend,
       event_type,
       COUNT(*)                                  AS n_events,
       ROUND(SUM(value), 2)                      AS sum_value
FROM events
GROUP BY 1, 2, 3
""",
)
def q40_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# q41 — sliding window (1 hour long, every 30 minutes)
# Each event lands in exactly 2 windows; the oracle expands them by hand.
# ---------------------------------------------------------------------------
@register(
    "q41_sliding_window",
    oracle="""
WITH base AS (
  SELECT CASE WHEN EXTRACT(minute FROM ts) >= 30
              THEN DATE_TRUNC('hour', ts) + INTERVAL 30 MINUTE
              ELSE DATE_TRUNC('hour', ts) END AS b,
         value
  FROM events
),
expanded AS (
  SELECT b AS wstart, value FROM base
  UNION ALL
  SELECT b - INTERVAL 30 MINUTE AS wstart, value FROM base
)
SELECT wstart,
       wstart + INTERVAL 1 HOUR AS wend,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM expanded
GROUP BY wstart
""",
)
def q41_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# q42 — sessionization (gaps-and-islands, 30-minute inactivity gap)
# Batch equivalent of session_window; one shuffle on user_id.
# ---------------------------------------------------------------------------
@register(
    "q42_sessionize",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS INTEGER) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       ROUND(SUM(value), 2) AS session_value
FROM sessions
GROUP BY user_id, session_id
""",
)
def q42_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, 0
    )
    gap_sec = F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")
    flagged = ev.select(
        "user_id",
        "ts",
        "value",
        F.when(F.lag("ts").over(w).isNull() | (gap_sec > 1800.0), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(wrun).cast("int")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


# ---------------------------------------------------------------------------
# q43 — as-of join: each event enriched with the user's latest order
# at-or-before the event time (custom operator, union-sort strategy).
# ---------------------------------------------------------------------------
@register(
    "q43_asof_join",
    oracle="""
SELECT event_id, user_id, ts, o_orderkey, o_orderdate
FROM (
  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
         ROW_NUMBER() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
         ) AS rn
  FROM events e
  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
) t
WHERE rn = 1
""",
)
def q43_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = _t(spark, sf_dir, "orders")
    return asof_join(
        ev,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate"],
        tiebreak="o_orderkey",
        how="inner",
    ).select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate")


# ---------------------------------------------------------------------------
# q72 — funnel analysis: users who view → click → purchase in order,
# each step within 24h of the previous (sequential pattern over streams)
# ---------------------------------------------------------------------------
@register(
    "q72_funnel",
    oracle="""
WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
     c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
     p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
     funnel AS (
       SELECT DISTINCT v.user_id
       FROM v
       JOIN c ON c.user_id = v.user_id
              AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 24 HOUR
       JOIN p ON p.user_id = v.user_id
              AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 24 HOUR
     )
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       CAST((SELECT COUNT(DISTINCT user_id) FROM v) AS BIGINT) AS n_viewers
FROM funnel
""",
)
def q72_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("vts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    day = F.expr("INTERVAL 24 HOURS")
    converted = (
        v.join(
            c,
            (F.col("cu") == F.col("vu"))
            & (F.col("cts") > F.col("vts"))
            & (F.col("cts") <= F.col("vts") + day),
        )
        .join(
            p,
            (F.col("pu") == F.col("vu"))
            & (F.col("pts") > F.col("cts"))
            & (F.col("pts") <= F.col("cts") + day),
        )
        .select(F.col("vu").alias("user_id"))
        .distinct()
    )
    n_viewers = v.select(F.col("vu")).distinct().count()
    return converted.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.lit(n_viewers).cast("long").alias("n_viewers"),
    )


# ---------------------------------------------------------------------------
# q135 — GAP-FILL + LOCF interpolation (timescale-style
# time_bucket_gapfill): regularize each user's event history onto a
# dense daily grid between their first and last active day — absent
# days materialize with 0 events — and carry the last observed daily
# value forward across the gaps. The grid comes from a per-user
# sequence() explode (rows ∝ Σ user spans — never a calendar × users
# cross join), and LOCF is the shared-syntax two-window trick (running
# COUNT of non-nulls forms carry groups; MAX within group propagates
# the value) instead of IGNORE NULLS, whose spelling differs between
# engines. Scale: one groupBy, one explode-join, two windows — all
# partitioned by user_id, no global window, no Python.
# ---------------------------------------------------------------------------
@register(
    "q135_gap_fill_locf",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         COUNT(*) AS n_events,
         ROUND(SUM(value), 2) AS day_value
  FROM events GROUP BY 1, 2
),
spans AS (
  SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM daily GROUP BY 1
),
grid AS (
  SELECT user_id,
         CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
  FROM spans
),
joined AS (
  SELECT g.user_id, g.day,
         COALESCE(d.n_events, 0) AS n_events,
         d.day_value
  FROM grid g
  LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
),
grouped AS (
  SELECT user_id, day, n_events, day_value,
         COUNT(day_value) OVER (
           PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS carry_grp
  FROM joined
)
SELECT user_id,
       CAST(day AS TIMESTAMP) AS day,
       CAST(n_events AS BIGINT) AS n_events,
       MAX(day_value) OVER (PARTITION BY user_id, carry_grp)
         AS filled_value
FROM grouped
""",
)
def q135_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("day_value"),
    )
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 day"))
        ).alias("day"),
    )
    joined = grid.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        "day_value",
    )
    carry_w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grouped = joined.withColumn(
        "carry_grp", F.count("day_value").over(carry_w)
    )
    return grouped.select(
        "user_id",
        F.col("day").cast("timestamp").alias("day"),
        "n_events",
        F.max("day_value")
        .over(Window.partitionBy("user_id", "carry_grp"))
        .alias("filled_value"),
    )


# ---------------------------------------------------------------------------
# q136 — ordered-event FUNNEL (view → click → purchase): per user, the
# canonical strictly-ordered conversion ladder — the first view, the
# first click AFTER that view, the first purchase AFTER that click —
# then one corpus-level summary row per funnel depth. ONE user-keyed
# window pass computes every step: a running conditional MIN carries
# "first view so far" onto each event, a second running MIN carries
# "first qualifying click so far", and the per-user groupBy lands on
# the SAME partitioning (no second exchange). Strict `<` comparisons
# make tie timestamps behave identically to the oracle's `ts > t1`
# regardless of intra-tie window order. The naive form is three
# join-back rounds (8 exchanges); this is one shuffle + one reused
# partitioning — the difference between one clickstream pass and four
# at 100 TB.
# ---------------------------------------------------------------------------
@register(
    "q136_event_funnel",
    oracle="""
WITH step1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
step2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN step1 s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND e.ts > s.t1
  GROUP BY e.user_id
),
step3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN step2 s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s.t2
  GROUP BY e.user_id
)
SELECT 1 AS step, 'view' AS event_type, COUNT(*) AS n_users FROM step1
UNION ALL
SELECT 2, 'click', COUNT(*) FROM step2
UNION ALL
SELECT 3, 'purchase', COUNT(*) FROM step3
""",
)
def q136_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    ev = load_table(spark, sf_dir, "events")
    return event_funnel(ev, ["view", "click", "purchase"])


def event_funnel(ev: DataFrame, steps: list[str]) -> DataFrame:
    """N-STEP ordered funnel generator (r4 verdict: q136 hardcoded
    three steps). For each step i, a running conditional MIN over ONE
    user-keyed window carries "first qualifying step-i event so far"
    onto every event — step i qualifies only strictly AFTER the user's
    carried step-(i-1) time. The per-user groupBy lands on the SAME
    partitioning, so the plan is one shuffle + one reused partitioning
    for ANY depth (the naive form is N join-back rounds). Strict `<`
    comparisons make tie timestamps behave identically to the oracle's
    chained `ts > t_prev` CTEs regardless of intra-tie window order.
    Returns one summary row per depth: (step, event_type, n_users)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = ev.select("user_id", "ts", "event_id", "event_type")
    conds = []
    for i, ev_type in enumerate(steps):
        if i == 0:
            cond = F.when(F.col("event_type") == ev_type, F.col("ts"))
        else:
            cond = F.when(
                (F.col("event_type") == ev_type)
                & (F.col(f"_carry_{i - 1}") < F.col("ts")),
                F.col("ts"),
            )
        conds.append(cond)
        if i < len(steps) - 1:  # last step needs no carried column
            staged = staged.withColumn(f"_carry_{i}", F.min(cond).over(w))
    per_user = staged.groupBy("user_id").agg(
        *[F.min(c).alias(f"t{i + 1}") for i, c in enumerate(conds)]
    )
    counts = per_user.agg(
        *[F.count(f"t{i + 1}").alias(f"n{i + 1}") for i in range(len(steps))]
    )
    stack_args = ", ".join(
        f"{i + 1}, '{s}', n{i + 1}" for i, s in enumerate(steps)
    )
    return counts.selectExpr(
        f"stack({len(steps)}, {stack_args}) AS (step, event_type, n_users)"
    ).select(
        "step", "event_type", F.col("n_users").cast("long").alias("n_users")
    )


# ---------------------------------------------------------------------------
# q137 — COHORT RETENTION: users are cohorted by the WEEK of their
# first event; each (cohort week, weeks-since) cell counts the cohort
# members active that many weeks later. Two shuffles total (first-seen
# per user, then cohort-cell distinct count) — the standard retention
# matrix at clickstream scale. Weeks are epoch-based (floor of
# epoch-days / 7) so both engines bucket identically with no
# locale/week-start dependence.
# ---------------------------------------------------------------------------
@register(
    "q137_cohort_retention",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         CAST(FLOOR(EPOCH(CAST(MIN(ts) AS TIMESTAMP)) / 604800) AS BIGINT)
           AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(FLOOR(EPOCH(CAST(e.ts AS TIMESTAMP)) / 604800) AS BIGINT)
           - f.cohort_week AS weeks_since
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT cohort_week, weeks_since,
       COUNT(*) AS n_active
FROM activity
GROUP BY cohort_week, weeks_since
""",
)
def q137_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    ev = load_table(spark, sf_dir, "events")
    week = (F.unix_timestamp("ts") / 604800).cast("bigint")
    firsts = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .select(
            "user_id",
            (F.unix_timestamp("first_ts") / 604800)
            .cast("bigint")
            .alias("cohort_week"),
        )
    )
    activity = (
        ev.select("user_id", week.alias("w"))
        .join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.col("w") - F.col("cohort_week")).alias("weeks_since"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "weeks_since").agg(
        F.count(F.lit(1)).alias("n_active")
    )


# ---------------------------------------------------------------------------
# q139 — SEQUENCE-MOTIF counting (MATCH_RECOGNIZE-lite): each user's
# event history becomes an ordered symbol string (one char per event,
# (ts, event_id)-ordered) and adjacent behavioral motifs — view→click
# and click→purchase transitions — are counted per user by literal
# pattern matching over the string. One groupBy builds the per-user
# sequence (collect_list + sort_array keeps ordering deterministic
# regardless of shuffle arrival; string length = the user's event
# count, so per-group state is bounded by user activity, the same
# bound every sessionizer carries). The oracle builds the identical
# string with string_agg(ORDER BY) — identical REPLACE semantics make
# the motif counts engine-exact.
# ---------------------------------------------------------------------------
@register(
    "q139_sequence_motifs",
    oracle="""
WITH seqs AS (
  SELECT user_id,
         string_agg(CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                    WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                    ELSE 'e' END, '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(LENGTH(seq) AS BIGINT) AS n_events,
       CAST((LENGTH(seq) - LENGTH(REPLACE(seq, 'vc', ''))) / 2 AS BIGINT)
         AS view_click,
       CAST((LENGTH(seq) - LENGTH(REPLACE(seq, 'cp', ''))) / 2 AS BIGINT)
         AS click_purchase
FROM seqs
""",
)
def q139_sequence_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    ev = load_table(spark, sf_dir, "events")
    ch = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("e")
    )
    seqs = (
        ev.select("user_id", F.struct("ts", "event_id", ch.alias("ch")).alias("e"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("e")), lambda x: x["ch"]
                ),
                "",
            ).alias("seq")
        )
    )

    def motif(pat: str):
        return (
            (F.length("seq") - F.length(F.replace(F.col("seq"), F.lit(pat), F.lit(""))))
            / 2
        ).cast("bigint")

    return seqs.select(
        "user_id",
        F.length("seq").cast("bigint").alias("n_events"),
        motif("vc").alias("view_click"),
        motif("cp").alias("click_purchase"),
    )


# ---------------------------------------------------------------------------
# q144 — QUANTIFIED pattern matching (MATCH_RECOGNIZE + / * /
# alternation; r4 verdict gap: q139 covers adjacency motifs only).
# The per-user symbol string (q139's construction) is matched with
# real regex quantifiers:
#   v+c+p      — funnel with one-or-MORE views then clicks (PATTERN
#                (V+ C+ P) in MATCH_RECOGNIZE terms),
#   s[vc]*p    — signup, ANY number of views/clicks (Kleene star over
#                an alternation), then purchase,
#   v+         — longest consecutive view run (greedy + measures the
#                match length, MEASURES COUNT(V.*) analogue).
# Both engines use leftmost non-overlapping greedy matching (Java
# regex / RE2 agree on these patterns — no backtracking ambiguity), so
# counts and lengths are engine-exact. Plan shape is q139's: ONE
# shuffle to assemble per-user strings, then per-row regex — state
# bounded by user activity, no joins, no window over the full table.
# ---------------------------------------------------------------------------
@register(
    "q144_quantified_patterns",
    oracle="""
WITH seqs AS (
  SELECT user_id,
         string_agg(CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                    WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                    ELSE 'e' END, '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(LENGTH(seq) AS BIGINT) AS n_events,
       CAST(LEN(regexp_extract_all(seq, 'v+c+p')) AS BIGINT) AS n_funnels,
       CAST(LEN(regexp_extract_all(seq, 's[vc]*p')) AS BIGINT)
         AS n_signup_paths,
       CAST(COALESCE(list_max(list_transform(
              regexp_extract_all(seq, 'v+'), x -> LENGTH(x))), 0) AS BIGINT)
         AS longest_view_run
FROM seqs
""",
)
def q144_quantified_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    ev = load_table(spark, sf_dir, "events")
    ch = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("e")
    )
    seqs = (
        ev.select("user_id", F.struct("ts", "event_id", ch.alias("ch")).alias("e"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("e")), lambda x: x["ch"]
                ),
                "",
            ).alias("seq")
        )
    )
    return seqs.select(
        "user_id",
        F.length("seq").cast("bigint").alias("n_events"),
        F.regexp_count("seq", F.lit("v+c+p")).cast("bigint").alias("n_funnels"),
        F.regexp_count("seq", F.lit("s[vc]*p"))
        .cast("bigint")
        .alias("n_signup_paths"),
        F.coalesce(
            F.array_max(
                F.transform(
                    F.regexp_extract_all("seq", F.lit("v+"), 0),
                    lambda x: F.length(x),
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("longest_view_run"),
    )


# ---------------------------------------------------------------------------
# q145 — FOUR-step funnel through the parametrized generator
# (signup → view → click → purchase): proves event_funnel's single
# window pass generalizes past the hardcoded depth — the oracle is the
# naive 4-CTE chain, the Spark side is STILL one shuffle + one reused
# partitioning (tests/test_plan_quality.py asserts the exchange count
# does not grow with depth).
# ---------------------------------------------------------------------------
@register(
    "q145_event_funnel_4step",
    oracle="""
WITH step1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
step2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN step1 s ON e.user_id = s.user_id
  WHERE e.event_type = 'view' AND e.ts > s.t1
  GROUP BY e.user_id
),
step3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN step2 s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND e.ts > s.t2
  GROUP BY e.user_id
),
step4 AS (
  SELECT e.user_id, MIN(e.ts) AS t4
  FROM events e JOIN step3 s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s.t3
  GROUP BY e.user_id
)
SELECT 1 AS step, 'signup' AS event_type, COUNT(*) AS n_users FROM step1
UNION ALL
SELECT 2, 'view', COUNT(*) FROM step2
UNION ALL
SELECT 3, 'click', COUNT(*) FROM step3
UNION ALL
SELECT 4, 'purchase', COUNT(*) FROM step4
""",
)
def q145_event_funnel_4step(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    ev = load_table(spark, sf_dir, "events")
    return event_funnel(ev, ["signup", "view", "click", "purchase"])
