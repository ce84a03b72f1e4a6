"""Commit/scan observability with the reference's metric surface.

The reference bridges Iceberg ``ScanReport``/``CommitReport`` into
Micrometer (MicrometerMetricsReporter.java:51-72), publishing counters
named ``<prefix>commitReport.<field>`` / ``<prefix>scanReport.<field>``
tagged with ``tableName`` (MicrometerMetricsReporter.java:78-84). Our
engine owns the write/scan paths, so it constructs the reports directly
— no reflection (SURVEY.md §2.A rows 5, 13-14).

Commit counter names are the exact 11 the reference's integration test
asserts (IntegrationTest.java:106-117); scan counter names follow
MicrometerMetricsReporterTest.java:24-28.
"""

from __future__ import annotations

from dataclasses import dataclass, field

DEFAULT_PREFIX = "iceberg."  # MicrometerMetricsReporter.java:24-26

# IntegrationTest.java:106-117 — the exact commit meter name set
# (10 counters + the totalDuration timer).
COMMIT_COUNTER_FIELDS = [
    "attempts",
    "addedDataFiles",
    "totalPositionalDeletes",
    "totalDataFiles",
    "addedRecords",
    "totalDeleteFiles",
    "totalFilesSizeInBytes",
    "totalRecords",
    "totalEqualityDeletes",
    "addedFilesSizeInBytes",
]

# Iceberg publishes duration fields as TimerResult, and the reference
# bridges those to UNTAGGED Micrometer Timers — a distinct meter type
# from the tagged counters (MicrometerMetricsReporter.java:86-92,
# extractTimers :98-100). CommitMetricsResult.totalDuration and
# ScanMetricsResult.totalPlanningDuration are the TimerResult fields.
COMMIT_TIMER_FIELDS = ["totalDuration"]

# MicrometerMetricsReporterTest.java:24-28.
SCAN_COUNTER_FIELDS = [
    "resultDataFiles",
    "resultDeleteFiles",
    "totalFileSizeInBytes",
]

SCAN_TIMER_FIELDS = ["totalPlanningDuration"]


@dataclass
class CommitReport:
    table_name: str
    snapshot_id: int
    metrics: dict[str, float]  # keyed by COMMIT_COUNTER_FIELDS
    timers: dict[str, float] = field(default_factory=dict)  # name → seconds


@dataclass
class ScanReport:
    table_name: str
    snapshot_id: int
    metrics: dict[str, float]  # keyed by SCAN_COUNTER_FIELDS
    timers: dict[str, float] = field(default_factory=dict)  # name → seconds


@dataclass
class Counter:
    name: str
    tags: dict[str, str] = field(default_factory=dict)
    value: float = 0.0

    def increment(self, amount: float = 1.0) -> None:
        self.value += amount


@dataclass
class Timer:
    """Micrometer Timer stand-in: sample count + accumulated duration.
    Untagged by construction — the reference registers its timers with
    no tags (MicrometerMetricsReporter.java:91 ``registry.timer(name)``),
    unlike its tableName-tagged counters."""

    name: str
    count: int = 0
    total_time_s: float = 0.0

    def record(self, duration_s: float) -> None:
        self.count += 1
        self.total_time_s += duration_s


class MetricsSink:
    """In-memory meter registry (SimpleMeterRegistry stand-in).

    Pluggable: subclass and override ``publish`` to ship counters to
    StatsD/Prometheus — the engine only talks to this interface.
    """

    def __init__(self) -> None:
        self._counters: dict[tuple[str, tuple[tuple[str, str], ...]], Counter] = {}
        self._timers: dict[str, Timer] = {}

    def counter(self, name: str, tags: dict[str, str] | None = None) -> Counter:
        key = (name, tuple(sorted((tags or {}).items())))
        if key not in self._counters:
            self._counters[key] = Counter(name, dict(tags or {}))
        return self._counters[key]

    def timer(self, name: str) -> Timer:
        """Untagged timer registration (registry.timer(name) parity,
        MicrometerMetricsReporter.java:91)."""
        if name not in self._timers:
            self._timers[name] = Timer(name)
        return self._timers[name]

    def publish(self, counter: Counter | Timer) -> None:  # override for real sinks
        pass

    @property
    def meter_names(self) -> set[str]:
        return {c.name for c in self._counters.values()} | set(self._timers)

    def get(self, name: str) -> Counter | None:
        for (n, _), c in self._counters.items():
            if n == name:
                return c
        return None

    def get_timer(self, name: str) -> Timer | None:
        return self._timers.get(name)


class MetricsReporter:
    """report(CommitReport|ScanReport) → named counters in the sink.

    Mirrors MicrometerMetricsReporter.java:51-75: null-safe no-ops,
    unknown report type raises, names ``<prefix><kind>Report.<field>``
    tagged ``tableName``.
    """

    def __init__(self, sink: MetricsSink | None, prefix: str = DEFAULT_PREFIX) -> None:
        self._sink = sink
        self._prefix = prefix

    def report(self, rpt: CommitReport | ScanReport | None) -> None:
        if rpt is None or self._sink is None:  # MicrometerMetricsReporter.java:42-49
            return
        if isinstance(rpt, CommitReport):
            kind = "commitReport"
        elif isinstance(rpt, ScanReport):
            kind = "scanReport"
        else:  # MicrometerMetricsReporter.java:73-75
            raise ValueError(f"unsupported report type: {type(rpt).__name__}")
        for fname, val in rpt.metrics.items():
            c = self._sink.counter(
                f"{self._prefix}{kind}.{fname}", {"tableName": rpt.table_name}
            )
            c.increment(float(val))
            self._sink.publish(c)
        # TimerResult fields → UNTAGGED timers, one recorded sample per
        # report (MicrometerMetricsReporter.java:86-92).
        for fname, seconds in rpt.timers.items():
            t = self._sink.timer(f"{self._prefix}{kind}.{fname}")
            t.record(float(seconds))
            self._sink.publish(t)
