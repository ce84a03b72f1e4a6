"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.B "session windows, stateful ops"; prompt: "custom
stateful operators").

``running_user_stats`` keeps per-user state (event count, value sum,
last-seen timestamp) across micro-batches and emits one updated row per
user per batch — the building block for online feature stores /
anomaly detection. State is bounded two ways: the watermark lets us
drop users idle past the horizon (state timeout), and state size is
O(distinct active users), not O(events).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, last_ts timestamp"
)
STATE_SCHEMA = "n_events long, total_value double, last_ts timestamp"


def _update_user_stats(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # idle past the timeout horizon: emit nothing, drop the state
        state.remove()
        return
    n, total, last = (state.get if state.exists else (0, 0.0, None))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last = batch_max if last is None or batch_max > last else last
    state.update((n, total, last))
    # EVENT-time idle horizon (r13): drop a user 1h of event time past
    # the watermark. The previous setTimeoutDuration (processing time)
    # forced the engine to keep scheduling wall-clock timer batches —
    # an availableNow run would grind through empty ~0.5 s micro-batches
    # for the full hour after the data was done (measured: 535 empty
    # batches). Event-time timers resolve against the watermark the
    # data itself advances, so the query terminates with the data, and
    # "idle" means idle in the STREAM's time — the semantics the state
    # bound was documented to have.
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 60 * 60 * 1000)
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "last_ts": [last],
        }
    )


def running_user_stats(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming per-user running aggregates with explicit state
    management (count, sum, last-seen), emitted every micro-batch."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 arbitrary-state API): the
# successor to applyInPandasWithState — named state variables
# (value/list/map), timers, and TTL owned by the runtime instead of a
# single packed tuple. Same O(distinct keys) state bound; at 100 TB
# state lives in the RocksDB state store per partition, so key
# cardinality — not event volume — sizes the cluster.
# ---------------------------------------------------------------------------
import importlib.util

# transformWithStateInPandas speaks protobuf to the JVM state server;
# the module gates on BOTH the Spark 4 API and the protobuf runtime
# (absent in some images — this one included; no-install environment).
try:
    HAS_TWS_DEPS = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:  # parent 'google' namespace absent entirely
    HAS_TWS_DEPS = False

try:  # Spark >= 4.0
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _TypeStatsProcessor(StatefulProcessor):
        """Per-event-type running (count, total, max value) via a named
        ValueState; emits the updated row every micro-batch."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "type_stats", "n long, total double, vmax double"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total, vmax = (0, 0.0, float("-inf"))
            if self._state.exists():
                n, total, vmax = self._state.get()
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                vmax = max(vmax, float(pdf["value"].max()))
            self._state.update((n, total, vmax))
            yield pd.DataFrame(
                {
                    "event_type": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "max_value": [vmax],
                }
            )

        def close(self) -> None:
            pass

    def running_type_stats(events: DataFrame) -> DataFrame:
        """Streaming per-event-type totals via transformWithStateInPandas."""
        return events.groupBy("event_type").transformWithStateInPandas(
            statefulProcessor=_TypeStatsProcessor(),
            outputStructType=(
                "event_type string, n_events long, "
                "total_value double, max_value double"
            ),
            outputMode="Update",
            timeMode="None",
        )

except ImportError:  # pragma: no cover - Spark 3.x fallback

    def running_type_stats(events: DataFrame) -> DataFrame:
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark >= 4.0"
        )


# ---------------------------------------------------------------------------
# Equivalence twin: the SAME per-type running (count, total, max) state
# machine expressed with applyInPandasWithState. Two purposes:
# (1) in protobuf-less images (this one) it is the runnable proof the
#     type-stats semantics hold — the pytest matrix cell stays green
#     instead of skipping; (2) where protobuf IS present, the test runs
#     BOTH paths and asserts they agree, an equivalence gate between
#     Spark's two arbitrary-state APIs.
# ---------------------------------------------------------------------------
TYPE_STATS_OUTPUT = (
    "event_type string, n_events long, total_value double, max_value double"
)
_TYPE_STATS_STATE = "n long, total double, vmax double"


def _update_type_stats(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n, total, vmax = (
        state.get if state.exists else (0, 0.0, float("-inf"))
    )
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        vmax = max(vmax, float(pdf["value"].max()))
    state.update((n, total, vmax))
    yield pd.DataFrame(
        {
            "event_type": [event_type],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "max_value": [vmax],
        }
    )


def running_type_stats_aip(events: DataFrame) -> DataFrame:
    """``running_type_stats`` re-expressed on applyInPandasWithState —
    identical keying, state contents, and emitted schema."""
    return events.groupBy("event_type").applyInPandasWithState(
        _update_type_stats,
        outputStructType=TYPE_STATS_OUTPUT,
        stateStructType=_TYPE_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
