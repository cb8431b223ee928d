"""Custom stateful streaming operator: incremental per-user session
aggregation via ``applyInPandasWithState`` (SURVEY.md §2g extension;
north_star streaming surface).

``session_window`` covers the declarative case (streaming/file_source);
this module is the ESCAPE HATCH pattern for session logic Spark's
built-ins can't express (e.g. emitting a row only when a session
*closes*, carrying custom per-session accumulators). State is one
(open_session_start, last_ts, n_events, total_value) tuple per user —
O(active users), pruned by the event-time timeout.

Batch-mode twin :func:`sessionize_batch_custom` implements the same
semantics with window functions so the streaming operator has an
oracle inside the test suite (non-SQL ops get rows-only checks from
the driver; here we self-check instead).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

GAP_SECONDS = 1800

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
STATE_SCHEMA = "start long, last long, n long, total double"


def _make_close_sessions(gap_seconds: int):
    """Factory returning the per-group stateful function as a CLOSURE.

    applyInPandasWithState pickles the handed function; a module-level
    function serializes BY REFERENCE (workers must import this
    package — which fails when only the driver extended sys.path, the
    exact shape of a harness running from a scratch directory). A
    closure serializes BY VALUE: self-contained, only stdlib/pandas
    imports inside."""

    def _close_sessions(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pandas as pd  # noqa: F811 — resolve inside the worker

        (user_id,) = key

        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )
            return

        rows = pd.concat(list(pdfs)).sort_values("ts")
        closed: list[tuple] = []
        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None
            n, total = 0, 0.0

        for ts, value in zip(rows["ts"], rows["value"]):
            us = int(ts.value // 1000)  # ns → µs
            if start is None:
                start, last, n, total = us, us, 1, float(value)
            elif us - last > gap_seconds * 1_000_000:
                closed.append((start, last, n, total))
                start, last, n, total = us, us, 1, float(value)
            else:
                last, n, total = us, n + 1, total + float(value)

        state.update((start, last, n, total))
        # ms epoch; never earlier than the already-advanced watermark (a
        # session whose natural timeout is in the past fires next batch)
        desired = last // 1000 + gap_seconds * 1000
        floor_ms = state.getCurrentWatermarkMs() + 1000
        state.setTimeoutTimestamp(max(desired, floor_ms))

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us")
                                      for s, _, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us")
                                    for _, e, _, _ in closed],
                    "n_events": [n_ for _, _, n_, _ in closed],
                    "total_value": [round(t, 2) for _, _, _, t in closed],
                }
            )

    return _close_sessions


def sessionize_stateful(events: DataFrame) -> DataFrame:
    """Streaming: closed sessions per user, via custom state."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_close_sessions(GAP_SECONDS),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch_custom(events: DataFrame) -> DataFrame:
    """Batch twin with identical semantics (ALL sessions, including the
    final open one — streaming emits that one on timeout)."""
    w = Window.partitionBy("user_id").orderBy("ts")
    marked = events.withColumn(
        "new_session",
        (
            F.coalesce(
                (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)))
                > GAP_SECONDS,
                F.lit(True),
            )
        ).cast("int"),
    ).withColumn(
        "sid",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return marked.groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).drop("sid")
