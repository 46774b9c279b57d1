"""Sessionization: split per-user event streams on inactivity gaps.

Batch implementation is the classic lag + cumulative-sum pattern:
a new session starts where the gap to the previous event exceeds the
threshold; session_id = running count of starts.  The window partitions
by user, so the plan is ONE shuffle on user_id and a per-partition sort
— no global ordering, scale-safe (hot users are bounded by per-user
event counts, not table size).

Streaming variant: ``F.session_window`` (native gap-based session
windows) — same semantics, state managed by the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch(c):
    """Fractional epoch seconds; TIMESTAMP_NTZ cannot cast to double
    directly, so hop through TIMESTAMP (session tz is pinned to UTC)."""
    return c.cast("timestamp").cast("double")


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Append session_id (1-based per user, in time order)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_s = gap_minutes * 60.0
    prev = F.lag(ts_col).over(w)
    new_session = (
        prev.isNull()
        | ((_epoch(F.col(ts_col)) - _epoch(prev)) > gap_s)
    ).cast("int")
    return events.withColumn(
        "session_id", F.sum(new_session).over(w)
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Per-session aggregates: event count, duration seconds."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.max(_epoch(F.col(ts_col)))
            - F.min(_epoch(F.col(ts_col)))
        ).alias("duration_s"),
    )


def streaming_session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Streaming-native session windows (per user, gap-closed).

    ``watermark`` bounds allowed event-time lateness independently of
    the session gap (defaults to the gap); coupling them would force a
    semantic change to the sessions just to tolerate later data."""
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark or gap)
        .groupBy(F.session_window(ts_col, gap), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
