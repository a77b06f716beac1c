"""Gap-based sessionization: group each key's events into sessions where
consecutive events are no more than ``gap_ms`` apart.

Batch analogue of Structured Streaming's ``session_window`` (the
streaming variant lives in ``streaming/``): the standard
gaps-and-islands construction —

1. ``lag(ts)`` per key marks session starts (gap > ``gap_ms`` or first
   event);
2. a running sum of start-markers numbers the sessions;
3. a group-by rolls each session up to (start, end, n_events, duration).

Cost at scale: both windows share ONE shuffle on the key (same
partitioning, same ordering — Catalyst reuses the Exchange and sort),
then the rollup group-by on (key, session_id) is partial-aggregated
map-side on already-co-located data, so AQE plans it shuffle-free.
Session state never materializes per-event beyond two longs.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sessionize(
    df: DataFrame,
    on: Sequence[str],
    gap_ms: int,
    ts_col: str = "ts",
) -> DataFrame:
    """Add a ``session_id`` column (1-based, per key, in time order)."""
    on = list(on)
    w = Window.partitionBy(*on).orderBy(F.col(ts_col).asc())
    prev = F.lag(F.col(ts_col)).over(w)
    is_start = F.when(
        prev.isNull() | (F.col(ts_col) - prev > F.lit(gap_ms)), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_start).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    df: DataFrame,
    on: Sequence[str],
    gap_ms: int,
    ts_col: str = "ts",
) -> DataFrame:
    """One row per (key..., session_id): ``session_start``,
    ``session_end``, ``n_events``, ``duration_ms``."""
    on = list(on)
    return (
        sessionize(df, on, gap_ms, ts_col)
        .groupBy(*on, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            (F.max(ts_col) - F.min(ts_col)).alias("duration_ms"),
        )
    )
