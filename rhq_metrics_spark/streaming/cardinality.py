"""Streaming twin of operators/cardinality.py (B12): exact distinct
entities per (group, window) over a live stream.

Two stages, both built-in Structured Streaming operators:

1. ``dropDuplicates`` on (group, window, entity) with the WINDOW struct
   as the key's event time — each entity contributes its first row per
   bucket, and the dedup state for a key lives until the watermark
   passes its window's END, i.e. exactly the bucket's lifetime.  (A
   within-watermark dedup would evict mid-bucket once the delay —
   minutes — elapsed inside a day-long bucket, and a recurring entity
   would count twice.)  Memory is bounded by the live windows'
   cardinality, not the stream's history.
2. a windowed count in append mode — a bucket is emitted exactly once,
   when the watermark finalizes it.

On a replay of the same rows this equals the batch
``distinct_rollup(..).filter(grain='bucket')`` for every finalized
bucket (tested).  For cardinalities where exact per-entity state is too
big, the batch side's HLL sketch partials are the handoff: stream the
raw rows into the store and let compaction build sketches.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["streaming_distinct_rollup"]


def streaming_distinct_rollup(
    stream_df: DataFrame,
    grain: str = "1 day",
    event_time_col: str = "event_time",
    group_col: str = "metric",
    entity_col: str = "user_id",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Exact distinct-``entity_col`` count per (group, ``grain`` window)
    emitted once per finalized window (append mode).

    Output: ``(metric, bucket_start, bucket_end, n_distinct)`` with
    bucket bounds as timestamps.
    """
    deduped = (
        stream_df.withWatermark(event_time_col, watermark_delay)
        .withColumn("_w", F.window(F.col(event_time_col), grain))
        # the window struct is an event-time column: dedup state for a
        # (group, window, entity) key is kept until the watermark passes
        # the window end — never evicted mid-bucket
        .dropDuplicates([group_col, "_w", entity_col])
    )
    return (
        deduped.groupBy(F.col(group_col), F.col("_w"))
        .agg(F.count(F.lit(1)).alias("n_distinct"))
        .select(
            group_col,
            F.col("_w.start").alias("bucket_start"),
            F.col("_w.end").alias("bucket_end"),
            "n_distinct",
        )
    )
