"""Streaming twin of operators/downsample.py histogram_rollup (B13):
maintain the per-(series, slice) histogram partials as the stream
arrives, so ``histogram_quantile`` can serve rank statistics live.

Plain built-ins: watermark → groupBy(series, slice window, bin) count in
append mode — a slice's bin counts are emitted exactly once when the
watermark finalizes the slice, matching what a batch
``histogram_rollup`` over the same rows produces (tested).  State per
key is one long; keys are bounded by live-slices × bins × series.
Downstream the partials are ordinary rows: write them to the rollup
parquet next to the b1/b11 continuous aggregates and query with
``histogram_quantile``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["streaming_histogram_rollup"]


def streaming_histogram_rollup(
    stream_df: DataFrame,
    slice_duration: str,
    lo: float,
    hi: float,
    n_bins: int,
    event_time_col: str = "event_time",
    group_col: str = "metric",
    value_col: str = "value",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Per-(series, slice window, bin) counts, emitted once per
    finalized slice.  Binning is identical to the batch operator
    (floor with clamp into the edge bins).  Output: ``(metric,
    slice_start, slice_end, bin, count)``."""
    if n_bins < 1 or not hi > lo:
        raise ValueError("need n_bins >= 1 and hi > lo")
    w = (hi - lo) / n_bins
    raw = F.floor((F.col(value_col) - lo) / w)
    bin_i = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")
    return (
        stream_df.withWatermark(event_time_col, watermark_delay)
        .groupBy(
            F.col(group_col),
            F.window(event_time_col, slice_duration).alias("_w"),
            bin_i.alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            group_col,
            F.col("_w.start").alias("slice_start"),
            F.col("_w.end").alias("slice_end"),
            "bin",
            "count",
        )
    )
