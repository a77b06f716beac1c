"""Streaming twin of operators/anomaly.py seasonal_profile: maintain
the per-slice seasonal-profile partials as the stream arrives.

The profile's cells are exact integer sums — ``(series, bin, sum_vq,
sum_sq_vq, bin_samples)`` add — so the stream emits one finalized
partial set per watermark-closed slice, and summing the slices of any
range reproduces the batch profile over that range exactly (tested).
Serving then scores live points with ``seasonal_apply`` (or forecasts
with ``seasonal_forecast_bands``) over the merged partials, zero extra
aggregations.  State per key is three longs, bounded by live-slices ×
series × n_bins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["streaming_seasonal_profile"]


def streaming_seasonal_profile(
    stream_df: DataFrame,
    slice_duration: str,
    event_time_col: str = "event_time",
    on: str | list[str] = "metric",
    ts_col: str = "ts",
    value_col: str = "value",
    period_ms: int = 86_400_000,
    n_bins: int = 24,
    value_scale: int = 100,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Per-(slice window, series, bin) profile partials, emitted once
    per finalized slice; binning and quantization are the batch
    operator's (``_seasonal_binned``).  Output: ``(slice_start,
    slice_end, *on, bin, sum_vq, bin_samples)``."""
    from rhq_metrics_spark.operators.anomaly import _seasonal_binned

    gcols = [on] if isinstance(on, str) else list(on)
    binned = _seasonal_binned(
        stream_df, ts_col, value_col, period_ms, n_bins, value_scale
    )
    return (
        binned.withWatermark(event_time_col, watermark_delay)
        .groupBy(
            F.window(event_time_col, slice_duration).alias("_w"),
            *[F.col(g) for g in gcols],
            F.col("bin"),
        )
        .agg(
            F.sum("_vq").alias("sum_vq"),
            F.sum(F.col("_vq") * F.col("_vq")).alias("sum_sq_vq"),
            F.count(F.lit(1)).alias("bin_samples"),
        )
        .select(
            F.col("_w.start").alias("slice_start"),
            F.col("_w.end").alias("slice_end"),
            *gcols,
            "bin",
            "sum_vq",
            "sum_sq_vq",
            "bin_samples",
        )
    )
