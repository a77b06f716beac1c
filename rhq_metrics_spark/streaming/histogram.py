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

__all__ = ["streaming_histogram_rollup", "start_histogram_rollup_stream"]


def streaming_histogram_rollup(
    stream_df: DataFrame,
    slice_duration: str,
    lo: float,
    hi: float,
    n_bins: int,
    event_time_col: str = "event_time",
    group_col: str | list[str] = "metric",
    value_col: str = "value",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Per-(series, slice window, bin) counts, emitted once per
    finalized slice.  Binning is identical to the batch operator
    (floor with clamp into the edge bins).  ``group_col`` may be a list
    (e.g. ``["tenant_id", "metric"]``).  Output: ``(*group_cols,
    slice_start, slice_end, bin, count)``."""
    if n_bins < 1 or not hi > lo:
        raise ValueError("need n_bins >= 1 and hi > lo")
    gcols = [group_col] if isinstance(group_col, str) else list(group_col)
    w = (hi - lo) / n_bins
    raw = F.floor((F.col(value_col) - lo) / w)
    bin_i = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")
    return (
        stream_df.withWatermark(event_time_col, watermark_delay)
        .groupBy(
            *[F.col(g) for g in gcols],
            F.window(event_time_col, slice_duration).alias("_w"),
            bin_i.alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            *gcols,
            F.col("_w.start").alias("slice_start"),
            F.col("_w.end").alias("slice_end"),
            "bin",
            "count",
        )
    )


def start_histogram_rollup_stream(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    slice_duration: str,
    lo: float,
    hi: float,
    n_bins: int,
    event_time_col: str = "event_time",
    watermark_delay: str = "10 minutes",
    trigger: dict | None = None,
):
    """Continuous HISTOGRAM aggregate over a canonical points stream
    ``(tenant_id, metric, <event_time>, value)``: maintain the
    per-(tenant, metric, slice, bin) integer partials as a parquet
    table in exactly the schema
    :meth:`service.MetricsService.attach_histogram_rollup` consumes
    (``slice_start`` as epoch-ms long) — the rank-statistics companion
    to :func:`streaming.ingest.start_rollup_stream`'s min/avg/max/sum
    sink.  Append mode + watermark → each finalized slice lands exactly
    once; re-attach (or refresh) to advance the serving watermark."""
    agg = streaming_histogram_rollup(
        stream_df, slice_duration, lo, hi, n_bins,
        event_time_col=event_time_col,
        group_col=["tenant_id", "metric"],
        watermark_delay=watermark_delay,
    ).select(
        "tenant_id",
        "metric",
        F.unix_millis("slice_start").alias("slice_start"),
        "bin",
        "count",
    )
    writer = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(path))
        .option("checkpointLocation", str(checkpoint_dir))
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
