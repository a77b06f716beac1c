"""Streaming twin of pipelines/sketches.py cms_build: maintain
per-slice count-min sketch cells as the stream arrives.

Cells ADD (the CMS mergeability contract), so the stream emits one
finalized (slice, row, bucket, n) partial per watermark-closed slice —
exactly what a batch ``cms_build`` over the same rows produces per
slice (tested), and any range's sketch is the per-slice cells summed.
State per key is one long; keys are bounded by live-slices × depth ×
width (≤ 1024 per slice at the defaults), independent of throughput —
the same bounded-state contract as the histogram twin.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from rhq_metrics_spark.pipelines.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    _cms_bucket,
)

__all__ = ["streaming_cms"]


def streaming_cms(
    stream_df: DataFrame,
    value_col: str,
    slice_duration: str,
    event_time_col: str = "event_time",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = "cms",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Per-(slice window, row, bucket) cell counts, emitted once per
    finalized slice; bucketing is the batch operator's md5 hash, so a
    slice's cells equal ``cms_build`` over the slice's rows.  Output:
    ``(slice_start, slice_end, row, bucket, n)``."""
    cells = stream_df.select(
        F.col(event_time_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        _cms_bucket(F.col(value_col), j, width, salt).alias(
                            "bucket"
                        ),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
    )
    return (
        cells.withWatermark(event_time_col, watermark_delay)
        .groupBy(
            F.window(event_time_col, slice_duration).alias("_w"),
            F.col("c.row").alias("row"),
            F.col("c.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.col("_w.start").alias("slice_start"),
            F.col("_w.end").alias("slice_end"),
            "row",
            "bucket",
            "n",
        )
    )
