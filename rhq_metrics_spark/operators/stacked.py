"""A3/A4: multi-metric statistics — stacked (sum-of-stats) and pooled.

Reference: MetricsServiceImpl.findNumericStats (MetricsServiceImpl.java:926-966).

- ``stacked=True`` (A3, SumNumericBucketPointCollector.java:32-89): compute
  per-metric bucket stats first, then per bucket SUM each statistic
  across metrics — **including min, median, max and each percentile**
  (statistically odd, but it is the reference contract; do not "fix").
  ``samples`` of a stacked bucket = number of *contributing metrics*
  (one increment per non-empty per-metric bucket), not total points.
  Empty per-metric buckets are skipped (``isEmpty`` guard ``:47``).
- ``stacked=False`` (A4, MetricsServiceImpl.java:932-941): pool all
  points of all selected metrics into one A1 aggregation.

Spark-first: two chained hash-aggs — ``groupBy(metric, bucket)`` then
``groupBy(bucket)``; the second input is tiny (metrics × buckets).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from rhq_metrics_spark.model import Buckets
from rhq_metrics_spark.operators.stats import (
    bucket_dimension,
    numeric_bucket_stats,
    percentile_col_name,
)


def stacked_stats(
    df: DataFrame,
    buckets: Buckets,
    percentiles: Sequence[float] = (),
    value_col: str = "value",
    ts_col: str = "ts",
    metric_cols: Sequence[str] = ("tenant_id", "metric"),
    fill_empty: bool = True,
    value_scale: int | None = None,
) -> DataFrame:
    """A3: per-bucket element-wise sum of per-metric bucket stats."""
    per_metric = numeric_bucket_stats(
        df,
        buckets,
        percentiles=percentiles,
        value_col=value_col,
        ts_col=ts_col,
        group_cols=metric_cols,
        fill_empty=False,  # empty per-metric buckets contribute nothing
        value_scale=value_scale,
    )
    pct_cols = [percentile_col_name(q) for q in percentiles]
    stacked = per_metric.groupBy("start", "end").agg(
        F.sum("min").alias("min"),
        F.sum("avg").alias("avg"),
        F.sum("median").alias("median"),
        F.sum("max").alias("max"),
        F.sum("sum").alias("sum"),
        F.count(F.lit(1)).alias("samples"),  # contributing metric count
        *[F.sum(c).alias(c) for c in pct_cols],
    )
    if not fill_empty:
        return stacked
    dim = bucket_dimension(df, buckets)
    return (
        F.broadcast(dim.drop("bucket_idx"))
        .join(stacked, ["start", "end"], "left")
        .withColumn("samples", F.coalesce(F.col("samples"), F.lit(0)))
    )


def pooled_stats(
    df: DataFrame,
    buckets: Buckets,
    percentiles: Sequence[float] = (),
    value_col: str = "value",
    ts_col: str = "ts",
    fill_empty: bool = True,
    value_scale: int | None = None,
) -> DataFrame:
    """A4: all selected metrics pooled into a single bucket-stats pass."""
    return numeric_bucket_stats(
        df,
        buckets,
        percentiles=percentiles,
        value_col=value_col,
        ts_col=ts_col,
        group_cols=(),
        fill_empty=fill_empty,
        value_scale=value_scale,
    )
