"""A2: availability bucket statistics — duration-weighted state analysis.

Reference: AvailabilityDataPointCollector (core/.../service/
AvailabilityDataPointCollector.java:34-109).  Semantics are **per
bucket, order-dependent**, derived line-by-line from the collector:

- each bucket is independent; only points inside the bucket contribute;
- the *first* point's state is back-filled from the bucket start to its
  timestamp (``:62-70``), i.e. the first point covers
  ``[bucket_start, next_ts)``;
- every other point covers ``[ts, next_ts)``; the *last* point extends
  to the bucket end (``toBucketPoint``, ``:91-100``);
- ``uptime_ratio = up_duration / step`` (``:105``);
- ``not_up_count`` counts transitions *into* a not-UP state: a not-UP
  first point, or a not-UP point whose predecessor was UP (``:66-69,81-84``);
- ``last_not_uptime``: bucket end if the bucket's final state is not UP;
  otherwise the last timestamp at which a not-UP point occurred or an
  UP point ended a not-UP run; 0 if the whole bucket was UP (``:67,77-86,98-100``);
- ``samples`` = number of points in the bucket; buckets with no points
  are emitted empty (null stats, samples 0) per BucketPoint.toList.

Spark-first: one pass of window functions partitioned by
(series, bucket) ordered by ts, then a single hash-agg with conditional
sums per state — no ``applyInPandas``, fully JVM-side, one shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from rhq_metrics_spark.model import AvailabilityType, Buckets
from rhq_metrics_spark.operators.stats import bucket_dimension, bucket_index, in_grid

UP = AvailabilityType.UP


def availability_stats(
    df: DataFrame,
    buckets: Buckets,
    value_col: str = "value",
    ts_col: str = "ts",
    group_cols: Sequence[str] = (),
    fill_empty: bool = True,
) -> DataFrame:
    """Per-bucket state durations + uptime ratio.

    Output: ``group_cols…, start, end, up_duration, down_duration,
    unknown_duration, admin_duration, uptime_ratio, not_up_count,
    last_not_uptime, samples``.
    """
    group_cols = list(group_cols)
    pts = (
        df.filter(in_grid(buckets, ts_col))
        .withColumn("bucket_idx", bucket_index(buckets, ts_col))
        .withColumn(
            "_bstart",
            F.lit(buckets.start) + F.col("bucket_idx") * F.lit(buckets.step),
        )
        .withColumn("_bend", F.col("_bstart") + F.lit(buckets.step))
    )
    w = Window.partitionBy(*group_cols, "bucket_idx").orderBy(F.col(ts_col).asc())
    state = F.col(value_col)
    prev_state = F.lag(state).over(w)
    next_ts = F.lead(F.col(ts_col)).over(w)

    enriched = pts.select(
        *group_cols,
        "bucket_idx",
        "_bstart",
        "_bend",
        F.col(ts_col).alias("_ts"),
        state.alias("_state"),
        prev_state.alias("_prev_state"),
        # first point back-fills to bucket start; last extends to bucket end
        (
            F.coalesce(next_ts, F.col("_bend"))
            - F.when(F.lag(F.col(ts_col)).over(w).isNull(), F.col("_bstart")).otherwise(
                F.col(ts_col)
            )
        ).alias("_dur"),
        F.when(next_ts.isNull(), state).alias("_final_state"),
    )

    def state_dur(s: str):
        return F.sum(F.when(F.col("_state") == s, F.col("_dur")).otherwise(0)).alias(
            f"{s}_duration"
        )

    agg = enriched.groupBy(*group_cols, "bucket_idx").agg(
        state_dur(AvailabilityType.UP),
        state_dur(AvailabilityType.DOWN),
        state_dur(AvailabilityType.UNKNOWN),
        state_dur(AvailabilityType.ADMIN),
        F.sum(
            F.when(
                (F.col("_state") != UP)
                & (F.col("_prev_state").isNull() | (F.col("_prev_state") == UP)),
                1,
            ).otherwise(0)
        ).alias("not_up_count"),
        # candidates for last_not_uptime among interior events
        F.max(F.when(F.col("_state") != UP, F.col("_ts"))).alias("_last_not_up_ts"),
        F.max(
            F.when(
                (F.col("_state") == UP)
                & F.col("_prev_state").isNotNull()
                & (F.col("_prev_state") != UP),
                F.col("_ts"),
            )
        ).alias("_last_recovery_ts"),
        F.max("_final_state").alias("_final"),
        F.max("_bend").alias("_bend_a"),
        F.count(F.lit(1)).alias("samples"),
    )

    result = agg.select(
        *group_cols,
        "bucket_idx",
        *[f"{s}_duration" for s in AvailabilityType.ALL],
        (F.col("up_duration").cast("double") / F.lit(float(buckets.step))).alias(
            "uptime_ratio"
        ),
        "not_up_count",
        F.when(F.col("_final") != UP, F.col("_bend_a"))
        .otherwise(
            F.coalesce(
                F.greatest(F.col("_last_not_up_ts"), F.col("_last_recovery_ts")),
                F.col("_last_not_up_ts"),
                F.col("_last_recovery_ts"),
                F.lit(0),
            )
        )
        .alias("last_not_uptime"),
        "samples",
    )

    dim = bucket_dimension(df, buckets)
    if not fill_empty:
        return result.join(F.broadcast(dim), "bucket_idx").drop("bucket_idx")
    if group_cols:
        groups = df.select(*group_cols).distinct()
        dim = groups.crossJoin(F.broadcast(dim))
        filled = dim.join(result, [*group_cols, "bucket_idx"], "left")
    else:
        filled = F.broadcast(dim).join(result, "bucket_idx", "left")
    return filled.withColumn("samples", F.coalesce(F.col("samples"), F.lit(0))).drop(
        "bucket_idx"
    )
