"""Multi-granularity time rollup: hour / day / total stats in ONE pass.

The reference serves each granularity with a separate bucketed-stats
request (BucketedOutputMapper re-runs per bucketDuration); a
downsampling pipeline at 100 TB wants all grains from one scan.
GROUPING SETS gives Catalyst a single Expand + one shuffle: partial
aggregation happens map-side per grain before the exchange, so the
added grains cost one extra Expand row per input row, not extra scans.

Portability note: the grain is reported via ``grouping_id``-derived
labels (identical semantics in DuckDB's GROUPING()), and the grain
columns are epoch-millis longs floored with integer division — no
timezone/date functions to diverge on.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

HOUR_MS = 3_600_000
DAY_MS = 86_400_000


def time_rollup(
    points: DataFrame,
    group_col: str = "metric",
    ts_col: str = "ts",
    value_col: str = "value",
    value_scale: int | None = None,
) -> DataFrame:
    """Per ``group_col``: hourly, daily, and all-time stats in one
    aggregation.

    Output: ``(metric, grain, bucket_start, n, sum, min, max, avg)``
    where ``grain`` in ('hour','day','total') and ``bucket_start`` is
    the epoch-millis floor of the grain (null for 'total').

    ``value_scale`` (see :func:`operators.stats._stat_aggs`) switches
    sum/avg to exact integer accumulation of ``round(value * scale)`` —
    order-independent across partitions and engines.  Large grains
    ('total' sums millions of doubles) otherwise diverge in the last
    ulps by summation order, which flips a 4-dp rounding boundary.
    """
    base = points.select(
        F.col(group_col).alias("metric"),
        (F.floor(F.col(ts_col) / HOUR_MS) * HOUR_MS).alias("hour_start"),
        (F.floor(F.col(ts_col) / DAY_MS) * DAY_MS).alias("day_start"),
        F.col(value_col).cast("double").alias("value"),
    )
    if value_scale:
        from rhq_metrics_spark.operators.stats import quantize

        scaled = F.sum(F.round(F.col("value") * value_scale).cast("long"))
        sum_col = quantize(scaled, value_scale, 1).alias("sum")
        avg_col = quantize(scaled, value_scale, F.count("value")).alias("avg")
    else:
        sum_col = F.round(F.sum("value"), 4).alias("sum")
        avg_col = F.round(F.avg("value"), 4).alias("avg")
    rolled = base.groupingSets(
        [["metric", "day_start", "hour_start"], ["metric", "day_start"],
         ["metric"]],
        "metric", "day_start", "hour_start",
    ).agg(
        F.grouping("hour_start").alias("_g_hour"),
        F.grouping("day_start").alias("_g_day"),
        F.count("value").alias("n"),
        sum_col,
        F.round(F.min("value"), 4).alias("min"),
        F.round(F.max("value"), 4).alias("max"),
        avg_col,
    )
    grain = (
        F.when(F.col("_g_hour") == 0, F.lit("hour"))
        .when(F.col("_g_day") == 0, F.lit("day"))
        .otherwise(F.lit("total"))
    )
    bucket_start = (
        F.when(F.col("_g_hour") == 0, F.col("hour_start"))
        .when(F.col("_g_day") == 0, F.col("day_start"))
        .otherwise(F.lit(None).cast("long"))
    )
    return rolled.select(
        "metric",
        grain.alias("grain"),
        bucket_start.alias("bucket_start"),
        "n", "sum", "min", "max", "avg",
    )


def stats_from_rollup(
    rollup: DataFrame,
    buckets,
    tenant_id: str | None = None,
    metric: str | None = None,
    check_alignment: bool = True,
) -> DataFrame:
    """Serve bucket stats FROM the continuous-aggregate table instead of
    raw points (the long-range-dashboard read path: years of 2h rollups
    instead of billions of raw rows).

    ``rollup`` is the ``start_rollup_stream`` sink — one row per
    (tenant, metric, window) with mergeable stats (min/max/sum/samples).
    Requires the bucket grid to be rollup-aligned: ``buckets.step`` a
    multiple of the window length and ``buckets.start`` on a window
    boundary — raises ``ValueError`` otherwise so callers fall back to
    the raw path (``service.numeric_stats``) rather than silently
    serving wrong numbers.  avg is re-derived as sum/samples (avg of
    avgs would be wrong for uneven windows).
    """
    win_ms = F.unix_millis(F.col("window_end")) - F.unix_millis(
        F.col("window_start")
    )
    df = rollup
    if tenant_id is not None:
        df = df.filter(F.col("tenant_id") == tenant_id)
    if metric is not None:
        df = df.filter(F.col("metric") == metric)
    start_ms = F.unix_millis(F.col("window_start"))
    end_ms = F.unix_millis(F.col("window_end"))

    # the grid defines the query range: windows outside it are other
    # time periods, not errors.  Compare the raw timestamp columns to
    # timestamp literals (NOT unix_millis(col) to an int) so the range
    # reaches the parquet scan as PushedFilters — at scale the rollup
    # table holds years of windows and an 8h query must row-group-prune
    # it like any other time-partitioned table.
    grid_end = buckets.start + buckets.step * buckets.count
    df = df.filter(
        (F.col("window_start") >= F.timestamp_millis(F.lit(buckets.start)))
        & (F.col("window_end") <= F.timestamp_millis(F.lit(grid_end)))
    )

    # alignment guard: window length divides the step and windows sit on
    # the window grid relative to the bucket origin — together that
    # means every window falls wholly inside exactly one bucket.
    # ``check_alignment=False`` skips the per-call job when the caller
    # has already proven it (service.attach_rollup validates the table
    # once and checks the grid arithmetic driver-side per query).
    if check_alignment:
        bad = df.filter(
            (buckets.step % win_ms != 0)
            | ((start_ms - buckets.start) % win_ms != 0)
        )
        if bad.limit(1).count() > 0:
            raise ValueError(
                "rollup windows do not tile the requested bucket grid; "
                "serve this query from raw points instead"
            )
    bucketed = df.withColumn(
        "bucket", ((start_ms - buckets.start) / buckets.step).cast("long")
    )
    return (
        bucketed.groupBy("tenant_id", "metric", "bucket")
        .agg(
            F.min("min").alias("min"),
            F.max("max").alias("max"),
            F.sum("sum").alias("sum"),
            F.sum("samples").alias("samples"),
        )
        .withColumn("avg", F.col("sum") / F.col("samples"))
        .withColumn(
            "bucket_start", buckets.start + F.col("bucket") * buckets.step
        )
        .select(
            "tenant_id", "metric", "bucket", "bucket_start",
            "min", "avg", "max", "sum", "samples",
        )
    )
