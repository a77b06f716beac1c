"""Bucketed numeric statistics (A1), scalar aggregates (A6), min/max ts (A8).

Reference semantics (SURVEY.md §2.4):

- A1 ``NumericBucketPointTransformer`` + ``NumericDataPointCollector``
  (core/.../transformers/NumericBucketPointTransformer.java:33-54,
  .../NumericDataPointCollector.java:40-118): group points into a
  ``Buckets`` grid, per bucket emit min/avg/median/max/sum/samples plus
  requested percentiles.  Median is always computed (appended last in the
  reference collector).  Buckets with no points are emitted as *empty*
  (all-null stats, samples 0) — ``BucketPoint.toList`` fill
  (core/metrics-model/.../model/BucketPoint.java:70-83).
- Percentiles are **exact** (``percentile``), matching the reference's
  test oracle which swaps the production P² estimator for an exact
  implementation (BaseMetricsITest.java:82,110).  ``approx=True`` opts
  into ``approx_percentile`` — the analogue of the production P² path.
- A6 ``Aggregate`` lambdas (core/.../service/Aggregate.java:33-58).
- A8 ``MinMaxTimestampTransformer``.

Scale notes: the aggregation is a single hash-agg keyed by
(group_cols…, bucket_idx) — partial/final (map-side combine) comes from
Catalyst for min/avg/max/sum/count.  Exact percentiles are sort-based
within each (group, bucket); at 100 TB prefer ``approx=True`` which is
a mergeable sketch.  The empty-bucket fill joins against a generated
bucket dimension of ``count`` rows — broadcast, never a shuffle of the
data side.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from rhq_metrics_spark.model import Buckets

#: canonical stat column order for numeric bucket points
STAT_COLS = ("min", "avg", "median", "max", "sum", "samples")


def percentile_col_name(q: float) -> str:
    """``90`` → ``p90``; ``99.9`` → ``p99_9`` (keeps the original quantile
    string like the reference's ``Percentile.getOriginalQuantile``)."""
    text = f"{q:g}"
    return "p" + text.replace(".", "_").replace("-", "m")


def bucket_index(buckets: Buckets, ts_col: str = "ts") -> Column:
    """Grid cell for a timestamp: ``(ts - start) / step`` (integer div)."""
    return ((F.col(ts_col) - F.lit(buckets.start)) / F.lit(buckets.step)).cast("long")


def in_grid(buckets: Buckets, ts_col: str = "ts") -> Column:
    """Half-open membership predicate ``start <= ts < grid end``."""
    return (F.col(ts_col) >= F.lit(buckets.start)) & (F.col(ts_col) < F.lit(buckets.end))


def _stat_aggs(
    value_col: str,
    percentiles: Sequence[float],
    approx: bool,
    value_scale: int | None = None,
) -> list[Column]:
    """``value_scale`` switches sum/avg to exact integer accumulation of
    ``round(value * scale)`` — order-independent across partitions (and
    engines), for inputs with fixed decimal precision.  Floating sums
    are order-dependent in their last ulps, which matters when a
    downstream consumer rounds near a decimal boundary."""
    v = F.col(value_col).cast("double")
    if approx:
        med = F.approx_percentile(v, F.lit(0.5))
        pcts = [
            F.approx_percentile(v, F.lit(q / 100.0)).alias(percentile_col_name(q))
            for q in percentiles
        ]
    elif value_scale:
        # percentiles over the scaled INTEGERS, quantized back: linear
        # interpolation between integers is exact (b-a and a+b both
        # representable), so different engines'/orders' interpolation
        # formulas agree bit-for-bit; medians of fixed-decimal data land
        # on half-boundaries structurally, where raw-double interpolation
        # diverges in the last ulp.
        sv = F.round(v * value_scale).cast("long")
        med = quantize(F.percentile(sv, F.lit(0.5)), value_scale, 1)
        pcts = [
            quantize(F.percentile(sv, F.lit(q / 100.0)), value_scale, 1).alias(
                percentile_col_name(q)
            )
            for q in percentiles
        ]
    else:
        med = F.percentile(v, F.lit(0.5))
        pcts = [
            F.percentile(v, F.lit(q / 100.0)).alias(percentile_col_name(q))
            for q in percentiles
        ]
    if value_scale:
        scaled = F.sum(F.round(v * value_scale).cast("long"))
        sum_col = quantize(scaled, value_scale, 1).alias("sum")
        avg_col = quantize(scaled, value_scale, F.count(v)).alias("avg")
    else:
        sum_col = F.sum(v).alias("sum")
        avg_col = F.avg(v).alias("avg")
    return [
        F.min(v).alias("min"),
        avg_col,
        med.alias("median"),
        F.max(v).alias("max"),
        sum_col,
        F.count(v).alias("samples"),
        *pcts,
    ]


#: output decimal places for quantized (value_scale) sums/averages
QUANT_DP = 4


def quantize(scaled_sum: Column, value_scale: int, denom) -> Column:
    """Engine-portable 4-dp quantization of ``scaled_sum / scale / denom``.

    Never rounds an inexact decimal: the round() input is an exact
    integer ratio, whose only rounding boundaries are exactly
    representable halves — which Spark (BigDecimal HALF_UP) and e.g.
    DuckDB (half away from zero) treat identically.  Rounding the
    *divided* double instead trips on shortest-decimal-representation
    semantics (Spark rounds ``...749999996`` as its repr "…75").
    """
    n = 10 ** QUANT_DP
    if value_scale <= n:
        x = scaled_sum * float(n // value_scale) / denom
    else:
        x = scaled_sum / (float(value_scale // n) * denom)
    return F.round(x) / n


def bucket_dimension(df_or_spark, buckets: Buckets) -> DataFrame:
    """Generated dimension with one row per grid cell: (bucket_idx, start, end)."""
    spark = df_or_spark if not isinstance(df_or_spark, DataFrame) else df_or_spark.sparkSession
    return spark.range(buckets.count).select(
        F.col("id").alias("bucket_idx"),
        (F.lit(buckets.start) + F.col("id") * F.lit(buckets.step)).alias("start"),
        (F.lit(buckets.start) + (F.col("id") + 1) * F.lit(buckets.step)).alias("end"),
    )


def numeric_bucket_stats(
    df: DataFrame,
    buckets: Buckets,
    percentiles: Sequence[float] = (),
    value_col: str = "value",
    ts_col: str = "ts",
    group_cols: Sequence[str] = (),
    fill_empty: bool = True,
    approx: bool = False,
    value_scale: int | None = None,
) -> DataFrame:
    """A1: bucketed min/avg/median/max/sum/samples (+ percentiles).

    Output columns: ``group_cols… , start, end, min, avg, median, max,
    sum, samples, p<q>…`` — one row per (group, bucket), empty buckets
    present with null stats and ``samples = 0`` when ``fill_empty``.
    """
    group_cols = list(group_cols)
    in_bucket = df.filter(in_grid(buckets, ts_col)).withColumn(
        "bucket_idx", bucket_index(buckets, ts_col)
    )
    if fill_empty and not group_cols:
        # Grid fill WITHOUT a join: union one null-valued row per grid
        # cell into the same hash-agg (count ignores nulls → samples=0,
        # min/max/sum/percentiles → null — identical to the former
        # dim-left-join fill).  The join version costs an extra
        # broadcast-exchange stage per query, which at serving scale is
        # several times the aggregation itself; start/end are pure
        # projections of bucket_idx, no dimension table needed.
        zeros = df.sparkSession.range(buckets.count).select(
            F.col("id").alias("bucket_idx"),
            F.lit(None).cast("double").alias(value_col),
        )
        stats = (
            in_bucket.select(
                "bucket_idx", F.col(value_col).cast("double").alias(value_col)
            )
            .unionByName(zeros)
            .groupBy("bucket_idx")
            .agg(*_stat_aggs(value_col, percentiles, approx, value_scale))
        )
        return stats.select(
            (F.lit(buckets.start) + F.col("bucket_idx") * buckets.step)
            .alias("start"),
            (F.lit(buckets.start) + (F.col("bucket_idx") + 1) * buckets.step)
            .alias("end"),
            *[c for c in stats.columns if c != "bucket_idx"],
        )
    stats = in_bucket.groupBy(*group_cols, "bucket_idx").agg(
        *_stat_aggs(value_col, percentiles, approx, value_scale)
    )
    dim = bucket_dimension(df, buckets)
    if not fill_empty:
        return stats.join(F.broadcast(dim), "bucket_idx").drop("bucket_idx")

    # one full grid per observed group; the dim side is tiny → broadcast
    groups = df.select(*group_cols).distinct()
    dim = groups.crossJoin(F.broadcast(dim))
    filled = dim.join(stats, [*group_cols, "bucket_idx"], "left")
    return filled.withColumn("samples", F.coalesce(F.col("samples"), F.lit(0))).drop(
        "bucket_idx"
    )


def scalar_aggs(
    df: DataFrame,
    value_col: str = "value",
    group_cols: Sequence[str] = (),
    value_scale: int | None = None,
) -> DataFrame:
    """A6: whole-range min/max/avg/sum (+ samples) over one scan."""
    v = F.col(value_col).cast("double")
    if value_scale:
        scaled = F.sum(F.round(v * value_scale).cast("long"))
        sum_col = quantize(scaled, value_scale, 1).alias("sum")
        avg_col = quantize(scaled, value_scale, F.count(v)).alias("avg")
    else:
        sum_col = F.sum(v).alias("sum")
        avg_col = F.avg(v).alias("avg")
    aggs = [
        F.min(v).alias("min"),
        F.max(v).alias("max"),
        avg_col,
        sum_col,
        F.count(v).alias("samples"),
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def minmax_ts(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: Sequence[str] = ("tenant_id", "metric"),
) -> DataFrame:
    """A8: per-metric min/max timestamp (definition enrichment)."""
    return df.groupBy(*group_cols).agg(
        F.min(ts_col).alias("min_ts"),
        F.max(ts_col).alias("max_ts"),
        F.count(F.lit(1)).alias("samples"),
    )


def trimmed_bucket_stats(
    df: DataFrame,
    buckets: Buckets,
    trim_num: int = 1,
    trim_den: int = 10,
    value_col: str = "value",
    ts_col: str = "ts",
    value_scale: int = 100,
) -> DataFrame:
    """A14 (beyond reference): symmetric TRIMMED mean per bucket — the
    robust dashboard aggregate (a stuck gauge or one outlier sample
    cannot move it, unlike ``avg``).  Per bucket, the lowest and
    highest ``floor(n * trim_num / trim_den)`` samples are dropped and
    the remainder averaged; ``samples`` counts all points, ``n_kept``
    the surviving ones, ``t_min``/``t_max`` bound the kept range
    (winsorization bounds).

    Exactness: values quantize to ``value_scale`` integers; the trim
    count is integer arithmetic (``n * trim_num div trim_den``); kept
    values sum in LONG; the mean is the :func:`quantize` exact-ratio
    rounding — bit-identical cross-engine.  Ties at the trim boundary
    are value-ties, so ANY rank order among them keeps the same value
    multiset — the result does not depend on tie order.

    100 TB shape: ONE exchange — the rank window partitions by
    ``bucket_idx`` and the final hash-agg groups by the same key, so
    the planner reuses the window's partitioning (plan-asserted in
    tests).  No join, no dimension table: ``start``/``end`` are pure
    projections of the bucket index.
    """
    from pyspark.sql import Window

    if not 0 <= trim_num * 2 < trim_den:
        raise ValueError("trim fraction must be in [0, 0.5)")
    in_bucket = df.filter(in_grid(buckets, ts_col)).withColumn(
        "bucket_idx", bucket_index(buckets, ts_col)
    )
    v = F.round(F.col(value_col).cast("double") * value_scale).cast("long")
    w = Window.partitionBy("bucket_idx").orderBy(F.col("_v").asc(), F.col(ts_col).asc())
    wn = Window.partitionBy("bucket_idx")
    ranked = (
        in_bucket.select("bucket_idx", ts_col, v.alias("_v"))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
    )
    k = F.expr(f"(_n * {trim_num}) div {trim_den}")  # exact integer floor
    kept = (F.col("_rn") > k) & (F.col("_rn") <= F.col("_n") - k)
    agg = ranked.groupBy("bucket_idx").agg(
        F.count(F.lit(1)).alias("samples"),
        F.count(F.when(kept, 1)).alias("n_kept"),
        F.sum(F.when(kept, F.col("_v"))).alias("_ksum"),
        F.min(F.when(kept, F.col("_v"))).alias("_kmin"),
        F.max(F.when(kept, F.col("_v"))).alias("_kmax"),
    )
    return agg.select(
        (F.lit(buckets.start) + F.col("bucket_idx") * buckets.step).alias("start"),
        (F.lit(buckets.start) + (F.col("bucket_idx") + 1) * buckets.step).alias("end"),
        "samples",
        "n_kept",
        quantize(F.col("_ksum"), value_scale, F.col("n_kept")).alias("trimmed_avg"),
        (F.col("_kmin").cast("double") / value_scale).alias("t_min"),
        (F.col("_kmax").cast("double") / value_scale).alias("t_max"),
    )
