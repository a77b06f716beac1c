"""Cross-series analytics: pairwise correlation and per-series linear
trend/forecast.

The reference engine stops at per-metric and multi-metric *stats*
(MetricsServiceImpl.findNumericStats — see SURVEY.md §2.4); which
metrics move together, and where a metric is heading, are the queries
its users run one layer up (alerting baselines, capacity planning).
Both operators here are single-aggregation closed forms — no iteration,
no UDFs — so Catalyst plans them as one scan + one or two shuffles at
any scale.

Determinism contract (the repo-wide oracle convention): raw values are
fixed-point quantized (``value_scale``) so every accumulated sum is an
exact integer carried in ``decimal(38,0)`` — order-independent across
partitions and engines.  The closed-form ratio is evaluated in double
from those exact integers, and the output is floor-quantized, never
round()ed, so no shortest-decimal-representation divergence is
possible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["metric_correlation", "linear_trend"]

DEC = "decimal(38,0)"


def _scaled(value_col: str, value_scale: int) -> Column:
    return F.round(F.col(value_col) * value_scale).cast("long")


def _floorq(x: Column, dp: int) -> Column:
    """Floor-based fixed-point quantization: exact-integer inputs aside,
    floor only disagrees between engines on exact integers — which are
    exactly representable, hence identical — unlike round(), whose
    half-way semantics differ (Spark rounds the shortest decimal repr,
    DuckDB the binary value)."""
    p = float(10**dp)
    return F.floor(x * p) / p


def metric_correlation(
    points: DataFrame,
    bucket_ms: int,
    group_col: str = "metric",
    ts_col: str = "ts",
    value_col: str = "value",
    value_scale: int = 100,
    min_overlap: int = 3,
) -> DataFrame:
    """Pairwise Pearson correlation between series, aligned on
    ``bucket_ms`` tumbling buckets of the per-bucket SUM.

    Plan shape: one scan → bucket aggregation (shuffle on
    ``(group, bucket)``, map-side partials absorb the raw volume) →
    self-join on bucket → one aggregation per pair.  The join fans out
    M·(M-1)/2 rows **per bucket** for M series — quadratic in the series
    count, linear in time, the right shape for the curated metric sets
    multi-metric queries take (the reference caps these the same way its
    stats/query endpoint takes an explicit id list).  At 1000 executors
    the bucket join is an even hash shuffle on ``_b``; no key skew is
    possible because every bucket holds ≤ M rows.

    All accumulations are exact: per-bucket sums are ``value_scale``
    integers, pair sums (Σx, Σy, Σxy, Σx², Σy²) are decimal(38,0), and
    Pearson r is computed in double from those exact integers —
    bit-identical on any engine and any partitioning.  Output:
    ``(metric_a, metric_b, n_buckets, corr)`` with corr floor-quantized
    to 6 dp; pairs with fewer than ``min_overlap`` shared buckets or a
    constant side (zero variance) are dropped.
    """
    b = F.floor(F.col(ts_col) / bucket_ms) * bucket_ms
    per_bucket = (
        points.select(
            F.col(group_col).alias("_g"),
            b.alias("_b"),
            _scaled(value_col, value_scale).alias("_x"),
        )
        .groupBy("_g", "_b")
        .agg(F.sum("_x").alias("_x"))
    )
    # self-join via aliases of the SAME plan so canonicalization lets
    # ReuseExchange serve both sides from one bucket aggregation
    a, bb = per_bucket.alias("a"), per_bucket.alias("b")
    pairs = (
        a.join(bb, F.col("a._b") == F.col("b._b"))
        .filter(F.col("a._g") < F.col("b._g"))
        .select(
            F.col("a._g").alias("metric_a"),
            F.col("b._g").alias("metric_b"),
            F.col("a._x").alias("_xa"),
            F.col("b._x").alias("_xb"),
        )
    )
    agg = pairs.groupBy("metric_a", "metric_b").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_xa").cast(DEC)).alias("_sx"),
        F.sum(F.col("_xb").cast(DEC)).alias("_sy"),
        # cast BEFORE multiplying: a long×long product of two big bucket
        # sums would wrap silently; decimal(18)×decimal(18) → decimal(37)
        # stays exact for any |bucket sum| < 1e18
        F.sum(F.col("_xa").cast("decimal(18,0)") * F.col("_xb").cast("decimal(18,0)")).alias("_sxy"),
        F.sum(F.col("_xa").cast("decimal(18,0)") * F.col("_xa").cast("decimal(18,0)")).alias("_sxx"),
        F.sum(F.col("_xb").cast("decimal(18,0)") * F.col("_xb").cast("decimal(18,0)")).alias("_syy"),
    )
    n = F.col("_n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    num = n * sxy - sx * sy
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    return (
        agg.filter(F.col("_n") >= min_overlap)
        .withColumn("_den", den)
        .filter(F.col("_den") > 0)
        .select(
            "metric_a",
            "metric_b",
            F.col("_n").alias("n_buckets"),
            _floorq(num / F.col("_den"), 6).alias("corr"),
        )
    )


def linear_trend(
    points: DataFrame,
    bucket_ms: int,
    horizon_buckets: int = 24,
    group_col: str = "metric",
    ts_col: str = "ts",
    value_col: str = "value",
    value_scale: int = 100,
) -> DataFrame:
    """Per-series least-squares trend of the bucketed sums, plus the
    extrapolated value ``horizon_buckets`` past each series' last bucket
    (the capacity-planning read: "where is this metric in a day?").

    Closed form — slope = (nΣtx − ΣtΣx) / (nΣt² − (Σt)²) over bucket
    index t (small ints, so every accumulator is an exact integer in
    decimal(38,0)).  One scan, two aggregations, zero joins; identical
    plan at any scale.  Output: ``(metric, n_buckets, slope_per_bucket,
    intercept, forecast)`` — slope/intercept/forecast in original value
    units, floor-quantized to 4 dp; single-bucket series are dropped
    (no slope).  t is the bucket index relative to each series' first
    bucket, keeping Σt² small and the intercept interpretable as the
    fitted value at the series' start.
    """
    b = F.floor(F.col(ts_col) / bucket_ms)
    per_bucket = (
        points.select(
            F.col(group_col).alias("_g"),
            b.alias("_t"),
            _scaled(value_col, value_scale).alias("_x"),
        )
        .groupBy("_g", "_t")
        .agg(F.sum("_x").alias("_x"))
    )
    # per-series first bucket via a window over the same _g partitioning
    # the final aggregation needs — one scan, and Catalyst plans the agg
    # shuffle-free on the window's exchange (vs. a second scan + join
    # for a groupBy-min variant)
    from pyspark.sql import Window

    w0 = Window.partitionBy("_g")
    rel = per_bucket.select(
        "_g",
        (F.col("_t") - F.min("_t").over(w0)).alias("_t"),
        "_x",
    )
    agg = rel.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_n"),
        F.max("_t").alias("_tmax"),
        F.sum(F.col("_t").cast(DEC)).alias("_st"),
        F.sum(F.col("_x").cast(DEC)).alias("_sx"),
        F.sum(F.col("_t").cast("decimal(18,0)") * F.col("_x").cast("decimal(18,0)")).alias("_stx"),
        F.sum(F.col("_t").cast("decimal(18,0)") * F.col("_t").cast("decimal(18,0)")).alias("_stt"),
    )
    n = F.col("_n").cast("double")
    st, sx = F.col("_st").cast("double"), F.col("_sx").cast("double")
    stx, stt = F.col("_stx").cast("double"), F.col("_stt").cast("double")
    den = n * stt - st * st
    slope = (n * stx - st * sx) / den
    intercept = (sx - slope * st) / n
    forecast = intercept + slope * (F.col("_tmax") + horizon_buckets)
    return (
        agg.filter(F.col("_n") >= 2)
        .select(
            F.col("_g").alias(group_col),
            F.col("_n").alias("n_buckets"),
            _floorq(slope / value_scale, 4).alias("slope_per_bucket"),
            _floorq(intercept / value_scale, 4).alias("intercept"),
            _floorq(forecast / value_scale, 4).alias("forecast"),
        )
    )
