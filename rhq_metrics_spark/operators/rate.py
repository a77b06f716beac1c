"""W1: per-minute rate derivation over adjacent point pairs.

Reference: MetricsServiceImpl.findRateData (MetricsServiceImpl.java:857-883):

- pairs are adjacent points in ascending-time order (``buffer(2,1)``;
  a DESC read reverses each pair back to ascending before computing, so
  the rate *values* are order-independent — only emission order and the
  ``limit`` cutoff differ);
- ``rate = 60_000 * (v2 - v1) / (t2 - t1)`` (per-minute), stamped at the
  later timestamp ``t2``;
- counter pairs where the value decreased (counter reset) are dropped
  *before* the limit is applied (limit cannot be pushed into the scan —
  same deferral as the reference's ``take`` at the end);
- ``findRateStats`` = rate ∘ A1 bucket stats (MetricsServiceImpl.java:892-899).

Spark-first: ``lag`` over ``Window.partitionBy(series).orderBy(ts)`` —
a single shuffle by series key, no self-join.  At scale the window's
sort is per-series and spills; series keys are high-cardinality so the
shuffle is well spread.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from rhq_metrics_spark.model import Buckets, MetricType
from rhq_metrics_spark.operators.stats import numeric_bucket_stats


def rate(
    df: DataFrame,
    metric_type: str = MetricType.GAUGE,
    value_col: str = "value",
    ts_col: str = "ts",
    group_cols: Sequence[str] = ("tenant_id", "metric"),
    order: str = "asc",
    limit: int = 0,
) -> DataFrame:
    """Per-minute rate between adjacent points of each series.

    Output: ``group_cols… , ts, rate`` (ts = later point of the pair).
    """
    if metric_type not in (MetricType.GAUGE, MetricType.COUNTER):
        raise ValueError(f"unsupported metric type for rate: {metric_type}")
    group_cols = list(group_cols)
    w = Window.partitionBy(*group_cols).orderBy(F.col(ts_col).asc())
    v = F.col(value_col).cast("double")
    paired = df.select(
        *group_cols,
        F.col(ts_col).alias("ts"),
        v.alias("_v"),
        F.lag(v).over(w).alias("_prev_v"),
        F.lag(F.col(ts_col)).over(w).alias("_prev_ts"),
    ).filter(F.col("_prev_ts").isNotNull())
    if metric_type == MetricType.COUNTER:
        # counter reset: drop pairs where the value decreased
        # (MetricsServiceImpl.java:871-872)
        paired = paired.filter(F.col("_v") >= F.col("_prev_v"))
    out = paired.select(
        *group_cols,
        "ts",
        (
            F.lit(60_000.0)
            * (F.col("_v") - F.col("_prev_v"))
            / (F.col("ts") - F.col("_prev_ts")).cast("double")
        ).alias("rate"),
    )
    ordered = out.orderBy(
        F.col("ts").asc() if order == "asc" else F.col("ts").desc()
    )
    return ordered.limit(limit) if limit and limit > 0 else ordered


def rate_stats(
    df: DataFrame,
    buckets: Buckets,
    metric_type: str = MetricType.GAUGE,
    percentiles: Sequence[float] = (),
    group_cols: Sequence[str] = ("tenant_id", "metric"),
    stats_group_cols: Sequence[str] = (),
    fill_empty: bool = True,
) -> DataFrame:
    """W1 ∘ A1: bucketed stats over the derived rate stream."""
    rates = rate(df, metric_type=metric_type, group_cols=group_cols)
    return numeric_bucket_stats(
        rates,
        buckets,
        percentiles=percentiles,
        value_col="rate",
        group_cols=stats_group_cols,
        fill_empty=fill_empty,
    )


def bucket_increase(
    df: DataFrame,
    bucket_ms: int,
    value_scale: int = 100,
    value_col: str = "value",
    ts_col: str = "ts",
    group_cols: Sequence[str] = ("metric",),
    counter: bool = True,
) -> DataFrame:
    """W7: per-(series, bucket) ``increase`` / ``delta`` over adjacent
    pairs — the windowed companion to :func:`rate` (Prometheus-style
    ``increase()``/``delta()`` at a fixed grid).

    Each adjacent pair contributes ``v2 - v1`` stamped at the LATER
    point's bucket (the same convention rate uses).  ``counter=True``
    treats a decrease as a counter reset and contributes ``v2`` — the
    restarted counter's accumulation since reset (Prometheus increase
    semantics); ``counter=False`` is plain delta, resets included as
    negative contributions.

    Determinism: contributions are quantized to ``value_scale``
    integers, so the per-bucket SUM is exact long arithmetic —
    order-independent across partitions and engines; the output divides
    once at the end.  One shuffle on the series key (lag window), then a
    map-side-combinable aggregation.

    Output: ``(group_cols..., bucket_start, n_pairs, increase)``.
    """
    gcols = list(group_cols)
    v = F.round(F.col(value_col) * value_scale).cast("long")
    # tie-break equal timestamps on the quantized value so the pairing
    # is total-ordered and engine-identical
    w = Window.partitionBy(*gcols).orderBy(F.col("_t").asc(), F.col("_v").asc())
    cur = df.select(
        *gcols,
        F.col(ts_col).alias("_t"),
        v.alias("_v"),
    ).withColumn("_pv", F.lag("_v").over(w))
    pair = cur.filter(F.col("_pv").isNotNull())
    if counter:
        contrib = F.when(
            F.col("_v") >= F.col("_pv"), F.col("_v") - F.col("_pv")
        ).otherwise(F.col("_v"))
    else:
        contrib = F.col("_v") - F.col("_pv")
    b = F.floor(F.col("_t") / bucket_ms) * bucket_ms
    return (
        pair.select(*gcols, b.alias("bucket_start"), contrib.alias("_c"))
        .groupBy(*gcols, "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (F.sum("_c") / float(value_scale)).alias("increase"),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    bucket_ms: int,
    value_scale: int = 100,
    value_col: str = "value",
    ts_col: str = "ts",
    group_cols: Sequence[str] = ("metric",),
    max_gap_ms: int | None = None,
) -> DataFrame:
    """A12: time-weighted average per (series, bucket) — the correct
    mean under IRREGULAR sampling, where the plain avg over-weights
    bursts of closely-spaced points.  Each adjacent pair contributes its
    earlier value held for the pair's duration (left-continuous step
    interpolation, the Prometheus/RRD convention), stamped into the
    LATER point's bucket like :func:`rate`; pairs further apart than
    ``max_gap_ms`` are dropped (a series that went silent shouldn't
    smear its last value across the gap).

    Determinism: weights are exact integer millis, values exact
    ``value_scale`` integers, and each pair's product is formed as
    decimal(18,0)×decimal(18,0) → exact decimal(37,0) (operands cast
    BEFORE multiplying so nothing wraps; exact for any |scaled value|
    and |gap| under 1e18) — the per-bucket sums are order-independent,
    and the single final division is one IEEE op.  One lag window + one
    aggregation.  Output: ``(group..., bucket_start, n_pairs, held_ms,
    twa)``.
    """
    gcols = list(group_cols)
    v = F.round(F.col(value_col) * value_scale).cast("long")
    w = Window.partitionBy(*gcols).orderBy(F.col("_t").asc(), F.col("_v").asc())
    cur = (
        df.select(*gcols, F.col(ts_col).alias("_t"), v.alias("_v"))
        .withColumn("_pv", F.lag("_v").over(w))
        .withColumn("_pt", F.lag("_t").over(w))
    )
    pair = cur.filter(F.col("_pv").isNotNull() & (F.col("_t") > F.col("_pt")))
    if max_gap_ms is not None:
        pair = pair.filter(F.col("_t") - F.col("_pt") <= max_gap_ms)
    dt = F.col("_t") - F.col("_pt")
    b = F.floor(F.col("_t") / bucket_ms) * bucket_ms
    contrib = F.col("_pv").cast("decimal(18,0)") * dt.cast("decimal(18,0)")
    return (
        pair.select(
            *gcols, b.alias("bucket_start"),
            contrib.alias("_c"), dt.alias("_dt"),
        )
        .groupBy(*gcols, "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("_dt").alias("held_ms"),
            (
                F.sum(F.col("_c")).cast("double")
                / (F.sum("_dt") * float(value_scale))
            ).alias("twa"),
        )
    )


def increase_rollup(
    df: DataFrame,
    slice_ms: int,
    value_scale: int = 100,
    value_col: str = "value",
    ts_col: str = "ts",
    group_cols: Sequence[str] = ("metric",),
    counter: bool = True,
) -> DataFrame:
    """Per-(series, slice) MERGEABLE partials for :func:`bucket_increase`
    — the Prometheus chunk-meta trick, EXACT rather than approximate:
    store each slice's boundary points plus its internal pair sum, and
    any coarser bucket's increase() is recovered by adding the
    boundary-pair contributions between consecutive present slices
    (:func:`increase_from_rollup`).  Written once per closed slice
    (compaction time), a year-long increase() query then reads
    #slices rows per series instead of raw points.

    Contributions are quantized to ``value_scale`` integers (the
    :func:`bucket_increase` convention), so partial sums merge with
    exact long arithmetic — order- and partitioning-independent.
    ``counter`` must match between rollup and merge.

    Output: ``(group_cols..., slice_start, f_ts, f_v, l_ts, l_v,
    inc, n_pairs)`` with f/l the slice's first/last (ts, quantized
    value) in the rate operator's total order.
    """
    gcols = list(group_cols)
    v = F.round(F.col(value_col) * value_scale).cast("long")
    w = Window.partitionBy(*gcols, "slice_start").orderBy(
        F.col("_t").asc(), F.col("_v").asc()
    )
    cur = df.select(
        *gcols,
        (F.floor(F.col(ts_col) / slice_ms) * slice_ms).alias("slice_start"),
        F.col(ts_col).alias("_t"),
        v.alias("_v"),
    ).withColumn("_pv", F.lag("_v").over(w))
    if counter:
        contrib = F.when(
            F.col("_v") >= F.col("_pv"), F.col("_v") - F.col("_pv")
        ).otherwise(F.col("_v"))
    else:
        contrib = F.col("_v") - F.col("_pv")
    return cur.groupBy(*gcols, "slice_start").agg(
        F.min(F.struct("_t", "_v")).alias("_f"),
        F.max(F.struct("_t", "_v")).alias("_l"),
        F.coalesce(
            F.sum(F.when(F.col("_pv").isNotNull(), contrib)), F.lit(0)
        ).alias("inc"),
        F.count("_pv").alias("n_pairs"),
    ).select(
        *gcols,
        "slice_start",
        F.col("_f._t").alias("f_ts"),
        F.col("_f._v").alias("f_v"),
        F.col("_l._t").alias("l_ts"),
        F.col("_l._v").alias("l_v"),
        "inc",
        "n_pairs",
    )


def increase_from_rollup(
    partials: DataFrame,
    bucket_ms: int,
    slice_ms: int,
    value_scale: int = 100,
    group_cols: Sequence[str] = ("metric",),
    counter: bool = True,
) -> DataFrame:
    """EXACT per-bucket increase() from :func:`increase_rollup`
    partials: one lag over the (tiny) per-slice rows adds the
    boundary pair between consecutive PRESENT slices — stamped, like
    every pair, at the later point's bucket — and a sum merges.
    Bit-identical to :func:`bucket_increase` over the raw points when
    ``bucket_ms`` is a multiple of ``slice_ms`` (tested), because the
    quantized-integer partial sums make addition order irrelevant.
    Output: ``(group_cols..., bucket_start, n_pairs, increase)``.
    """
    if bucket_ms % slice_ms != 0:
        raise ValueError(
            f"bucket_ms {bucket_ms} must be a multiple of slice_ms {slice_ms}"
        )
    gcols = list(group_cols)
    w = Window.partitionBy(*gcols).orderBy("slice_start")
    cur = partials.withColumn("_plv", F.lag("l_v").over(w))
    if counter:
        boundary = F.when(
            F.col("f_v") >= F.col("_plv"), F.col("f_v") - F.col("_plv")
        ).otherwise(F.col("f_v"))
    else:
        boundary = F.col("f_v") - F.col("_plv")
    b = F.floor(F.col("slice_start") / bucket_ms) * bucket_ms
    return (
        cur.select(
            *gcols,
            b.alias("bucket_start"),
            (
                F.col("inc")
                + F.coalesce(
                    F.when(F.col("_plv").isNotNull(), boundary), F.lit(0)
                )
            ).alias("_c"),
            (
                F.col("n_pairs")
                + F.when(F.col("_plv").isNotNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("_np"),
        )
        .groupBy(*gcols, "bucket_start")
        .agg(
            F.sum("_np").alias("n_pairs"),
            (F.sum("_c") / float(value_scale)).alias("increase"),
        )
        .filter(F.col("n_pairs") > 0)
    )


def twa_rollup(
    df: DataFrame,
    slice_ms: int,
    value_scale: int = 100,
    value_col: str = "value",
    ts_col: str = "ts",
    group_cols: Sequence[str] = ("metric",),
    max_gap_ms: int | None = None,
) -> DataFrame:
    """Per-(series, slice) MERGEABLE partials for
    :func:`time_weighted_avg` — same chunk-meta scheme as
    :func:`increase_rollup`: boundary points + the slice's internal
    exact-decimal weighted sum and held duration; the boundary pair's
    hold (earlier value held to the next slice's first point) is added
    at merge time.  ``value_scale`` / ``max_gap_ms`` must match between
    rollup and merge.  Output: ``(group_cols..., slice_start, f_ts, f_v,
    l_ts, l_v, wsum, held_ms, n_pairs)``."""
    gcols = list(group_cols)
    v = F.round(F.col(value_col) * value_scale).cast("long")
    w = Window.partitionBy(*gcols, "slice_start").orderBy(
        F.col("_t").asc(), F.col("_v").asc()
    )
    cur = (
        df.select(
            *gcols,
            (F.floor(F.col(ts_col) / slice_ms) * slice_ms).alias("slice_start"),
            F.col(ts_col).alias("_t"),
            v.alias("_v"),
        )
        .withColumn("_pv", F.lag("_v").over(w))
        .withColumn("_pt", F.lag("_t").over(w))
    )
    ok = F.col("_pv").isNotNull() & (F.col("_t") > F.col("_pt"))
    if max_gap_ms is not None:
        ok = ok & (F.col("_t") - F.col("_pt") <= max_gap_ms)
    dt = F.when(ok, F.col("_t") - F.col("_pt")).otherwise(F.lit(0))
    contrib = F.when(
        ok,
        F.col("_pv").cast("decimal(18,0)")
        * (F.col("_t") - F.col("_pt")).cast("decimal(18,0)"),
    ).otherwise(F.lit(0).cast("decimal(37,0)"))
    return cur.groupBy(*gcols, "slice_start").agg(
        F.min(F.struct("_t", "_v")).alias("_f"),
        F.max(F.struct("_t", "_v")).alias("_l"),
        F.sum(contrib).alias("wsum"),
        F.sum(dt).alias("held_ms"),
        F.sum(F.when(ok, 1).otherwise(0)).alias("n_pairs"),
    ).select(
        *gcols,
        "slice_start",
        F.col("_f._t").alias("f_ts"),
        F.col("_f._v").alias("f_v"),
        F.col("_l._t").alias("l_ts"),
        F.col("_l._v").alias("l_v"),
        "wsum",
        "held_ms",
        "n_pairs",
    )


def twa_from_rollup(
    partials: DataFrame,
    bucket_ms: int,
    slice_ms: int,
    value_scale: int = 100,
    group_cols: Sequence[str] = ("metric",),
    max_gap_ms: int | None = None,
) -> DataFrame:
    """EXACT :func:`time_weighted_avg` from :func:`twa_rollup` partials:
    one lag over per-slice rows adds each boundary pair's hold (the
    previous slice's last value held until this slice's first point,
    stamped at the later bucket), then integer/decimal sums merge —
    bit-identical to the batch operator when ``bucket_ms`` is a
    multiple of ``slice_ms`` (tested).  Output: ``(group_cols...,
    bucket_start, n_pairs, held_ms, twa)``."""
    if bucket_ms % slice_ms != 0:
        raise ValueError(
            f"bucket_ms {bucket_ms} must be a multiple of slice_ms {slice_ms}"
        )
    gcols = list(group_cols)
    w = Window.partitionBy(*gcols).orderBy("slice_start")
    cur = (
        partials.withColumn("_plv", F.lag("l_v").over(w))
        .withColumn("_plt", F.lag("l_ts").over(w))
    )
    bdt_raw = F.col("f_ts") - F.col("_plt")
    bok = F.col("_plt").isNotNull() & (bdt_raw > 0)
    if max_gap_ms is not None:
        bok = bok & (bdt_raw <= max_gap_ms)
    bdt = F.when(bok, bdt_raw).otherwise(F.lit(0))
    bcontrib = F.when(
        bok,
        F.col("_plv").cast("decimal(18,0)") * bdt_raw.cast("decimal(18,0)"),
    ).otherwise(F.lit(0).cast("decimal(37,0)"))
    b = F.floor(F.col("slice_start") / bucket_ms) * bucket_ms
    return (
        cur.select(
            *gcols,
            b.alias("bucket_start"),
            (F.col("wsum") + bcontrib).alias("_c"),
            (F.col("held_ms") + bdt).alias("_h"),
            (F.col("n_pairs") + F.when(bok, 1).otherwise(0)).alias("_np"),
        )
        .groupBy(*gcols, "bucket_start")
        .agg(
            F.sum("_np").alias("n_pairs"),
            F.sum("_h").alias("held_ms"),
            (
                F.sum("_c").cast("double")
                / (F.sum("_h") * float(value_scale))
            ).alias("twa"),
        )
        .filter(F.col("n_pairs") > 0)
    )
