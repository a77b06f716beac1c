"""Rendering-oriented downsampling: min/max decimation, LTTB, and value
histograms.

A dashboard asking for "cpu over 30 days" cannot plot 2.6M raw points;
the reference serves bucketed stats (A1) for that, but chart-faithful
decimation keeps the SHAPE of the series — spikes and dips — which
avg-per-bucket flattens.  Three standard tools:

- :func:`minmax_downsample` — per (series, bucket) keep the actual
  min-value and max-value POINTS (earliest ts on ties).  Every vertical
  extreme survives; output ≤ 2 rows per bucket.  One hash aggregation
  (struct-min/max), no window, no shuffle beyond the bucket agg.
- :func:`lttb` — Largest-Triangle-Three-Buckets (Steinarsson 2013), the
  visually-optimal decimation dashboards use.  Inherently sequential
  (each pick depends on the previous pick), so it runs per-series in an
  Arrow batch (``applyInPandas``) — one shuffle on the series key, state
  is the series itself, vectorized numpy triangle areas inside.
- :func:`value_histogram` — fixed-bin value distribution per series
  (the "heatmap over time" backing store).  Pure JVM width-bucket
  arithmetic + one aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "minmax_downsample",
    "lttb",
    "value_histogram",
    "histogram_rollup",
    "histogram_quantile",
    "histogram_quantiles",
]


def minmax_downsample(
    points: DataFrame,
    bucket_ms: int,
    group_col: str = "metric",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per (series, ``bucket_ms`` bucket): the min-value point and the
    max-value point, as rows ``(metric, ts, value, kind)`` with kind in
    ('min','max').  Ties pick the earliest timestamp — deterministic.
    A bucket with one point yields both kinds at that point.

    One aggregation: min/max over a (value, ts) struct gives the
    arg-min/arg-max point without a window or self-join.
    """
    b = F.floor(F.col(ts_col) / bucket_ms) * bucket_ms
    # lexicographic struct min/max = arg-min/arg-max without a window;
    # the max struct negates ts so value ties pick the EARLIEST point on
    # both sides (a bare (v, t) max would pick the latest)
    lo_s = F.struct(F.col(value_col).alias("v"), F.col(ts_col).alias("t"))
    hi_s = F.struct(F.col(value_col).alias("v"), (-F.col(ts_col)).alias("nt"))
    agg = (
        points.select(
            F.col(group_col).alias("_g"), b.alias("_b"),
            lo_s.alias("_ls"), hi_s.alias("_hs"),
        )
        .groupBy("_g", "_b")
        .agg(F.min("_ls").alias("_lo"), F.max("_hs").alias("_hi"))
    )
    lo = agg.select(
        F.col("_g").alias(group_col),
        F.col("_b").alias("bucket_start"),
        F.col("_lo.t").alias(ts_col),
        F.col("_lo.v").alias(value_col),
        F.lit("min").alias("kind"),
    )
    hi = agg.select(
        F.col("_g").alias(group_col),
        F.col("_b").alias("bucket_start"),
        (-F.col("_hi.nt")).alias(ts_col),
        F.col("_hi.v").alias(value_col),
        F.lit("max").alias("kind"),
    )
    return lo.unionByName(hi)


def lttb_select(ts: np.ndarray, vals: np.ndarray, n_out: int) -> np.ndarray:
    """Pure-numpy LTTB index selection (the testable kernel).

    Returns the indices of the selected points, always including the
    first and last.  Buckets are equal-count partitions of the interior
    points; each pick maximizes the triangle area with the PREVIOUS pick
    and the NEXT bucket's centroid (Steinarsson's thesis, §4.2).
    """
    n = len(ts)
    if n_out >= n or n_out < 3:
        return np.arange(n) if n_out >= n else np.array([0, n - 1])
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    out = [0]
    a = 0
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        nlo, nhi = edges[i + 1], (edges[i + 2] if i + 2 < len(edges) else n)
        cx, cy = ts[nlo:nhi].mean(), vals[nlo:nhi].mean()
        ax, ay = ts[a], vals[a]
        # twice the triangle area for each candidate in this bucket
        areas = np.abs(
            (ax - cx) * (vals[lo:hi] - ay) - (ax - ts[lo:hi]) * (cy - ay)
        )
        a = lo + int(np.argmax(areas))
        out.append(a)
    out.append(n - 1)
    return np.asarray(out)


def lttb(
    points: DataFrame,
    n_out: int,
    group_col: str = "metric",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """LTTB-decimate each series to ``n_out`` points.

    One shuffle on the series key; each group is processed as a whole in
    an Arrow batch (a rendered series fits memory by definition — this
    is a chart-serving operator, decimating to ~1k points).  Output:
    ``(metric, ts, value)`` sorted per series.
    """
    schema = StructType(
        [
            StructField(group_col, StringType(), False),
            StructField(ts_col, LongType(), False),
            StructField(value_col, DoubleType(), True),
        ]
    )

    def _one(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = list(pdfs)
        pdf = pd.concat(parts) if len(parts) > 1 else parts[0]
        pdf = pdf.sort_values([ts_col, value_col]).reset_index(drop=True)
        idx = lttb_select(
            pdf[ts_col].to_numpy(dtype=np.float64),
            pdf[value_col].to_numpy(dtype=np.float64),
            n_out,
        )
        yield pdf.iloc[idx][[group_col, ts_col, value_col]]

    return (
        points.select(group_col, ts_col, value_col)
        .groupBy(group_col)
        .applyInPandas(_one, schema=schema)
    )


def value_histogram(
    points: DataFrame,
    lo: float,
    hi: float,
    n_bins: int,
    group_col: str = "metric",
    value_col: str = "value",
) -> DataFrame:
    """Fixed-bin value distribution per series over [lo, hi): bin i
    covers ``[lo + i*w, lo + (i+1)*w)``; values outside clamp into the
    first/last bin (the heatmap convention).  Output: ``(metric, bin,
    bin_lo, count)`` for non-empty bins.

    Integer-exact binning: the bin index is floor((v - lo) / w) computed
    identically in any engine; one aggregation, map-side combinable.
    """
    if n_bins < 1 or not hi > lo:
        raise ValueError("need n_bins >= 1 and hi > lo")
    w = (hi - lo) / n_bins
    raw = F.floor((F.col(value_col) - lo) / w)
    bin_i = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")
    return (
        points.select(F.col(group_col).alias(group_col), bin_i.alias("bin"))
        .groupBy(group_col, "bin")
        .agg(F.count(F.lit(1)).alias("count"))
        .withColumn("bin_lo", F.lit(lo) + F.col("bin") * F.lit(w))
        .select(group_col, "bin", "bin_lo", "count")
    )


def histogram_rollup(
    points: DataFrame,
    slice_ms: int,
    lo: float,
    hi: float,
    n_bins: int,
    group_col: str | list[str] = "metric",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-(series, slice) fixed-bin histogram partials — the MERGEABLE
    state behind rank statistics at scale (the Prometheus native-
    histogram idea): written once per slice at compaction time, any
    coarser range's quantiles are then answered from #slices × #bins
    integer rows, never the raw points.  ``group_col`` may be a list
    (e.g. ``["tenant_id", "metric"]`` for a store-level rollup).
    Output: ``(*group_cols, slice_start, bin, count)``."""
    if n_bins < 1 or not hi > lo:
        raise ValueError("need n_bins >= 1 and hi > lo")
    gcols = [group_col] if isinstance(group_col, str) else list(group_col)
    w = (hi - lo) / n_bins
    s = F.floor(F.col(ts_col) / slice_ms) * slice_ms
    raw = F.floor((F.col(value_col) - lo) / w)
    bin_i = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")
    return (
        points.select(
            *gcols, s.alias("slice_start"), bin_i.alias("bin")
        )
        .groupBy(*gcols, "slice_start", "bin")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def histogram_quantile(
    hists: DataFrame,
    grain_ms: int,
    q: float,
    lo: float,
    hi: float,
    n_bins: int,
    group_col: str | list[str] = "metric",
) -> DataFrame:
    """Quantile estimate per (series, ``grain_ms`` bucket) from
    :func:`histogram_rollup` partials: merge slice histograms into the
    coarser bucket (one integer sum), then linearly interpolate inside
    the bin where the cumulative count crosses ``q × total`` —
    ``histogram_quantile()`` semantics.  Error is bounded by the bin
    width; every arithmetic step is a fixed IEEE op over exact integer
    counts, so estimates are engine-identical.  ``group_col`` may be a
    list.  Output: ``(*group_cols, bucket_start, total, qvalue)``.

    Single-quantile form of :func:`histogram_quantiles` (one shared
    implementation — the cumulative pass and interpolation cannot
    diverge between the two entry points)."""
    return histogram_quantiles(
        hists, grain_ms, [q], ["qvalue"], lo, hi, n_bins, group_col=group_col
    )


def histogram_quantiles(
    hists: DataFrame,
    grain_ms: int,
    qs: Sequence[float],
    names: Sequence[str],
    lo: float,
    hi: float,
    n_bins: int,
    group_col: str | list[str] = "metric",
) -> DataFrame:
    """Multi-quantile :func:`histogram_quantile` in ONE pass: the
    bin-merge and cumulative window run once, every quantile's crossing
    bin is found by exploding the (tiny, literal) quantile array against
    the cumulative rows, and a single conditional aggregation pivots the
    estimates wide.  N quantiles cost one aggregation + one window pass
    + one final groupBy instead of N of each (the
    ``percentile_impl='hist'`` serving path asks for 3-4 at once).
    Output: ``(*group_cols, bucket_start, total, <names...>)``."""
    if len(qs) != len(names) or not qs:
        raise ValueError("qs and names must align and be non-empty")
    for q in qs:
        if not 0 < q <= 1:
            raise ValueError("each q must be in (0, 1]")
    from pyspark.sql import Window

    gcols = [group_col] if isinstance(group_col, str) else list(group_col)
    w = (hi - lo) / n_bins
    b = F.floor(F.col("slice_start") / grain_ms) * grain_ms
    merged = (
        hists.select(*gcols, b.alias("bucket_start"), "bin", "count")
        .groupBy(*gcols, "bucket_start", "bin")
        .agg(F.sum("count").alias("_c"))
    )
    win = Window.partitionBy(*gcols, "bucket_start").orderBy("bin")
    tot = Window.partitionBy(*gcols, "bucket_start")
    cur = (
        merged.withColumn("_cum", F.sum("_c").over(win))
        .withColumn("_total", F.sum("_c").over(tot))
        .withColumn("_prev", F.col("_cum") - F.col("_c"))
    )
    ex = cur.withColumn(
        "_q", F.explode(F.array(*[F.lit(float(q)) for q in qs]))
    ).withColumn("_target", F.col("_q") * F.col("_total"))
    picked = ex.filter(
        (F.col("_cum") >= F.col("_target")) & (F.col("_prev") < F.col("_target"))
    )
    est = (
        F.lit(lo)
        + F.col("bin") * F.lit(w)
        + F.lit(w) * (F.col("_target") - F.col("_prev")) / F.col("_c")
    )
    return picked.groupBy(*gcols, "bucket_start").agg(
        F.first("_total").alias("total"),
        *[
            F.max(F.when(F.col("_q") == float(q), est)).alias(name)
            for q, name in zip(qs, names)
        ],
    )
