"""Rolling z-score anomaly detection over ordered per-series points.

Monitoring-side analytics the reference leaves to its consumers
(hawkular-alerts evaluated conditions point-at-a-time over the REST
stream); expressed here as pure window aggregation so it runs inside
whole-stage codegen at any scale: ONE shuffle on the series key, then
each row's trailing-window mean/std come from frame aggregates over the
previous ``window_n`` points — no Python, no state store.

The variance is computed from explicit sum / sum-of-squares rather than
``stddev`` so the arithmetic is a fixed sequence of IEEE ops: with
integer-quantized inputs (the oracled query feeds value*10000 longs)
every intermediate is exact and the final doubles are bit-identical
across engines (same trick as BM25's integer idf, text.py).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def rolling_zscore(
    df: DataFrame,
    on: Sequence[str],
    order: Sequence[str],
    value_col: str = "value",
    window_n: int = 20,
    min_n: int = 5,
    threshold: float = 3.0,
) -> DataFrame:
    """Add ``base_mean``, ``base_std``, ``z`` (rounded to 4) and
    ``is_anomaly`` columns; the baseline frame is the ``window_n``
    points strictly BEFORE the current one (so a spike doesn't inflate
    its own baseline).  Rows with fewer than ``min_n`` trailing points
    or zero variance get null z / false flag.
    """
    on, order = list(on), list(order)
    w = (
        Window.partitionBy(*on)
        .orderBy(*[F.col(c).asc() for c in order])
        .rowsBetween(-window_n, -1)
    )
    v = F.col(value_col).cast("double")
    n = F.count(value_col).over(w)
    s = F.sum(v).over(w)
    sq = F.sum(v * v).over(w)
    mean = s / n
    # population variance of the trailing frame; max(0) soaks the tiny
    # negative residue exact-integer inputs never produce but doubles can
    var = F.greatest(sq / n - mean * mean, F.lit(0.0))
    # empty frame → null std (greatest ignores the null difference and
    # would otherwise report a spurious 0.0 baseline spread)
    std = F.when(n > 0, F.sqrt(var))
    z = F.when((n >= min_n) & (std > 0), (v - mean) / std)
    out = (
        df.withColumn("base_mean", F.round(mean, 4))
        .withColumn("base_std", F.round(std, 4))
        .withColumn("z", F.round(z, 4))
    )
    return out.withColumn(
        "is_anomaly",
        F.coalesce(F.abs(F.col("z")) > F.lit(threshold), F.lit(False)),
    )


def rolling_quantile(
    df: DataFrame,
    on: Sequence[str],
    order: Sequence[str],
    value_col: str,
    q: float = 0.5,
    window_n: int = 20,
    min_n: int = 1,
    out_col: str = "rolling_q",
) -> DataFrame:
    """W8: exact trailing-window quantile per series — the ROBUST
    baseline companion to :func:`rolling_zscore` (a rolling median
    shrugs off the very outliers a rolling mean chases).

    Spark evaluates ``percentile`` as a true window aggregate, so this
    is one shuffle on the series key and an O(window_n) per-row frame —
    no self-join, no applyInPandas.  Rows with fewer than ``min_n``
    frame members get null.  For cross-engine determinism use
    integer-quantized values with ``q=0.5``: the median interpolation
    ``(a+b)/2`` over exact integers is bit-identical regardless of each
    engine's interpolation expression shape; non-dyadic q over raw
    doubles may differ in the last ulp between engines.
    """
    if not 0 < q < 1:
        raise ValueError("q must be in (0, 1)")
    w = (
        Window.partitionBy(*on)
        .orderBy(*[F.col(c).asc() for c in order])
        .rowsBetween(-(window_n - 1), 0)
    )
    cnt = F.count(value_col).over(w)
    rq = F.percentile(F.col(value_col), F.lit(q)).over(w)
    return df.withColumn(out_col, F.when(cnt >= min_n, rq))


def ewma_weights(window_n: int, alpha_num: int, alpha_den: int) -> list[int]:
    """Integer-scaled truncated EWMA weights: ``w_j ∝ α(1-α)^j`` for the
    ``window_n`` most recent points, scaled by ``alpha_den**(window_n-1)``
    so every weight is an exact integer (``α = alpha_num/alpha_den``)."""
    if not 0 < alpha_num < alpha_den:
        raise ValueError("alpha must satisfy 0 < alpha_num/alpha_den < 1")
    # The weight scale alpha_den**(window_n-1) must stay inside the 2^53
    # exact-double budget the bit-identity contract (and the streaming
    # twin's Python-int replay) depends on; beyond int64 F.lit would fail
    # outright.  Fail loudly instead of relying on the docstring.
    if alpha_den ** (window_n - 1) * window_n > 2**53:
        raise ValueError(
            f"ewma weights overflow the exact budget: alpha_den**"
            f"(window_n-1)*window_n = {alpha_den}**{window_n - 1}*"
            f"{window_n} > 2**53; shrink window_n or alpha_den"
        )
    rest = alpha_den - alpha_num
    return [
        alpha_num * rest**j * alpha_den ** (window_n - 1 - j)
        for j in range(window_n)
    ]


def ewma_smooth(
    df: DataFrame,
    on: Sequence[str],
    order: Sequence[str],
    value_col: str = "value",
    window_n: int = 8,
    alpha_num: int = 1,
    alpha_den: int = 4,
    out_col: str = "ewma",
) -> DataFrame:
    """W10 (beyond reference): exponentially-weighted moving average per
    series — the classic smoothing baseline for dashboards and anomaly
    bands, truncated to the trailing ``window_n`` points so it is a pure
    window expression (ONE shuffle on the series key, no recursion, no
    state store; the infinite-tail weight beyond ``window_n`` is
    ``(1-α)^window_n`` ≈ 10% at the defaults, renormalized away).

    At the head of a series the window is shorter than ``window_n``;
    the weights renormalize over the points that exist, so row 1's EWMA
    is the point itself and every row gets a value (matching how
    monitoring EWMAs warm up).

    Exactness contract: weights are exact integers
    (:func:`ewma_weights`) and the caller feeds integer-quantized
    values, so the weighted numerator / denominator accumulate in LONG
    with zero rounding; the single final division is one IEEE op —
    bit-identical across engines (same trick as rolling_zscore above).
    Overflow headroom: |v| * alpha_den**(window_n-1) * window_n must
    fit in int64 — 1e7-quantized values at the defaults use ~2e13.
    """
    on, order = list(on), list(order)
    w = Window.partitionBy(*on).orderBy(*[F.col(c).asc() for c in order])
    weights = ewma_weights(window_n, alpha_num, alpha_den)
    v = F.col(value_col).cast("long")
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for j, wt in enumerate(weights):
        lj = v if j == 0 else F.lag(v, j).over(w)
        num = num + F.coalesce(F.lit(wt).cast("long") * lj, F.lit(0).cast("long"))
        den = den + F.when(lj.isNotNull(), F.lit(wt)).otherwise(F.lit(0)).cast("long")
    return df.withColumn(
        out_col, num.cast("double") / den.cast("double")
    )


def seasonal_baseline(
    df: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    period_ms: int = 86_400_000,
    n_bins: int = 24,
    value_scale: int = 100,
    broadcast_baseline: bool = True,
) -> DataFrame:
    """W11 (beyond reference): seasonal baseline + residual per series —
    the hour-of-day (or any period/bin grid) profile monitoring systems
    subtract before thresholding, so a nightly batch spike isn't an
    anomaly but the same load at 3pm is.

    Per (series, bin) the baseline is the exact-quantized mean of every
    point that ever landed in that bin; each point gets its bin's
    baseline and the residual ``value - baseline``.  All arithmetic is
    integer until one final division (same contract as ewma_smooth):
    values quantize to ``value_scale``, the baseline is the
    ``quantize``-style HALF_UP integer at 4 dp, and the residual is an
    exact integer difference at 4 dp.

    100 TB shape: ONE hash-agg builds the profile (map-side partials,
    key space = series × n_bins) and the points re-join it; with
    ``broadcast_baseline`` the join is a broadcast (right for ≤ ~1M
    series), otherwise a plain equi-join the planner shuffles on the
    profile key.  No window over the raw points.
    """
    on = list(on)
    binned = _seasonal_binned(df, ts_col, value_col, period_ms, n_bins,
                              value_scale)
    prof = seasonal_profile(binned, on)
    return seasonal_apply(
        binned, prof, on, ts_col=ts_col, value_col=value_col,
        value_scale=value_scale, broadcast_profile=broadcast_baseline,
    )


def _seasonal_binned(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    period_ms: int,
    n_bins: int,
    value_scale: int,
) -> DataFrame:
    if period_ms % n_bins:
        raise ValueError("period_ms must divide evenly into n_bins")
    bin_ms = period_ms // n_bins
    v_q = F.round(F.col(value_col).cast("double") * value_scale).cast("long")
    return (
        df.withColumn("_tsmod", F.col(ts_col) % period_ms)
        .withColumn("bin", F.expr(f"_tsmod div {bin_ms}").cast("int"))
        .drop("_tsmod")
        .withColumn("_vq", v_q)
    )


def seasonal_profile(binned: DataFrame, on: Sequence[str]) -> DataFrame:
    """The seasonal profile as MERGEABLE partials: ``(on…, bin, sum_vq,
    sum_sq_vq, bin_samples)`` — exact integer sums, so per-slice /
    per-day profiles union + re-aggregate (sum all three columns) into
    any range's profile, the same contract as the histogram rollups.
    The streaming twin (streaming/seasonal.py) emits exactly these rows
    per finalized slice.  ``sum_sq_vq`` (r10) carries the second moment
    so :func:`seasonal_forecast_bands` can serve baseline ± k·σ bands
    from partials — moments merge where rank statistics cannot.
    Overflow headroom: ``bin_samples × (|v|·value_scale)²`` per (series,
    bin) must fit int64."""
    return binned.groupBy(*on, "bin").agg(
        F.sum("_vq").alias("sum_vq"),
        F.sum(F.col("_vq") * F.col("_vq")).alias("sum_sq_vq"),
        F.count(F.lit(1)).alias("bin_samples"),
    )


def seasonal_forecast_bands(
    profile: DataFrame,
    on: Sequence[str],
    value_scale: int = 100,
    k: float = 2.0,
) -> DataFrame:
    """W13 (beyond reference): seasonal-naive FORECAST with
    mergeable-moments bands — per (series, bin): ``baseline`` (the
    profile mean, what the next period's bin is forecast to look like)
    and ``lo/hi = baseline ∓ k·σ`` from the profile's exact first and
    second moments.  σ-bands rather than residual quantiles by design:
    moments MERGE across partials (per-slice profiles sum), rank
    statistics don't — so the forecast serves from an attached long-run
    profile with zero raw reads, same contract as the stats rollups.

    Exactness: the moment sums are exact int64; the finalization is a
    fixed IEEE op sequence (two divisions, the var identity with a
    max(0) guard, one sqrt, two fused multiply-adds) — bit-identical
    cross-engine, emitted unrounded.

    Output: ``(on…, bin, bin_samples, baseline, sd, lo, hi)``.
    """
    on = list(on)
    if value_scale <= 0 or 10_000 % value_scale != 0:
        raise ValueError(
            f"value_scale must be a positive divisor of 10000; got "
            f"{value_scale}"
        )
    n = F.col("bin_samples")
    m = F.col("sum_vq").cast("double") / n
    msq = F.col("sum_sq_vq").cast("double") / n
    sd = F.sqrt(F.greatest(msq - m * m, F.lit(0.0)))
    return profile.select(
        *on,
        "bin",
        "bin_samples",
        (m / value_scale).alias("baseline"),
        (sd / value_scale).alias("sd"),
        ((m - F.lit(float(k)) * sd) / value_scale).alias("lo"),
        ((m + F.lit(float(k)) * sd) / value_scale).alias("hi"),
    )


def seasonal_apply(
    binned: DataFrame,
    profile: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    value_scale: int = 100,
    broadcast_profile: bool = True,
) -> DataFrame:
    """Score points against a (possibly merged) profile: finalizing the
    baseline from the partials is a per-row PROJECTION
    (``round(sum_vq*scale/n)``), so serving from stored partials costs
    one join and zero extra aggregations.

    The join is a LEFT join: a point whose bin has no historical profile
    row (a novel bin when scoring against an attached long-run profile)
    surfaces with ``bin_samples=0`` and null baseline/residual instead
    of silently disappearing from the output."""
    on = list(on)
    if value_scale <= 0 or 10_000 % value_scale != 0:
        raise ValueError(
            f"value_scale must be a positive divisor of 10000 (the 4-dp "
            f"fixed-point base the exact arithmetic is built on); got "
            f"{value_scale}"
        )
    scale_up = 10_000 // value_scale
    prof = profile.select(
        *on,
        "bin",
        F.round(
            F.col("sum_vq").cast("double") * scale_up / F.col("bin_samples")
        )
        .cast("long")
        .alias("_bq"),
        "bin_samples",
    )
    prof_side = F.broadcast(prof) if broadcast_profile else prof
    joined = binned.join(prof_side, [*on, "bin"], "left")
    return joined.select(
        *on,
        ts_col,
        value_col,
        "bin",
        F.coalesce(F.col("bin_samples"), F.lit(0).cast("long")).alias(
            "bin_samples"
        ),
        (F.col("_bq").cast("double") / 10_000).alias("baseline"),
        ((F.col("_vq") * scale_up - F.col("_bq")).cast("double") / 10_000).alias(
            "residual"
        ),
    )


def bucket_mad_outliers(
    df: DataFrame,
    buckets,
    ts_col: str = "ts",
    value_col: str = "value",
    k: int = 3,
    value_scale: int = 100,
) -> DataFrame:
    """A15/W12 (beyond reference): median/MAD outlier flags per bucket —
    the Hampel-style ROBUST detector (median absolute deviation resists
    the very outliers a mean/std z-score chases; one stuck gauge cannot
    widen its own acceptance band).

    Per bucket: ``med`` = exact median of the quantized values, ``mad``
    = exact median of ``|v - med|``; a point is an outlier when its
    deviation exceeds ``k × mad`` (k≈3 ≙ ~2σ for normal data via the
    1.4826 consistency factor — left to the caller's k).  ``mad = 0``
    (constant bucket) flags nothing, matching rolling_zscore's
    zero-variance guard.

    Exactness: values quantize to integers; both medians are dyadic
    ``(a+b)/2`` interpolations over exact values — bit-identical across
    engines (the same guarantee the A1 median relies on); deviations
    are exact doubles (integer ± x.5 steps).

    100 TB shape: ONE exchange and ONE scan — both medians are
    whole-partition window aggregates over the same bucket key
    (Spark evaluates an unbounded-frame aggregate once per partition),
    so the second median rides the first's partitioning; the
    join-free twin of the trimmed-stats plan.  Output: ``(start, end,
    ts, value, med, mad, is_outlier)``.
    """
    from rhq_metrics_spark.operators.stats import bucket_index, in_grid

    v_q = F.round(F.col(value_col).cast("double") * value_scale).cast("long")
    pts = (
        df.filter(in_grid(buckets, ts_col))
        .withColumn("bucket_idx", bucket_index(buckets, ts_col))
        .withColumn("_vq", v_q)
    )
    w = Window.partitionBy("bucket_idx")
    with_med = pts.withColumn(
        "_med", F.percentile(F.col("_vq"), F.lit(0.5)).over(w)
    ).withColumn("_dev", F.abs(F.col("_vq") - F.col("_med")))
    out = with_med.withColumn(
        "_mad", F.percentile(F.col("_dev"), F.lit(0.5)).over(w)
    )
    return out.select(
        (F.lit(buckets.start) + F.col("bucket_idx") * buckets.step).alias("start"),
        (F.lit(buckets.start) + (F.col("bucket_idx") + 1) * buckets.step).alias("end"),
        ts_col,
        value_col,
        (F.col("_med") / value_scale).alias("med"),
        (F.col("_mad") / value_scale).alias("mad"),
        ((F.col("_mad") > 0) & (F.col("_dev") > F.lit(k) * F.col("_mad"))).alias(
            "is_outlier"
        ),
    )


def mean_shift_changepoints(
    df: DataFrame,
    on: Sequence[str],
    order: Sequence[str],
    value_col: str = "value",
    window_n: int = 10,
    min_n: int = 5,
    threshold: float = 3.0,
    value_scale: int = 100,
) -> DataFrame:
    """W12+ (beyond reference): two-window mean-shift changepoint score
    per point — the window-expressible level-shift detector (the
    offline cousin of CUSUM, whose running reset is inherently
    sequential): at each point, compare the TRAILING ``window_n``
    points (inclusive) against the LEADING ``window_n`` points;
    ``score = (mean_next - mean_prev) / pooled_std`` flags a sustained
    level change without a spike tripping it (a single outlier moves
    one mean by 1/w and inflates the pooled std).

    Exactness contract (same family as rolling_zscore): values
    quantize to ``value_scale`` integers; counts / sums / sums of
    squares are exact int64 frame aggregates; every double is then a
    FIXED op sequence (two divisions per mean, the textbook var
    identity with a max(0) guard, one sqrt, one final division) —
    bit-identical cross-engine, emitted unrounded.  Overflow headroom:
    ``window_n * (|v| * value_scale)^2`` must fit int64.

    Rows with fewer than ``min_n`` points on either side, or zero
    pooled variance, get null score and no flag.

    100 TB shape: ONE exchange on the series key; both window frames
    ride the same sort (six frame aggregates, no join, no Python).
    Output: ``(on…, order…, value, n_prev, n_next, mean_prev,
    mean_next, score, is_change)``.
    """
    on, order = list(on), list(order)

    def frames(lo: int, hi: int):
        w = (
            Window.partitionBy(*on)
            .orderBy(*[F.col(c).asc() for c in order])
            .rowsBetween(lo, hi)
        )
        n = F.count("_vq").over(w)
        s = F.sum("_vq").over(w)
        sq = F.sum(F.col("_vq") * F.col("_vq")).over(w)
        return n, s, sq

    base = df.withColumn(
        "_vq", F.round(F.col(value_col).cast("double") * value_scale).cast("long")
    )
    n_p, s_p, sq_p = frames(-(window_n - 1), 0)
    n_n, s_n, sq_n = frames(1, window_n)
    m_p = s_p.cast("double") / n_p
    m_n = s_n.cast("double") / n_n
    var_p = F.greatest(sq_p.cast("double") / n_p - m_p * m_p, F.lit(0.0))
    var_n = F.greatest(sq_n.cast("double") / n_n - m_n * m_n, F.lit(0.0))
    pooled = F.sqrt((var_p * n_p + var_n * n_n) / (n_p + n_n))
    ok = (n_p >= min_n) & (n_n >= min_n) & (pooled > 0)
    score = F.when(ok, (m_n - m_p) / pooled)
    out = base.select(
        *on,
        *order,
        value_col,
        n_p.alias("n_prev"),
        n_n.alias("n_next"),
        (m_p / value_scale).alias("mean_prev"),
        (m_n / value_scale).alias("mean_next"),
        score.alias("score"),
    )
    return out.withColumn(
        "is_change",
        F.coalesce(F.abs(F.col("score")) > F.lit(threshold), F.lit(False)),
    )


def rank_anomalous_series(
    df: DataFrame,
    on: Sequence[str],
    order: Sequence[str],
    value_col: str = "value",
    window_n: int = 20,
    min_n: int = 5,
    threshold: float = 3.0,
    top_k: int = 10,
) -> DataFrame:
    """W14 (beyond reference): WHICH series are misbehaving — the
    fleet-triage view over :func:`rolling_zscore`: per series the max
    |z| in range and the flagged-point count, globally ranked, top-k.

    100 TB shape: the z-score's one exchange on the series key
    collapses to ONE ROW PER SERIES in the same aggregation; the
    global rank then orders #series rows (a single tiny partition
    AFTER the per-series agg — raw points never reach it).  Ties and
    all-null series (constant values → null z) rank deterministically
    (nulls last, then the series key).

    Output: ``(on…, n_points, n_flagged, max_abs_z, rank)``.
    """
    on = list(on)
    z = rolling_zscore(
        df, on, order, value_col, window_n, min_n, threshold
    )
    per = z.groupBy(*on).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.count(F.when(F.col("is_anomaly"), 1)).alias("n_flagged"),
        F.max(F.abs(F.col("z"))).alias("max_abs_z"),
    )
    w = Window.orderBy(
        F.col("max_abs_z").desc_nulls_last(),
        *[F.col(c).asc() for c in on],
    )
    return (
        per.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_k)
    )
