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


def availability_rollup(
    df: DataFrame,
    slice_ms: int,
    value_col: str = "value",
    ts_col: str = "ts",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-(series, slice) MERGEABLE partials for
    :func:`availability_stats` — the chunk-meta scheme extended to the
    duration state machine.  Buckets are independent in the reference
    semantics (no cross-bucket carry), so a slice's partial needs only:
    its boundary (ts, state) pair, the interior per-state hold durations
    (each point held to the NEXT in-slice point), the interior
    transition counts/candidates (first point excluded — its
    predecessor is unknown until merge), and samples.
    :func:`availability_from_rollup` then reconstructs any coarser
    bucket EXACTLY: boundary holds between consecutive present slices,
    the first slice's back-fill from bucket start, and the last slice's
    extension to bucket end.  All integer-ms arithmetic → bit-identical
    to the batch operator (tested).

    Output: ``(group_cols..., slice_start, f_ts, f_state, l_ts,
    l_state, <state>_dur × 4, nuc_interior, last_not_up_ts,
    last_recovery_ts, samples)``.
    """
    gcols = list(group_cols)
    w = Window.partitionBy(*gcols, "slice_start").orderBy(F.col("_ts").asc())
    cur = (
        df.select(
            *gcols,
            (F.floor(F.col(ts_col) / slice_ms) * slice_ms).alias("slice_start"),
            F.col(ts_col).alias("_ts"),
            F.col(value_col).alias("_state"),
        )
        .withColumn("_prev", F.lag("_state").over(w))
        .withColumn("_next_ts", F.lead("_ts").over(w))
    )
    dur = F.when(F.col("_next_ts").isNotNull(), F.col("_next_ts") - F.col("_ts")) \
        .otherwise(F.lit(0))

    def sdur(s: str):
        return F.sum(F.when(F.col("_state") == s, dur).otherwise(0)).alias(f"{s}_dur")

    return cur.groupBy(*gcols, "slice_start").agg(
        F.min(F.struct("_ts", "_state")).alias("_f"),
        F.max(F.struct("_ts", "_state")).alias("_l"),
        *[sdur(s) for s in AvailabilityType.ALL],
        F.sum(
            F.when(
                (F.col("_state") != UP)
                & F.col("_prev").isNotNull() & (F.col("_prev") == UP),
                1,
            ).otherwise(0)
        ).alias("nuc_interior"),
        F.max(F.when(F.col("_state") != UP, F.col("_ts"))).alias("last_not_up_ts"),
        F.max(
            F.when(
                (F.col("_state") == UP)
                & F.col("_prev").isNotNull() & (F.col("_prev") != UP),
                F.col("_ts"),
            )
        ).alias("last_recovery_ts"),
        F.count(F.lit(1)).alias("samples"),
    ).select(
        *gcols,
        "slice_start",
        F.col("_f._ts").alias("f_ts"),
        F.col("_f._state").alias("f_state"),
        F.col("_l._ts").alias("l_ts"),
        F.col("_l._state").alias("l_state"),
        *[f"{s}_dur" for s in AvailabilityType.ALL],
        "nuc_interior",
        "last_not_up_ts",
        "last_recovery_ts",
        "samples",
    )


def availability_from_rollup(
    partials: DataFrame,
    buckets: Buckets,
    slice_ms: int,
    group_cols: Sequence[str] = (),
    fill_empty: bool = True,
) -> DataFrame:
    """EXACT :func:`availability_stats` from :func:`availability_rollup`
    partials when the bucket grid tiles the slice grid: one lag over the
    per-slice rows resolves each slice's predecessor inside the bucket
    (boundary hold, first-point transition, boundary recovery), the
    first/last slices back-fill to bucket start / extend to bucket end,
    and integer sums merge — bit-identical output columns.
    """
    if buckets.step % slice_ms != 0 or buckets.start % slice_ms != 0:
        raise ValueError(
            f"bucket grid (start {buckets.start}, step {buckets.step}) must "
            f"tile the {slice_ms}ms slice grid"
        )
    gcols = list(group_cols)
    p = partials.filter(
        (F.col("slice_start") >= buckets.start)
        & (F.col("slice_start") < buckets.end)
    ).withColumn(
        "bucket_idx",
        ((F.col("slice_start") - buckets.start) / buckets.step).cast("long"),
    )
    w = Window.partitionBy(*gcols, "bucket_idx").orderBy("slice_start")
    cur = (
        p.withColumn("_plt", F.lag("l_ts").over(w))
        .withColumn("_pls", F.lag("l_state").over(w))
        .withColumn("_is_last", F.lead("slice_start").over(w).isNull())
        .withColumn(
            "_bstart",
            F.lit(buckets.start) + F.col("bucket_idx") * F.lit(buckets.step),
        )
        .withColumn("_bend", F.col("_bstart") + F.lit(buckets.step))
    )

    def contrib(s: str):
        return (
            F.col(f"{s}_dur")
            + F.when(
                F.col("_plt").isNotNull() & (F.col("_pls") == s),
                F.col("f_ts") - F.col("_plt"),
            ).otherwise(0)
            + F.when(
                F.col("_plt").isNull() & (F.col("f_state") == s),
                F.col("f_ts") - F.col("_bstart"),
            ).otherwise(0)
            + F.when(
                F.col("_is_last") & (F.col("l_state") == s),
                F.col("_bend") - F.col("l_ts"),
            ).otherwise(0)
        ).alias(f"_c_{s}")

    rows = cur.select(
        *gcols,
        "bucket_idx",
        "_bend",
        *[contrib(s) for s in AvailabilityType.ALL],
        (
            F.col("nuc_interior")
            + F.when(
                (F.col("f_state") != UP)
                & (F.col("_plt").isNull() | (F.col("_pls") == UP)),
                1,
            ).otherwise(0)
        ).alias("_nuc"),
        "last_not_up_ts",
        F.greatest(
            F.col("last_recovery_ts"),
            F.when(
                (F.col("f_state") == UP)
                & F.col("_plt").isNotNull() & (F.col("_pls") != UP),
                F.col("f_ts"),
            ),
        ).alias("_rec"),
        F.when(F.col("_is_last"), F.col("l_state")).alias("_final"),
        "samples",
    )
    agg = rows.groupBy(*gcols, "bucket_idx").agg(
        *[F.sum(f"_c_{s}").alias(f"{s}_duration") for s in AvailabilityType.ALL],
        F.sum("_nuc").alias("not_up_count"),
        F.max("last_not_up_ts").alias("_last_not_up_ts"),
        F.max("_rec").alias("_last_recovery_ts"),
        F.max("_final").alias("_final"),
        F.max("_bend").alias("_bend_a"),
        F.sum("samples").alias("samples"),
    )
    result = agg.select(
        *gcols,
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
    dim = bucket_dimension(partials.sparkSession, buckets)
    if not fill_empty:
        return result.join(F.broadcast(dim), "bucket_idx").drop("bucket_idx")
    if gcols:
        groups = partials.select(*gcols).distinct()
        dim = groups.crossJoin(F.broadcast(dim))
        filled = dim.join(result, [*gcols, "bucket_idx"], "left")
    else:
        filled = F.broadcast(dim).join(result, "bucket_idx", "left")
    return filled.withColumn(
        "samples", F.coalesce(F.col("samples"), F.lit(0))
    ).drop("bucket_idx")


def slo_burn_rate(
    avail_stats_df: DataFrame,
    slo_ppm: int = 999_000,
    fast_n: int = 1,
    slow_n: int = 6,
    burn_threshold: float = 1.0,
    group_cols: Sequence[str] = ("metric",),
) -> DataFrame:
    """A16 (beyond reference): multiwindow SLO burn-rate over the A2
    availability buckets — the SRE-workbook alerting rule (public):
    ``burn = bad_fraction / error_budget`` over a FAST and a SLOW
    trailing window, alert only when BOTH exceed the threshold (fast
    catches the page-worthy spike, slow stops one blip from paging).

    Input: :func:`availability_stats` output (one row per series/bucket,
    empty buckets null-filled).  ``bad_fraction`` counts ``down`` time
    against observed ``up + down`` time (unknown/admin excluded — no
    budget is burned while we can't see or are told to ignore).

    Exactness: duration sums are exact integer ms; each burn is the
    fixed op sequence ``down*1e6 / (obs * budget_ppm)`` — identical
    IEEE doubles cross-engine.  ``obs = 0`` (nothing observed) yields
    null burn and no alert.

    100 TB shape: two rolling sums over the per-bucket stats table —
    one window exchange on the series key over #buckets × #series rows
    (never raw points); composes with the availability ROLLUP serving
    path, which already answers the per-bucket stats from partials.
    """
    gcols = list(group_cols)
    budget_ppm = 1_000_000 - slo_ppm
    if budget_ppm <= 0:
        raise ValueError("slo_ppm must be < 1,000,000")
    down = F.coalesce(F.col("down_duration"), F.lit(0)).cast("long")
    obs = down + F.coalesce(F.col("up_duration"), F.lit(0)).cast("long")
    base = avail_stats_df.withColumn("_down", down).withColumn("_obs", obs)

    def _burn(n: int, tag: str):
        w = (
            Window.partitionBy(*gcols)
            .orderBy(F.col("start").asc())
            .rowsBetween(-(n - 1), 0)
        )
        dsum = F.sum("_down").over(w)
        osum = F.sum("_obs").over(w)
        burn = F.when(
            osum > 0,
            dsum.cast("double") * 1_000_000.0
            / (osum.cast("double") * budget_ppm),
        )
        return [
            dsum.alias(f"down_{tag}_ms"),
            osum.alias(f"obs_{tag}_ms"),
            F.round(burn, 6).alias(f"burn_{tag}"),
            burn.alias(f"_raw_{tag}"),
        ]

    cols = _burn(fast_n, "fast") + _burn(slow_n, "slow")
    out = base.select(*gcols, "start", "end", *cols)
    return out.withColumn(
        "alert",
        F.coalesce(
            (F.col("_raw_fast") > burn_threshold)
            & (F.col("_raw_slow") > burn_threshold),
            F.lit(False),
        ),
    ).drop("_raw_fast", "_raw_slow")
