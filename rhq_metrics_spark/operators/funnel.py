"""Ordered-funnel conversion and cohort retention over an event
stream — the two classic product-analytics shapes, expressed as
chained keyed aggregations so they hold at any event volume.

Funnel (W15, beyond reference): users advance a step when their FIRST
qualifying event strictly follows their previous step's completion
(optionally within a conversion window anchored at step 1).  Each
stage is a filter + per-user min aggregation joined to the previous
anchor — every join and aggregation keys on the user column, so one
hash partitioning is reused across all stages and the anchor tables
are #users rows, never events.

Cohort retention (W16): users are labeled by the epoch-aligned period
of their first activity; activity at period offset k counts toward
``(cohort, k)``.  Two keyed aggregations, all-integer outputs
(``retention_ppm`` is floor fixed point), so the matrix is hash-exact
cross-engine.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from rhq_metrics_spark.localrel import local_df

PPM = 1_000_000


def funnel_steps(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "metric",
    ts_col: str = "ts",
    window_ms: int | None = None,
) -> DataFrame:
    """Conversion counts for an ordered funnel.

    For each prefix of ``steps``: the number of users whose first
    step-k event has ``ts`` strictly greater than their step-(k-1)
    completion time — and, when ``window_ms`` is given, no later than
    ``window_ms`` after their step-1 anchor.  First-touch semantics
    throughout (the earliest qualifying event is the completion time).

    Output: ``(step_idx, step, users, conversion_ppm)`` with
    ``conversion_ppm`` floor-relative to step-1 users.

    100 TB shape (ADVICE r16 — docstring matches the r16 one-pass
    form): ONE user-partitioned window pass over the STEP-TYPED events
    (the type filter pushes down, so the windowed rows are funnel
    events only, not the raw stream), chained window minimums for
    every stage sharing that single partitioning, then one user-keyed
    agg (reusing the window's exchange) and one global count row.  No
    self-join of the event table with itself.  Skew note: a hot user's
    step-typed events must buffer in one window task — the chained
    stage conditions reference previous stage columns per row, which a
    pre-aggregation cannot reproduce, so partial aggregation is
    structurally unavailable; the exposure is bounded by the type
    filter (funnel steps, not all traffic) and a pathological user can
    be split only by losing first-touch exactness.  If per-user event
    volume is unbounded, pre-filter or cap upstream.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    # ONE pass over the (step-typed) events (r16 opt, guide §2.4): a
    # single user-partitioned shuffle computes EVERY stage's
    # first-touch completion time as chained window minimums — stage
    # k's qualifying condition references stage k-1's window column,
    # all sharing one partitioning — and one global aggregate counts
    # every stage's converted users in the same job.  The previous
    # per-step formulation ran one driver action per step (scan +
    # per-user min agg + join each).  Values are identical: min-over-
    # qualifying-events IS the first-touch time, null when a user
    # never qualifies, and `count(col)` skips nulls.
    ev = df.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_ty"),
        F.col(ts_col).alias("_ts"),
    )
    w = Window.partitionBy("_u")
    tcols: list[str] = []
    cur = ev
    for i, step in enumerate(steps):
        tcol = f"_t{i + 1}"
        if i == 0:
            cond = F.col("_ty") == step
        else:
            prev_t = F.col(tcols[-1])
            cond = (
                (F.col("_ty") == step)
                & prev_t.isNotNull()
                & (F.col("_ts") > prev_t)
            )
            if window_ms is not None:
                cond = cond & (F.col("_ts") <= F.col("_t1") + window_ms)
        cur = cur.withColumn(tcol, F.min(F.when(cond, F.col("_ts"))).over(w))
        tcols.append(tcol)
    # window values are per-user constants; the user-keyed agg reuses
    # the window's partitioning (no second exchange), the final count
    # row is one global agg
    per_user = cur.groupBy("_u").agg(*[F.min(c).alias(c) for c in tcols])
    crow = per_user.agg(
        *[F.count(c).alias(f"_c{i}") for i, c in enumerate(tcols)]
    ).first()
    counts = [int(crow[f"_c{i}"]) for i in range(len(tcols))]
    base = counts[0]
    spark = df.sparkSession
    rows = [
        (
            i + 1,
            step,
            counts[i],
            (counts[i] * PPM) // base if base else 0,
        )
        for i, step in enumerate(steps)
    ]
    return local_df(
        spark, rows, "step_idx int, step string, users long, conversion_ppm long"
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_ms: int = 7 * 86_400_000,
) -> DataFrame:
    """Cohort retention matrix: users labeled by the epoch-aligned
    period of their first activity; one row per (cohort, offset k)
    with distinct active users and floor-ppm retention vs the cohort
    size (k=0 is the cohort size itself by construction).

    Output: ``(cohort_period, period_k, active_users, cohort_size,
    retention_ppm)`` — all integers, hash-exact.
    """
    # `first` feeds both the activity join and the cohort sizes, and
    # Catalyst does not reuse common subtrees — checkpoint the
    # #users-row table lazily so the event scan behind it runs once
    first = df.groupBy(F.col(user_col).alias("_u")).agg(
        F.min(ts_col).alias("_t0")
    ).localCheckpoint(eager=False)
    # integer div, never float division: a ts one ms shy of a period
    # boundary must not round into the next cohort
    act = (
        df.select(F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts"))
        .join(first, "_u")
        .select(
            F.expr(f"_t0 div {period_ms}").alias("cohort_period"),
            (
                F.expr(f"_ts div {period_ms}") - F.expr(f"_t0 div {period_ms}")
            ).alias("period_k"),
            "_u",
        )
    )
    counts = act.groupBy("cohort_period", "period_k").agg(
        F.countDistinct("_u").alias("active_users")
    )
    sizes = (
        first.select(
            F.expr(f"_t0 div {period_ms}").alias("cohort_period"),
            "_u",
        )
        .groupBy("cohort_period")
        .agg(F.countDistinct("_u").alias("cohort_size"))
    )
    return counts.join(F.broadcast(sizes), "cohort_period").select(
        "cohort_period",
        "period_k",
        "active_users",
        "cohort_size",
        F.expr(f"active_users * {PPM} div cohort_size").alias("retention_ppm"),
    )


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "metric",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """W17: event-transition matrix — for every adjacent pair of events
    in each user's timeline, how often type A is followed by type B,
    plus the per-source transition probability.  The path-analysis
    (Sankey / Markov-chain) sibling of the funnel and cohort operators:
    funnels answer "how many reached step k", transitions answer "where
    do users actually GO next".

    Ordering inside a user's timeline is the deterministic composite
    ``(ts, type, value)`` — two events sharing a timestamp order by
    type then value, the same total order in any engine (the funnel
    twins' same-ts discipline).

    Stream==batch contract bound (ADVICE r14): the streaming twin keeps
    its per-user state all-integer by quantizing the value tiebreak to
    µ-units saturated at ±2**62 — i.e. values beyond ±2**62/1e6 ≈
    ±4.61e12 compare EQUAL in the stream, while this batch operator
    orders by the raw double.  Two same-``(ts, type)`` events whose
    values BOTH exceed that magnitude can therefore order differently
    across the twins; within ±4.61e12 (any real event payload) the
    twins agree bit-for-bit.

    Output: ``(from_type, to_type, transitions, from_total,
    prob_ppm)`` with ``prob_ppm = transitions · 1e6 div from_total``
    (integer fixed point), ordered by (from_type, to_type).

    Plan shape at 100 TB: ONE window shuffle on the user key (lead over
    the composite order), then ONE hash-agg on the (from, to) pair key
    — map-side partials absorb hot transitions; the from-totals ride a
    second window over the PAIR table (#type² rows, not events).

    Reference analogue: beyond the reference; extends its rate/funnel
    event shapes (core/metrics-core-service/.../MetricsServiceImpl.java
    findRateData conventions) with the adjacent-pair reduction.
    """
    order_cols = [F.col(ts_col).asc(), F.col("from_type").asc()]
    if value_col is not None:
        order_cols.append(F.col(value_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    pairs = (
        df.select(
            F.col(user_col),
            F.col(type_col).alias("from_type"),
            F.col(ts_col),
            *([F.col(value_col)] if value_col is not None else []),
        )
        .withColumn("to_type", F.lead("from_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("transitions"))
    )
    gw = Window.partitionBy("from_type")
    return (
        pairs.withColumn("from_total", F.sum("transitions").over(gw))
        .select(
            "from_type",
            "to_type",
            "transitions",
            "from_total",
            F.expr("transitions * 1000000 div from_total").alias("prob_ppm"),
        )
        .orderBy("from_type", "to_type")
    )


def active_users(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_ms: int = 86_400_000,
    windows: Sequence[int] = (1, 7, 30),
) -> DataFrame:
    """W18: rolling active-user counts — the DAU/WAU/MAU family.  For
    every period in the data's span and every window ``w``: how many
    distinct users had ≥ 1 event in the trailing ``w`` periods
    ``(p − w, p]``.  DAU/MAU stickiness is ``w=1`` over ``w=30`` of
    the same output.

    Exactness WITHOUT per-period recounting: a user active at periods
    {p₁ < p₂ < …} is window-w-active exactly on ∪ᵢ [pᵢ, pᵢ+w−1] — so
    after reducing events to DISTINCT (user, period) pairs, a per-user
    lag merges overlapping intervals (gaps-and-islands, the W2
    machinery), each merged interval becomes a +1/−1 delta pair, and
    one cumulative sum over the period spine yields every period's
    exact distinct count.  No count_distinct over a sliding range, no
    user×window fan-out.

    Plan shape at 100 TB: one hash-agg to (user, period) [≤ users ×
    span rows], one user-key window per requested w over that reduced
    table, one tiny delta agg per period, and a cumulative window over
    the PERIOD SPINE — #periods rows (a decade of days is 3,653 rows),
    single partition by construction, never the corpus.

    Output: ``(period, window_periods, active_users)`` — all integers,
    hash-exact cross-engine; every period of the span appears (zero
    when nobody was active), ordered by (period, window_periods).

    Reference analogue: beyond the reference; extends its availability
    uptime-ratio rollups (core/metrics-core-service/.../
    MetricsServiceImpl.java findAvailabilityStats conventions) to
    distinct-entity activity.
    """
    if not windows or any(w < 1 for w in windows):
        raise ValueError(f"active_users: windows must be positive: {windows}")
    # eager localCheckpoint, NOT persist: the cache registry matches by
    # analyzed plan, so a persisted frame from an earlier call over the
    # same source path would silently serve STALE data after new files
    # land (found by the r13 maintenance round-trip test); a checkpoint
    # materializes this call's snapshot and cannot be plan-matched.
    # ONE snapshot total (r14, the ×100 heap lesson): the distinct
    # reduction and the shared lag/lead window materialize in the SAME
    # job — local-checkpoint blocks are pinned, so a separate
    # intermediate (user, period) snapshot would hold a second full
    # copy of the distinct table for the whole call.
    uw = Window.partitionBy("_u").orderBy("_p")
    # the lag/lead columns are window-INDEPENDENT: one user-key window
    # pass serves every requested w (only the gap comparisons differ),
    # so the per-w legs are narrow filters over this snapshot
    marked = (
        df.select(
            F.col(user_col).alias("_u"),
            F.expr(f"{ts_col} div {period_ms}").alias("_p"),
        )
        .distinct()
        .withColumn("_prev", F.lag("_p").over(uw))
        .withColumn("_next", F.lead("_p").over(uw))
        .localCheckpoint(eager=True)
    )
    bounds = marked.agg(
        F.min("_p").alias("_lo"), F.max("_p").alias("_hi")
    ).first()
    if bounds["_lo"] is None:
        marked.unpersist()
        return local_df(
            df.sparkSession, [], "period long, window_periods int, active_users long"
        )
    spine = df.sparkSession.range(bounds["_lo"], bounds["_hi"] + 1).select(
        F.col("id").alias("period")
    )
    legs = []
    for w in windows:
        # merged-interval starts: gap from the previous activity >= w
        starts = marked.filter(
            F.col("_prev").isNull() | (F.col("_p") - F.col("_prev") >= w)
        ).select(F.col("_p").alias("period"), F.lit(1).alias("_d"))
        ends = marked.filter(
            F.col("_next").isNull() | (F.col("_next") - F.col("_p") >= w)
        ).select((F.col("_p") + w).alias("period"), F.lit(-1).alias("_d"))
        deltas = (
            starts.unionByName(ends)
            .groupBy("period")
            .agg(F.sum("_d").alias("_d"))
        )
        cum = Window.orderBy("period").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        leg = (
            spine.join(deltas, "period", "left")
            .select("period", F.coalesce(F.col("_d"), F.lit(0)).alias("_d"))
            .withColumn("active_users", F.sum("_d").over(cum))
            .select(
                "period",
                F.lit(int(w)).alias("window_periods"),
                F.col("active_users").cast("long"),
            )
        )
        legs.append(leg)
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("period", "window_periods")


def frequent_paths(
    df: DataFrame,
    length: int = 3,
    k: int = 20,
    user_col: str = "user_id",
    type_col: str = "metric",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """W19: top-k frequent event paths — every run of ``length``
    consecutive events in a user's timeline becomes the path string
    ``"a>b>c"``; paths are counted corpus-wide with distinct-user
    support.  The sequence-mining sibling of :func:`event_transitions`
    (which is the ``length=2`` pair matrix before ranking).

    Ordering inside a timeline is the same deterministic composite
    ``(ts, type, value)`` as W17, so the path multiset is a pure
    function of the data in any engine — including W17's stream==batch
    value-magnitude bound: the streaming twin's µ-unit value tiebreak
    saturates at ±2**62, so same-``(ts, type)`` events with values both
    beyond ±2**62/1e6 ≈ ±4.61e12 may order differently across the
    twins (see :func:`event_transitions`).

    Plan shape at 100 TB: ONE window shuffle on the user key computes
    all ``length−1`` leads in one pass (same window spec → one
    exchange, plan-guarded in tests), then one hash-agg on the path
    key; top-k is ``orderBy(...).limit(k)`` — TakeOrderedAndProject
    over the path table (|distinct paths| rows), never a global sort
    of events.

    Null event types are filtered UP FRONT (ADVICE r13): ``concat_ws``
    would otherwise silently skip a null step and count a shortened
    path as complete.  The streaming twin applies the same filter, so
    stream == batch holds on null-typed timelines too.  The ``>``
    separator is part of the output contract: an event type that
    itself contains ``>`` renders an ambiguous path string, and since
    counting groups on that string, distinct step sequences that
    collide textually would merge — keep ``>`` out of event-type
    names (the reference applies the same reserved-character rule to
    metric ids).

    Output: ``(path, occurrences, n_users, rank)`` — rank by
    (occurrences desc, path asc), ties deterministic.
    """
    if length < 2:
        raise ValueError(f"frequent_paths: length must be >= 2: {length}")
    if k < 1:
        raise ValueError(f"frequent_paths: k must be >= 1: {k}")
    df = df.filter(F.col(type_col).isNotNull())
    order_cols = [F.col(ts_col).asc(), F.col(type_col).asc()]
    if value_col is not None:
        order_cols.append(F.col(value_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, length)
    ]
    paths = (
        df.select(
            F.col(user_col).alias("_u"),
            F.concat_ws(">", *steps).alias("path"),
            steps[-1].isNotNull().alias("_complete"),
        )
        .filter(F.col("_complete"))
        .groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.countDistinct("_u").alias("n_users"),
        )
    )
    ranked = paths.orderBy(
        F.col("occurrences").desc(), F.col("path").asc()
    ).limit(k)
    rw = Window.orderBy(F.col("occurrences").desc(), F.col("path").asc())
    return ranked.withColumn("rank", F.row_number().over(rw)).select(
        "path", "occurrences", "n_users", "rank"
    )


def funnel_step_latency(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "metric",
    ts_col: str = "ts",
    window_ms: int | None = None,
) -> DataFrame:
    """W15b: time-to-convert between adjacent funnel steps — for every
    user who completed step k (same first-touch semantics and window
    anchoring as :func:`funnel_steps`), the latency from their step-
    (k−1) completion to their step-k completion, aggregated per step.

    The median is the exact lower median (element at position
    ``(n+1) div 2`` of the sorted latencies) and the mean is floor
    integer division — every output is an int64, hash-exact
    cross-engine (the shared discipline: no percentile_approx, no
    float averaging).

    Output: one row per step k ≥ 2 — ``(step_idx, step, users,
    sum_ms, mean_ms, p50_ms, max_ms)``.

    100 TB shape: the funnel chain is the same per-step pushed-down
    filter + per-user min-agg joins as ``funnel_steps`` (anchor tables
    are #users rows); the latency union holds one row per CONVERTING
    user per step, and the median window partitions by step over that
    users-row table — never events.
    """
    if len(steps) < 2:
        raise ValueError("funnel_step_latency needs >= 2 steps")
    anchors = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("_u"))
        .agg(F.min(ts_col).alias("_t1"))
    )
    # each stage table is #users rows: eager localCheckpoint (the
    # priority_sample discipline) so the event scan behind a stage runs
    # once and nothing stays pinned in the cache after return
    prev = anchors.withColumn("_tk", F.col("_t1")).localCheckpoint(eager=True)
    lat_legs = []
    for i, step in enumerate(steps[1:], start=2):
        ev = df.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts")
        )
        joined = ev.join(prev.select("_u", "_t1", "_tk"), "_u").filter(
            F.col("_ts") > F.col("_tk")
        )
        if window_ms is not None:
            joined = joined.filter(F.col("_ts") <= F.col("_t1") + window_ms)
        nxt = (
            joined.groupBy("_u")
            .agg(
                F.min("_t1").alias("_t1"),
                F.min("_ts").alias("_tk"),
                F.min("_tk").alias("_tprev"),
            )
            .localCheckpoint(eager=True)
        )
        lat_legs.append(
            nxt.select(
                F.lit(i).alias("step_idx"),
                F.lit(step).alias("step"),
                "_u",
                (F.col("_tk") - F.col("_tprev")).alias("_lat"),
            )
        )
        prev = nxt.select("_u", "_t1", "_tk")
    lats = lat_legs[0]
    for leg in lat_legs[1:]:
        lats = lats.unionByName(leg)
    sw = Window.partitionBy("step_idx")
    ow = Window.partitionBy("step_idx").orderBy(
        F.col("_lat").asc(), F.col("_u").asc()
    )
    return (
        lats.withColumn("_n", F.count(F.lit(1)).over(sw))
        .withColumn("_rn", F.row_number().over(ow))
        .withColumn("_sum", F.sum("_lat").over(sw))
        .withColumn("_max", F.max("_lat").over(sw))
        .filter(F.col("_rn") == F.expr("(_n + 1) div 2"))
        .select(
            "step_idx",
            "step",
            F.col("_n").alias("users"),
            F.col("_sum").alias("sum_ms"),
            F.expr("_sum div _n").alias("mean_ms"),
            F.col("_lat").alias("p50_ms"),
            F.col("_max").alias("max_ms"),
        )
        .orderBy("step_idx")
    )


def attribution(
    df: DataFrame,
    conversion_type: str,
    touch_types: Sequence[str],
    lookback_ms: int | None = None,
    user_col: str = "user_id",
    type_col: str = "metric",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """W20: last-touch conversion attribution — for every conversion
    event, credit the user's most recent preceding touch event (type in
    ``touch_types``), optionally only if it fell within ``lookback_ms``
    before the conversion; conversions with no qualifying touch credit
    ``(none)``.  The marketing-attribution shape (last non-direct
    click) on the same event model as the funnel family.

    Value is credited in exact micro-units (``floor(value · 1e6)`` per
    conversion BEFORE the sum, so the total is an order-independent
    int64 — the shared fixed-point discipline; null values credit 0).

    Plan shape at 100 TB: ONE user-key window (last-ignore-nulls over
    rows preceding the current one, same deterministic (ts, type,
    value) composite order as W17) + one touch-type hash-agg over the
    CONVERSION rows only.  No self-join of events with events.

    Output: ``(touch_type, conversions, users, value_micro)`` ordered
    by touch_type — all integers, hash-exact.
    """
    if not touch_types:
        raise ValueError("attribution: touch_types must be non-empty")
    if conversion_type in set(touch_types):
        raise ValueError(
            "attribution: conversion_type cannot be a touch type"
        )
    order_cols = [
        F.col(ts_col).asc(), F.col(type_col).asc(), F.col(value_col).asc()
    ]
    w = (
        Window.partitionBy(user_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col(type_col).isin(*touch_types),
        F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("tt")),
    )
    marked = df.select(
        F.col(user_col).alias("_u"),
        F.col(type_col),
        F.col(ts_col),
        F.col(value_col),
        F.last(touch, ignorenulls=True).over(w).alias("_touch"),
    ).filter(F.col(type_col) == conversion_type)
    qualified = F.col("_touch").isNotNull() & (
        F.lit(True)
        if lookback_ms is None
        else (F.col(ts_col) - F.col("_touch.ts") <= lookback_ms)
    )
    credited = marked.select(
        F.when(qualified, F.col("_touch.tt"))
        .otherwise(F.lit("(none)"))
        .alias("touch_type"),
        "_u",
        F.coalesce(
            F.floor(F.col(value_col) * 1_000_000).cast("long"), F.lit(0)
        ).alias("_vq"),
    )
    return (
        credited.groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("conversions"),
            F.countDistinct("_u").alias("users"),
            F.sum("_vq").alias("value_micro"),
        )
        .orderBy("touch_type")
    )


def active_users_hll(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_ms: int = 86_400_000,
    windows: Sequence[int] = (1, 7, 30),
    m: int = 64,
) -> DataFrame:
    """The SKETCH serving twin of :func:`active_users`: per-period HLL
    register tables over user ids (pipelines/sketches.py
    hll_registers — md5-derived, engine-portable), merged by
    ``max(rho)`` across each trailing window — the rollup-serving
    contract: registers are built from the data ONCE, and any window's
    estimate is a merge of #periods × m tiny register rows, with zero
    re-scans of the events.  This is the 100 TB serving path when the
    exact interval-merge's distinct (user, period) reduction is itself
    too large to rebuild per query window.

    Output: ``(period, window_periods, regs_used, zeros, sum_scaled,
    raw_est)`` — the integer register summaries are hash-exact
    cross-engine and ``raw_est`` is the one-division raw HLL estimate
    (bit-identical IEEE); the linear-counting small-range correction
    (which calls ``ln``) is deliberately NOT applied here — apply
    ``hll_estimate``'s correction at the serving edge when absolute
    small-count accuracy matters more than cross-engine exactness.
    """
    from rhq_metrics_spark.pipelines.sketches import hll_registers

    if not windows or any(w < 1 for w in windows):
        raise ValueError(
            f"active_users_hll: windows must be positive: {windows}"
        )
    act = df.select(
        F.expr(f"{ts_col} div {period_ms}").alias("period"),
        F.col(user_col).alias("_u"),
    )
    # eager localCheckpoint, not persist — the same stale-cache trap as
    # active_users above; the register table is #periods x m tiny rows
    regs = hll_registers(
        act, group_col="period", value_col="_u", m=m
    ).localCheckpoint(eager=True)
    return active_window_estimates(regs, windows=windows, m=m)


def active_window_estimates(
    regs: DataFrame,
    windows: Sequence[int] = (1, 7, 30),
    m: int = 64,
    hi: int | None = None,
) -> DataFrame:
    """Finalize a mergeable activity REGISTER table ``(period, reg,
    rho)`` — fresh from :func:`active_users_hll`'s build, or read back
    from the maintenance-persisted partials sink (where per-slice
    register rows for the same (period, reg) merge here by max) —
    into per-(period, window) summaries + the raw HLL estimate.
    ``hi`` caps the served periods (default: the register table's max
    period)."""
    from rhq_metrics_spark.pipelines.sketches import _HLL_ALPHA, _HLL_RHO_CAP

    if m not in _HLL_ALPHA:
        raise ValueError(f"active_window_estimates: unsupported m: {m}")
    regs = regs.groupBy("period", "reg").agg(F.max("rho").alias("rho"))
    bounds = regs.agg(
        F.min("period").alias("_lo"), F.max("period").alias("_hi")
    ).first()
    if bounds["_lo"] is None:
        return local_df(
            regs.sparkSession,
            [],
            "period long, window_periods int, regs_used long, zeros long,"
            " sum_scaled long, raw_est double",
        )
    hi = bounds["_hi"] if hi is None else min(hi, bounds["_hi"])
    numerator = _HLL_ALPHA[m] * m * m * float(1 << _HLL_RHO_CAP)
    cap_term = 1 << _HLL_RHO_CAP
    legs = []
    for w in windows:
        served = (
            regs.select(
                F.explode(
                    F.sequence(
                        F.col("period"),
                        F.least(F.col("period") + w - 1, F.lit(hi)),
                    )
                ).alias("period"),
                "reg",
                "rho",
            )
            .groupBy("period", "reg")
            .agg(F.max("rho").alias("rho"))
        )
        agg = served.groupBy("period").agg(
            F.count(F.lit(1)).alias("regs_used"),
            F.sum(
                F.expr(f"cast(pow(2, {_HLL_RHO_CAP} - rho) as bigint)")
            ).alias("_sp"),
        )
        legs.append(
            agg.select(
                "period",
                F.lit(int(w)).alias("window_periods"),
                F.col("regs_used").cast("long"),
                (F.lit(m) - F.col("regs_used")).cast("long").alias("zeros"),
                (
                    F.col("_sp") + (F.lit(m) - F.col("regs_used")) * F.lit(cap_term)
                ).cast("long").alias("sum_scaled"),
            ).withColumn(
                "raw_est",
                F.lit(numerator) / F.col("sum_scaled").cast("double"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("period", "window_periods")
