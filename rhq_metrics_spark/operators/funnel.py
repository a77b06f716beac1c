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

    100 TB shape: per step one pushed-down type filter + one per-user
    min agg + one co-partitioned inner join on the user key; anchors
    are #users rows.  No windows over raw events, no self-join of the
    event table with itself.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    anchors = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("_u"))
        .agg(F.min(ts_col).alias("_t1"))
    )
    # each stage is persisted before its count so the event table is
    # scanned once per step, not once per downstream stage (#users-row
    # tables — the cache cost is the anchor, never the events)
    prev = anchors.withColumn("_tk", F.col("_t1")).persist()
    stages = [prev]
    counts = [prev.count()]
    for step in steps[1:]:
        ev = df.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts")
        )
        joined = ev.join(prev.select("_u", "_t1", "_tk"), "_u").filter(
            F.col("_ts") > F.col("_tk")
        )
        if window_ms is not None:
            joined = joined.filter(F.col("_ts") <= F.col("_t1") + window_ms)
        prev = joined.groupBy("_u").agg(
            F.min("_t1").alias("_t1"), F.min("_ts").alias("_tk")
        ).persist()
        stages.append(prev)
        counts.append(prev.count())
    for st in stages:
        st.unpersist()
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
    return spark.createDataFrame(
        rows, "step_idx int, step string, users long, conversion_ppm long"
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
