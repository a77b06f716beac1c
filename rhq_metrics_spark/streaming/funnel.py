"""Streaming W15: live ordered-funnel progression — the continuous
twin of ``operators/funnel.py funnel_steps``.

The batch operator chains per-user min aggregations; a stream instead
carries each user's funnel position as state (anchor time, steps
completed, last completion time — four scalars per user, independent
of throughput) via ``applyInPandasWithState`` and emits one row per
STEP ADVANCE.  Over an in-order replay of the same events, the
distinct users emitted at step k equal the batch funnel's step-k count
(tested) — the same in-order contract as the z-score twin; the batch
path owns out-of-order history.

Advances are idempotent under same-ts replays by construction: a
replayed event's type no longer matches the NEXT expected step, so it
is ignored.  The cross-batch replay guard is keyed on the full
in-order sort key ``(ts, metric)`` — not ts alone — so a genuinely
NEW event arriving in a later micro-batch at the same timestamp as
the previous batch's last event still advances the funnel (matching
batch ``funnel_steps``); only events at or before the last processed
``(ts, metric)`` key are treated as whole-batch replays.
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("step_idx", IntegerType(), False),
        StructField("step", StringType(), False),
        StructField("ts", LongType(), False),
    ]
)

FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType(), True),
        StructField("last_metric", StringType(), True),
        StructField("t1", LongType(), True),
        StructField("k", IntegerType(), True),
        StructField("tk", LongType(), True),
    ]
)


def _make_funnel_fn(steps: Sequence[str], window_ms: int | None):
    steps = list(steps)
    n_steps = len(steps)

    def _group(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_ts, last_metric, t1, k, tk = state.get
        else:
            last_ts, last_metric, t1, k, tk = None, None, None, 0, None

        out: dict[str, list] = {"step_idx": [], "step": [], "ts": []}
        # replay guard on the FULL in-order sort key (ts, metric): a new
        # event in a later batch that shares the previous batch's last
        # timestamp must still be processed (ADVICE r11)
        entry_key = (last_ts, last_metric or "") if last_ts is not None else None
        frames = list(pdfs)
        merged = pd.concat(frames) if frames else pd.DataFrame()
        if len(merged):
            merged = merged.sort_values(["ts", "metric"])
            for ts, et in zip(merged["ts"], merged["metric"]):
                ts = int(ts)
                if entry_key is not None and (ts, str(et)) <= entry_key:
                    continue
                last_ts, last_metric = ts, str(et)
                if k >= n_steps or et != steps[k]:
                    continue
                if k == 0:
                    t1, tk = ts, ts
                else:
                    if ts <= tk:
                        continue  # strict ordering
                    if window_ms is not None and ts > t1 + window_ms:
                        continue
                    tk = ts
                k += 1
                out["step_idx"].append(k)
                out["step"].append(steps[k - 1])
                out["ts"].append(ts)

        state.update((last_ts, last_metric, t1, k, tk))
        if out["ts"]:
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "step_idx": out["step_idx"],
                    "step": out["step"],
                    "ts": out["ts"],
                }
            )

    return _group


def streaming_funnel(
    stream_df: DataFrame,
    steps: Sequence[str],
    window_ms: int | None = None,
) -> DataFrame:
    """Input: streaming ``(user_id, metric, ts)`` events.  Output
    stream: one append row per funnel ADVANCE — (user, step_idx, step,
    completion ts).  ``groupBy(step).approx/exact count distinct`` on
    the sink gives the live conversion table; over an in-order replay
    the per-step user sets equal the batch ``funnel_steps`` counts.
    State is four scalars per user."""
    return stream_df.groupBy("user_id").applyInPandasWithState(
        _make_funnel_fn(steps, window_ms),
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming W15b: live funnel step latency — the continuous twin of
# operators/funnel.py funnel_step_latency (VERDICT r13 item 7, closing
# the one asymmetry in the funnel family).

STEP_LATENCY_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("step_idx", IntegerType(), False),
        StructField("step", StringType(), False),
        StructField("ts", LongType(), False),
        StructField("latency_ms", LongType(), False),
    ]
)


def _make_step_latency_fn(steps: Sequence[str], window_ms: int | None):
    steps = list(steps)
    n_steps = len(steps)

    def _group(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_ts, last_metric, t1, k, tk = state.get
        else:
            last_ts, last_metric, t1, k, tk = None, None, None, 0, None

        out: dict[str, list] = {"step_idx": [], "step": [], "ts": [], "lat": []}
        entry_key = (last_ts, last_metric or "") if last_ts is not None else None
        frames = list(pdfs)
        merged = pd.concat(frames) if frames else pd.DataFrame()
        if len(merged):
            merged = merged.sort_values(["ts", "metric"])
            for ts, et in zip(merged["ts"], merged["metric"]):
                ts = int(ts)
                if entry_key is not None and (ts, str(et)) <= entry_key:
                    continue
                last_ts, last_metric = ts, str(et)
                if k >= n_steps or et != steps[k]:
                    continue
                if k == 0:
                    t1, tk = ts, ts
                    k = 1
                    continue  # step 1 has no previous step — no latency row
                if ts <= tk:
                    continue  # strict ordering, same as the funnel twin
                if window_ms is not None and ts > t1 + window_ms:
                    continue
                prev_tk = tk
                tk = ts
                k += 1
                out["step_idx"].append(k)
                out["step"].append(steps[k - 1])
                out["ts"].append(ts)
                out["lat"].append(ts - prev_tk)

        state.update((last_ts, last_metric, t1, k, tk))
        if out["ts"]:
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "step_idx": out["step_idx"],
                    "step": out["step"],
                    "ts": out["ts"],
                    "latency_ms": out["lat"],
                }
            )

    return _group


def streaming_step_latency(
    stream_df: DataFrame,
    steps: Sequence[str],
    window_ms: int | None = None,
) -> DataFrame:
    """Input: streaming ``(user_id, metric, ts)`` events.  Output
    stream: one append row per step-k advance with k >= 2 — (user,
    step_idx, step, completion ts, ``latency_ms`` from the step-(k−1)
    completion).  State is the SAME five scalars as
    :func:`streaming_funnel` (the previous completion ts ``tk`` is
    already the latency anchor — no state growth).  Over an in-order
    replay, the per-step latency multiset equals the batch
    :func:`~rhq_metrics_spark.operators.funnel.funnel_step_latency`
    per-user latencies (pytest-pinned): the batch operator's exact
    lower median / floor mean / sum / max per step are ONE tiny agg
    over this stream's sink."""
    return stream_df.groupBy("user_id").applyInPandasWithState(
        _make_step_latency_fn(steps, window_ms),
        outputStructType=STEP_LATENCY_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming W16: live cohort retention — the continuous twin of
# operators/funnel.py cohort_retention.

COHORT_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("cohort_period", LongType(), False),
        StructField("period_k", LongType(), False),
        StructField("ts", LongType(), False),
    ]
)

COHORT_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType(), True),
        StructField("t0", LongType(), True),
        StructField("seen_ks", ArrayType(LongType()), True),
    ]
)


def _make_cohort_fn(period_ms: int):
    def _group(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_ts, t0, seen = state.get
            seen = set(seen or [])
        else:
            last_ts, t0, seen = None, None, set()

        out: dict[str, list] = {"cohort_period": [], "period_k": [], "ts": []}
        entry_ts = last_ts
        frames = list(pdfs)
        merged = pd.concat(frames) if frames else pd.DataFrame()
        if len(merged):
            merged = merged.sort_values(["ts"])
            for ts in merged["ts"]:
                ts = int(ts)
                if entry_ts is not None and ts <= entry_ts:
                    continue
                last_ts = ts
                if t0 is None:
                    t0 = ts  # in-order stream: first event IS min(ts)
                k = ts // period_ms - t0 // period_ms
                if k in seen:
                    continue
                seen.add(k)
                out["cohort_period"].append(t0 // period_ms)
                out["period_k"].append(k)
                out["ts"].append(ts)

        state.update((last_ts, t0, sorted(seen)))
        if out["ts"]:
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "cohort_period": out["cohort_period"],
                    "period_k": out["period_k"],
                    "ts": out["ts"],
                }
            )

    return _group


def streaming_cohort_activity(
    stream_df: DataFrame,
    period_ms: int = 7 * 86_400_000,
) -> DataFrame:
    """Input: streaming ``(user_id, ts)`` events (extra columns
    ignored).  Output stream: one append row per user's FIRST activity
    in each period offset — ``groupBy(cohort_period, period_k).count``
    on the sink is exactly the batch ``cohort_retention`` matrix's
    ``active_users`` over an in-order replay (every later event in the
    same offset dedups against the per-user ``seen`` set).

    State per user: first-activity ts + the distinct period offsets
    seen — bounded by the user's lifetime in periods (weeks of weekly
    periods), not by event volume."""
    return stream_df.groupBy("user_id").applyInPandasWithState(
        _make_cohort_fn(period_ms),
        outputStructType=COHORT_OUTPUT_SCHEMA,
        stateStructType=COHORT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming W17: live event-transition pairs — the continuous twin of
# operators/funnel.py event_transitions.

TRANSITIONS_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("from_type", StringType(), False),
        StructField("to_type", StringType(), False),
        StructField("ts", LongType(), False),
    ]
)

#: last event of the user's timeline so far: the (ts, type, value_q)
#: composite ORDER key doubles as the replay guard; value is carried
#: quantized to micro-units so the state row stays all-integer.
TRANSITIONS_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType(), True),
        StructField("last_type", StringType(), True),
        StructField("last_vq", LongType(), True),
    ]
)

_VQ = 1_000_000

#: null values sort BEFORE any real quantized value in the composite
#: order key — matching the batch ``event_transitions`` window order
#: (Spark ASC = NULLS FIRST).  The sentinel is int64 MIN and real
#: quantized values are saturated to ±2**62 (ADVICE r13: the old
#: -(2**62) sentinel left a real-value band in (-9.2e12, -4.61e12]
#: quantizing BELOW it), so null < every real key always holds and the
#: int64 cast can never overflow.
_VQ_NULL = -(2**63)
_VQ_SAT = 2**62


def _quantize_order_values(values: "pd.Series") -> "pd.Series":
    """µ-unit fixed-point order key: round(value · 1e6) saturated to
    ±2**62, nulls to the int64-min sentinel (strictly below any real
    key — the NULLS FIRST contract shared with the batch windows)."""
    vq = (values * _VQ).round().clip(lower=float(-_VQ_SAT), upper=float(_VQ_SAT))
    return vq.where(values.notna(), float(_VQ_NULL)).astype("int64")


def _transitions_group(
    key: tuple,
    pdfs: "Iterator[pd.DataFrame]",
    state: "GroupState",
) -> "Iterator[pd.DataFrame]":
    (user_id,) = key
    if state.exists:
        last_ts, last_type, last_vq = state.get
    else:
        last_ts, last_type, last_vq = None, None, None
    entry_key = (
        (last_ts, last_type or "", last_vq) if last_ts is not None else None
    )
    out: dict[str, list] = {"from_type": [], "to_type": [], "ts": []}
    frames = list(pdfs)
    merged = pd.concat(frames) if frames else pd.DataFrame()
    if len(merged):
        # null-tolerant quantization (ADVICE r12): a null/NaN value
        # must not crash the int64 cast — it maps to the NULLS FIRST
        # sentinel, the same order the batch operator's ASC window
        # gives null values.
        merged = merged.assign(_vq=_quantize_order_values(merged["value"]))
        merged = merged.sort_values(["ts", "metric", "_vq"])
        for ts, et, vq in zip(merged["ts"], merged["metric"], merged["_vq"]):
            ts, et, vq = int(ts), str(et), int(vq)
            # replay guard on the FULL composite order key, same
            # discipline as the funnel twin (ADVICE r11)
            if entry_key is not None and (ts, et, vq) <= entry_key:
                continue
            if last_type is not None:
                out["from_type"].append(last_type)
                out["to_type"].append(et)
                out["ts"].append(ts)
            last_ts, last_type, last_vq = ts, et, vq
            entry_key = (ts, et, vq)
    state.update((last_ts, last_type, last_vq))
    if out["ts"]:
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "from_type": out["from_type"],
                "to_type": out["to_type"],
                "ts": out["ts"],
            }
        )


def streaming_transitions(stream_df: DataFrame) -> DataFrame:
    """Input: streaming ``(user_id, metric, ts, value)`` events.
    Output stream: one append row per TRANSITION — (user, from_type,
    to_type, ts of the destination event).  ``groupBy(from_type,
    to_type).count()`` on the sink gives the live transition matrix;
    over an in-order replay the pair multiset equals the batch
    ``event_transitions`` pair expansion (the batch operator's
    (from_total, prob_ppm) finalization is one tiny agg over it).
    State is three scalars per user — the last event of the timeline;
    transitions spanning micro-batch boundaries are emitted exactly
    once."""
    return stream_df.groupBy("user_id").applyInPandasWithState(
        _transitions_group,
        outputStructType=TRANSITIONS_OUTPUT_SCHEMA,
        stateStructType=TRANSITIONS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming W19: live event paths — the continuous twin of
# operators/funnel.py frequent_paths (fixed length = PATHS_LENGTH).

PATHS_LENGTH = 3

PATHS_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("path", StringType(), False),
        StructField("ts", LongType(), False),
    ]
)

#: the last (PATHS_LENGTH - 1) events of the user's timeline, newest
#: last, as parallel arrays — plus the composite replay-guard key of
#: the newest one (same discipline as the transitions twin).
PATHS_STATE_SCHEMA = StructType(
    [
        StructField("tss", ArrayType(LongType()), True),
        StructField("types", ArrayType(StringType()), True),
        StructField("vqs", ArrayType(LongType()), True),
    ]
)


def _paths_group(
    key: tuple,
    pdfs: "Iterator[pd.DataFrame]",
    state: "GroupState",
) -> "Iterator[pd.DataFrame]":
    (user_id,) = key
    keep = PATHS_LENGTH - 1
    if state.exists:
        tss, types, vqs = (list(x) for x in state.get)
    else:
        tss, types, vqs = [], [], []
    entry_key = (tss[-1], types[-1], vqs[-1]) if tss else None
    out: dict[str, list] = {"path": [], "ts": []}
    frames = list(pdfs)
    merged = pd.concat(frames) if frames else pd.DataFrame()
    if len(merged):
        # null TYPE rows are dropped, matching the batch operator's
        # up-front filter (ADVICE r13): concat_ws would silently skip a
        # null step and count a shortened path as complete.
        merged = merged[merged["metric"].notna()]
        merged = merged.assign(_vq=_quantize_order_values(merged["value"]))
        merged = merged.sort_values(["ts", "metric", "_vq"])
        for ts, et, v in zip(merged["ts"], merged["metric"], merged["_vq"]):
            ts, et, v = int(ts), str(et), int(v)
            if entry_key is not None and (ts, et, v) <= entry_key:
                continue
            if len(types) == keep:
                out["path"].append(">".join(types + [et]))
                out["ts"].append(ts)
            tss = (tss + [ts])[-keep:]
            types = (types + [et])[-keep:]
            vqs = (vqs + [v])[-keep:]
            entry_key = (ts, et, v)
    state.update((tss, types, vqs))
    if out["ts"]:
        yield pd.DataFrame(
            {"user_id": user_id, "path": out["path"], "ts": out["ts"]}
        )


def streaming_paths(stream_df: DataFrame) -> DataFrame:
    """Input: streaming ``(user_id, metric, ts, value)`` events.
    Output stream: one append row per COMPLETED length-``PATHS_LENGTH``
    path (ts = the closing event).  ``groupBy(path).count()`` on the
    sink equals the batch :func:`~rhq_metrics_spark.operators.funnel.
    frequent_paths` occurrence multiset over an in-order replay —
    the top-k ranking is one tiny agg over it.  State is the last
    ``PATHS_LENGTH − 1`` events per user (three short arrays); paths
    spanning micro-batch boundaries are emitted exactly once via the
    composite (ts, type, value) replay guard."""
    return stream_df.groupBy("user_id").applyInPandasWithState(
        _paths_group,
        outputStructType=PATHS_OUTPUT_SCHEMA,
        stateStructType=PATHS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming W20: live last-touch attribution — the continuous twin of
# operators/funnel.py attribution.

ATTR_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("touch_type", StringType(), False),
        StructField("ts", LongType(), False),
        StructField("value_micro", LongType(), False),
    ]
)

#: the user's most recent touch event (ts + type) plus the composite
#: replay-guard key of the newest PROCESSED event (any type).
ATTR_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType(), True),
        StructField("last_type", StringType(), True),
        StructField("last_vq", LongType(), True),
        StructField("touch_ts", LongType(), True),
        StructField("touch_type", StringType(), True),
    ]
)


def _make_attribution_fn(
    conversion: str, touches: set, lookback_ms: int | None
):
    def _group(
        key: tuple,
        pdfs: "Iterator[pd.DataFrame]",
        state: "GroupState",
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_ts, last_type, last_vq, touch_ts, touch_type = state.get
        else:
            last_ts, last_type, last_vq, touch_ts, touch_type = (
                None, None, None, None, None,
            )
        entry_key = (
            (last_ts, last_type or "", last_vq)
            if last_ts is not None else None
        )
        out: dict[str, list] = {"touch_type": [], "ts": [], "vq": []}
        frames = list(pdfs)
        merged = pd.concat(frames) if frames else pd.DataFrame()
        if len(merged):
            merged = merged.assign(_vq=_quantize_order_values(merged["value"]))
            merged = merged.sort_values(["ts", "metric", "_vq"])
            for ts, et, v, val in zip(
                merged["ts"], merged["metric"], merged["_vq"], merged["value"]
            ):
                ts, et, v = int(ts), str(et), int(v)
                if entry_key is not None and (ts, et, v) <= entry_key:
                    continue
                if et == conversion:
                    ok = touch_ts is not None and (
                        lookback_ms is None or ts - touch_ts <= lookback_ms
                    )
                    out["touch_type"].append(
                        touch_type if ok else "(none)"
                    )
                    out["ts"].append(ts)
                    # same fixed point as the batch operator:
                    # floor(value * 1e6), null credits 0
                    out["vq"].append(
                        0 if pd.isna(val)
                        else int(math.floor(float(val) * _VQ))
                    )
                elif et in touches:
                    touch_ts, touch_type = ts, et
                last_ts, last_type, last_vq = ts, et, v
                entry_key = (ts, et, v)
        state.update((last_ts, last_type, last_vq, touch_ts, touch_type))
        if out["ts"]:
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "touch_type": out["touch_type"],
                    "ts": out["ts"],
                    "value_micro": out["vq"],
                }
            )

    return _group


def streaming_attribution(
    stream_df: DataFrame,
    conversion: str,
    touches: "Sequence[str]",
    lookback_ms: int | None = None,
) -> DataFrame:
    """Input: streaming ``(user_id, metric, ts, value)`` events.
    Output stream: one append row per CONVERSION with the credited
    touch type — ``groupBy(touch_type).agg(count, sum(value_micro))``
    on the sink equals the batch :func:`~rhq_metrics_spark.operators.
    funnel.attribution` aggregate over an in-order replay.  State is
    five scalars per user (the replay-guard composite + the standing
    last touch); conversions spanning micro-batch boundaries credit
    exactly once."""
    if not touches:
        raise ValueError("streaming_attribution: touches must be non-empty")
    if conversion in set(touches):
        raise ValueError(
            "streaming_attribution: conversion cannot be a touch type"
        )
    return stream_df.groupBy("user_id").applyInPandasWithState(
        _make_attribution_fn(conversion, set(touches), lookback_ms),
        outputStructType=ATTR_OUTPUT_SCHEMA,
        stateStructType=ATTR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming W18: live activity rows — the continuous leg of
# operators/funnel.py active_users.

ACTIVITY_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("period", LongType(), False),
        StructField("ts", LongType(), False),
    ]
)

ACTIVITY_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType(), True),
        StructField("seen_periods", ArrayType(LongType()), True),
    ]
)


def _make_activity_fn(period_ms: int):
    def _group(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_ts, seen = state.get
            seen = set(seen or [])
        else:
            last_ts, seen = None, set()
        out: dict[str, list] = {"period": [], "ts": []}
        frames = list(pdfs)
        merged = pd.concat(frames) if frames else pd.DataFrame()
        if len(merged):
            merged = merged.sort_values(["ts"])
            for ts in merged["ts"]:
                ts = int(ts)
                if last_ts is not None and ts <= last_ts:
                    continue
                last_ts = ts
                p = ts // period_ms
                if p in seen:
                    continue
                seen.add(p)
                out["period"].append(p)
                out["ts"].append(ts)
        state.update((last_ts, sorted(seen)))
        if out["ts"]:
            yield pd.DataFrame(
                {"user_id": user_id, "period": out["period"], "ts": out["ts"]}
            )

    return _group


def streaming_activity(
    stream_df: DataFrame,
    period_ms: int = 86_400_000,
) -> DataFrame:
    """Input: streaming ``(user_id, ts)`` events (extra columns
    ignored).  Output stream: one append row per user's FIRST activity
    in each ABSOLUTE period — the sink table IS the distinct
    ``(user, period)`` reduction that batch
    :func:`~rhq_metrics_spark.operators.funnel.active_users` starts
    from, so any window's exact DAU/WAU/MAU is one interval-merge pass
    over the standing sink with zero event re-reads (and
    ``groupBy(period).count()`` on the sink is live exact DAU
    directly).  The W18 twin completes the W15–W20 family: every
    product-analytics operator has a streaming leg.

    State per user: last processed ts + the distinct periods seen —
    bounded by the user's lifetime in periods (days of daily periods),
    not by event volume; the same bound class as the cohort twin."""
    if period_ms <= 0:
        raise ValueError(f"streaming_activity: period_ms must be > 0: {period_ms}")
    return stream_df.groupBy("user_id").applyInPandasWithState(
        _make_activity_fn(period_ms),
        outputStructType=ACTIVITY_OUTPUT_SCHEMA,
        stateStructType=ACTIVITY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
