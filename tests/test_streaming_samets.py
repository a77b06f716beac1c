"""Same-timestamp contract of the streaming twins (ADVICE r3).

Two DISTINCT points sharing a ts inside one micro-batch must both be
processed, in the batch path's (ts, value) order; points at-or-before
the state's last_ts from a PRIOR batch stay skipped (replay guard).
Drives the applyInPandasWithState group functions directly with a fake
GroupState — no streaming query, so the parity cases stay fast.
"""

from __future__ import annotations

import pandas as pd


class FakeState:
    def __init__(self, value=None):
        self._value = value

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, value):
        self._value = tuple(value)


def _pdf(rows):
    return pd.DataFrame(rows)


def test_zscore_same_ts_within_batch_processed():
    from rhq_metrics_spark.streaming.anomaly import _make_anomaly_fn

    fn = _make_anomaly_fn(window_n=5, min_n=1, threshold=3.0)
    T = 1_000_000
    batch = _pdf(
        {
            "ts": [T, T + 1000, T + 1000, T + 2000],
            "value": [10.0, 12.0, 11.0, 13.0],
        }
    )
    state = FakeState()
    out = pd.concat(list(fn(("t", "m"), iter([batch]), state)))
    # all four points emitted; the same-ts pair ordered by value (11 then 12)
    assert list(out["ts"]) == [T, T + 1000, T + 1000, T + 2000]
    assert list(out["value"]) == [10.0, 11.0, 12.0, 13.0]
    # ring state advanced through every point
    last_ts, ring = state.get
    assert last_ts == T + 2000 and list(ring) == [10.0, 11.0, 12.0, 13.0]


def test_zscore_prior_batch_replay_still_skipped():
    from rhq_metrics_spark.streaming.anomaly import _make_anomaly_fn

    fn = _make_anomaly_fn(window_n=5, min_n=1, threshold=3.0)
    T = 1_000_000
    state = FakeState((T + 1000, [10.0, 12.0]))
    batch = _pdf({"ts": [T + 1000, T + 2000], "value": [99.0, 13.0]})
    out = pd.concat(list(fn(("t", "m"), iter([batch]), state)))
    # the ts == last_ts point from a prior batch is a replay: skipped
    assert list(out["ts"]) == [T + 2000]
    assert state.get[0] == T + 2000


def test_zscore_multiple_chunks_sorted_globally():
    """applyInPandasWithState may deliver one group as several chunks;
    they must be merged and sorted before processing."""
    from rhq_metrics_spark.streaming.anomaly import _make_anomaly_fn

    fn = _make_anomaly_fn(window_n=5, min_n=1, threshold=3.0)
    T = 1_000_000
    c1 = _pdf({"ts": [T + 2000], "value": [13.0]})
    c2 = _pdf({"ts": [T, T + 1000], "value": [10.0, 12.0]})
    state = FakeState()
    out = pd.concat(list(fn(("t", "m"), iter([c1, c2]), state)))
    assert list(out["ts"]) == [T, T + 1000, T + 2000]


def test_segments_same_ts_within_batch():
    from rhq_metrics_spark.streaming.availability import _segments_group

    T = 1_000_000
    batch = _pdf(
        {
            "ts": [T, T + 1000, T + 1000, T + 2000],
            "value": ["up", "down", "admin", "up"],
        }
    )
    state = FakeState()
    out = pd.concat(list(_segments_group(("t", "m"), iter([batch]), state)))
    segs = list(zip(out["seg_start"], out["seg_end"], out["state"]))
    # same-ts pair ordered by value: admin < down, so up→admin (len 1000),
    # admin→down (len 0), down→up (len 1000)
    assert segs == [
        (T, T + 1000, "up"),
        (T + 1000, T + 1000, "admin"),
        (T + 1000, T + 2000, "down"),
    ]
    assert state.get == (T + 2000, "up")


def test_funnel_same_ts_cross_batch_new_event_advances():
    """A genuinely NEW event in a later micro-batch sharing the prior
    batch's last timestamp must still advance the funnel (ADVICE r11):
    the replay guard keys on the full (ts, metric) sort key, not ts.
    """
    from rhq_metrics_spark.streaming.funnel import _make_funnel_fn

    fn = _make_funnel_fn(["view", "click"], window_ms=None)
    T = 1_000_000
    # batch N: a non-matching event at ts=T (funnel still at step 0)
    state = FakeState()
    b1 = _pdf({"ts": [T], "metric": ["other"]})
    out1 = list(fn((7,), iter([b1]), state))
    assert not out1  # no advance
    assert state.get[0] == T and state.get[1] == "other"
    # batch N+1: the qualifying first step arrives AT THE SAME ts
    b2 = _pdf({"ts": [T], "metric": ["view"]})
    out2 = pd.concat(list(fn((7,), iter([b2]), state)))
    assert list(out2["step"]) == ["view"] and list(out2["ts"]) == [T]
    # ...and a whole-batch REPLAY of that same event stays skipped
    out3 = list(fn((7,), iter([_pdf({"ts": [T], "metric": ["view"]})]), state))
    assert not out3
    # a later event still advances normally after the same-ts dance
    out4 = pd.concat(
        list(fn((7,), iter([_pdf({"ts": [T + 1], "metric": ["click"]})]), state))
    )
    assert list(out4["step"]) == ["click"]


def test_p2_same_ts_within_batch_feeds_estimator():
    from rhq_metrics_spark.operators.percentile import P2Estimator
    from rhq_metrics_spark.streaming.percentile import _make_p2_fn

    fn = _make_p2_fn([0.5], ["p50"])
    T = 1_000_000
    vals = [10.0, 12.0, 11.0, 13.0, 9.0, 14.0]
    batch = _pdf(
        {
            "ts": [T, T + 1000, T + 1000, T + 2000, T + 2000, T + 3000],
            "value": vals,
        }
    )
    state = FakeState()
    out = pd.concat(list(fn(("t", "m"), iter([batch]), state)))
    assert len(out) == len(vals)  # both same-ts pairs processed
    # running estimates equal the batch estimator fed in (ts, value) order
    ref = P2Estimator(0.5)
    expected = []
    for v in sorted(
        zip(batch["ts"], batch["value"]), key=lambda p: (p[0], p[1])
    ):
        ref.add(float(v[1]))
        expected.append(ref.result())
    assert list(out["p50"]) == expected


def test_transitions_null_value_tolerated_and_ordered_nulls_first():
    """ADVICE r12: a null/NaN value must not crash the int64 quantize;
    it orders BEFORE any real value in the (ts, type, value) composite
    — the batch window's ASC NULLS FIRST — and the replay guard still
    works when the state's last value was null."""
    import numpy as np

    from rhq_metrics_spark.streaming.funnel import _transitions_group

    # same (ts, type) with a null and a real value: null first, so the
    # emitted transition is view->view at ts 10, then view->click
    batch = _pdf(
        {
            "ts": [10, 10, 20],
            "metric": ["view", "view", "click"],
            "value": [np.nan, 2.0, np.nan],
        }
    )
    state = FakeState()
    out = pd.concat(list(_transitions_group((1,), iter([batch]), state)))
    assert list(zip(out["from_type"], out["to_type"], out["ts"])) == [
        ("view", "view", 10),
        ("view", "click", 20),
    ]
    last_ts, last_type, last_vq = state.get
    assert (last_ts, last_type) == (20, "click")

    # replay of the null-valued last event from a prior batch: skipped;
    # a NEW same-ts event with a real value still advances
    state2 = FakeState((10, "view", last_vq))  # last_vq is the null sentinel
    batch2 = _pdf(
        {"ts": [10, 10], "metric": ["view", "view"], "value": [np.nan, 2.0]}
    )
    out2 = pd.concat(list(_transitions_group((1,), iter([batch2]), state2)))
    assert list(zip(out2["from_type"], out2["to_type"], out2["ts"])) == [
        ("view", "view", 10)
    ]


def test_paths_cross_batch_and_replay_guard():
    """Length-3 paths spanning micro-batch boundaries are emitted
    exactly once; a replayed prefix is skipped; path multiset equals
    the batch sliding-window expansion."""
    from rhq_metrics_spark.streaming.funnel import _paths_group

    b1 = _pdf({"ts": [10, 20], "metric": ["v", "c"], "value": [1.0, 1.0]})
    state = FakeState()
    out1 = list(_paths_group((1,), iter([b1]), state))
    assert out1 == []  # only 2 events seen, no complete path yet
    # batch 2 replays (20, c) and adds two new events
    b2 = _pdf(
        {"ts": [20, 30, 40], "metric": ["c", "v", "p"], "value": [1.0, 1.0, 1.0]}
    )
    out2 = pd.concat(list(_paths_group((1,), iter([b2]), state)))
    assert list(zip(out2["path"], out2["ts"])) == [("v>c>v", 30), ("c>v>p", 40)]
    tss, types, vqs = state.get
    assert list(types) == ["v", "p"]


def test_paths_same_ts_composite_order_and_null_value():
    """Same-ts events order by (type, value) with null values first —
    matching the batch frequent_paths window order."""
    import numpy as np

    from rhq_metrics_spark.streaming.funnel import _paths_group

    batch = _pdf(
        {
            "ts": [10, 10, 10, 20],
            "metric": ["b", "a", "a", "c"],
            "value": [1.0, 2.0, np.nan, 1.0],
        }
    )
    state = FakeState()
    out = pd.concat(list(_paths_group((1,), iter([batch]), state)))
    # order: (10,a,null), (10,a,2.0), (10,b,1.0), (20,c,1.0)
    assert list(out["path"]) == ["a>a>b", "a>b>c"]


def test_paths_null_type_filtered_matches_batch():
    """ADVICE r13: null event TYPES are dropped up front in the
    streaming twin, mirroring the batch frequent_paths filter — the
    surviving events become adjacent instead of producing a 'None'
    step string."""
    import numpy as np

    from rhq_metrics_spark.streaming.funnel import _paths_group

    batch = _pdf(
        {
            "ts": [10, 20, 30, 40],
            "metric": ["v", np.nan, "c", "p"],
            "value": [1.0, 1.0, 1.0, 1.0],
        }
    )
    state = FakeState()
    out = pd.concat(list(_paths_group((1,), iter([batch]), state)))
    assert list(out["path"]) == ["v>c>p"]


def test_quantize_sentinel_below_every_real_value():
    """ADVICE r13: the null order-key sentinel is int64 MIN and real
    quantized values saturate at +/-2**62, so a huge-magnitude
    negative value (the old -(2**62) sentinel's blind spot, e.g.
    -5e12 µ-quantized to -5e18) can no longer sort below null."""
    import numpy as np

    from rhq_metrics_spark.streaming.funnel import (
        _VQ_NULL,
        _quantize_order_values,
    )

    vals = pd.Series([np.nan, -5.0e12, -9.3e12, 9.3e12, 2.0])
    vq = _quantize_order_values(vals)
    assert vq.iloc[0] == _VQ_NULL
    # every REAL value stays strictly above the sentinel, even the
    # band that undercut the old -(2**62) sentinel and magnitudes
    # whose µ-quantization would overflow int64 without saturation
    assert (vq.iloc[1:] > _VQ_NULL).all()
    assert vq.iloc[2] == -(2**62) and vq.iloc[3] == 2**62
    assert vq.iloc[4] == 2_000_000


def test_attribution_cross_batch_credit_and_replay():
    """A conversion in a later batch credits the touch from a PRIOR
    batch exactly once; replayed prefixes skip; lookback applies."""
    from rhq_metrics_spark.streaming.funnel import _make_attribution_fn

    fn = _make_attribution_fn("buy", {"ad", "email"}, lookback_ms=50)
    state = FakeState()
    b1 = _pdf({"ts": [10], "metric": ["ad"], "value": [0.0]})
    assert list(fn((1,), iter([b1]), state)) == []
    # batch 2 replays the ad, then converts twice (second outside
    # lookback)
    b2 = _pdf(
        {"ts": [10, 30, 100], "metric": ["ad", "buy", "buy"],
         "value": [0.0, 1.5, 2.0]}
    )
    out = pd.concat(list(fn((1,), iter([b2]), state)))
    assert list(zip(out["touch_type"], out["ts"], out["value_micro"])) == [
        ("ad", 30, 1_500_000), ("(none)", 100, 2_000_000),
    ]


def test_attribution_matches_batch_operator(spark):
    """Stream rows aggregated == the batch attribution table on a
    planted in-order fixture."""
    from rhq_metrics_spark.operators.funnel import attribution
    from rhq_metrics_spark.streaming.funnel import _make_attribution_fn

    rows = [
        (1, "ad", 10, 0.0), (1, "email", 20, 0.0), (1, "buy", 30, 1.5),
        (1, "buy", 100, 2.0),
        (2, "buy", 5, 0.5),
        (3, "ad", 10, 0.0), (3, "buy", 40, None),
    ]
    fn = _make_attribution_fn("buy", {"ad", "email"}, lookback_ms=50)
    import collections
    agg = collections.defaultdict(lambda: [0, set(), 0])
    for u in (1, 2, 3):
        batch = _pdf(
            {
                "ts": [r[2] for r in rows if r[0] == u],
                "metric": [r[1] for r in rows if r[0] == u],
                "value": [r[3] for r in rows if r[0] == u],
            }
        )
        for df_out in fn((u,), iter([batch]), FakeState()):
            for _, r in df_out.iterrows():
                a = agg[r["touch_type"]]
                a[0] += 1
                a[1].add(u)
                a[2] += int(r["value_micro"])
    bdf = spark.createDataFrame(
        rows, "user_id long, metric string, ts long, value double"
    )
    batch_out = {
        r["touch_type"]: (r["conversions"], r["users"], r["value_micro"])
        for r in attribution(bdf, "buy", ["ad", "email"], lookback_ms=50).collect()
    }
    stream_out = {
        k: (v[0], len(v[1]), v[2]) for k, v in agg.items()
    }
    assert stream_out == batch_out


def test_streaming_activity_is_distinct_user_period_reduction():
    """The activity twin's cumulative rows equal the distinct
    (user, period) table batch active_users reduces to — in-period
    repeats dedup, replays skip, cross-batch state holds."""
    from rhq_metrics_spark.streaming.funnel import _make_activity_fn

    fn = _make_activity_fn(period_ms=1000)
    state = FakeState()
    b1 = _pdf({"ts": [100, 200, 1500]})
    out1 = pd.concat(list(fn((1,), iter([b1]), state)))
    assert list(out1["period"]) == [0, 1]
    # replay of ts<=1500 skips; new period 4 emits; repeat in 4 dedups
    b2 = _pdf({"ts": [1500, 4200, 4800]})
    out2 = pd.concat(list(fn((1,), iter([b2]), state)))
    assert list(out2["period"]) == [4]
    assert state.get[0] == 4800 and list(state.get[1]) == [0, 1, 4]


def test_streaming_activity_validation(spark):
    import pytest

    from rhq_metrics_spark.streaming.funnel import streaming_activity

    with pytest.raises(ValueError, match="period_ms"):
        streaming_activity(None, period_ms=0)
