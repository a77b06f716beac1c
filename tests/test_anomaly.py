from __future__ import annotations

import math

import pytest

from rhq_metrics_spark.operators.anomaly import rolling_zscore


def test_spike_flagged_baseline_not_inflated(spark):
    # 10 steady points then a spike; the spike's own value must not be
    # in its baseline frame
    rows = [("s", t, 10.0) for t in range(10)] + [("s", 10, 100.0)]
    df = spark.createDataFrame(rows, "key string, ts long, value double")
    out = {
        r["ts"]: r
        for r in rolling_zscore(
            df, on=["key"], order=["ts"], value_col="value",
            window_n=5, min_n=3, threshold=3.0,
        ).collect()
    }
    # constant baseline -> zero variance -> no z, not flagged
    assert out[5]["z"] is None and not out[5]["is_anomaly"]
    assert out[10]["base_mean"] == 10.0
    assert out[10]["base_std"] == 0.0  # trailing frame is constant
    assert out[10]["z"] is None  # zero variance guard
    assert not out[10]["is_anomaly"]


def test_zscore_values_and_min_n(spark):
    vals = [10.0, 20.0, 10.0, 20.0, 10.0, 20.0, 50.0]
    rows = [("s", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, ts long, value double")
    out = {
        r["ts"]: r
        for r in rolling_zscore(
            df, on=["key"], order=["ts"], value_col="value",
            window_n=10, min_n=4, threshold=2.0,
        ).collect()
    }
    for t in (0, 1, 2, 3):  # fewer than min_n trailing points
        assert out[t]["z"] is None
    # t=6: baseline = first six points, mean 15, pop std 5 -> z = 7
    base = vals[:6]
    mean = sum(base) / len(base)
    var = sum((v - mean) ** 2 for v in base) / len(base)
    assert out[6]["base_mean"] == round(mean, 4)
    assert out[6]["base_std"] == round(math.sqrt(var), 4)
    assert out[6]["z"] == round((50.0 - mean) / math.sqrt(var), 4)
    assert out[6]["is_anomaly"]


def test_partitions_independent(spark):
    rows = [("a", t, 1.0 * t) for t in range(8)] + [("b", t, 5.0) for t in range(8)]
    df = spark.createDataFrame(rows, "key string, ts long, value double")
    out = rolling_zscore(df, on=["key"], order=["ts"], value_col="value",
                         window_n=4, min_n=2).collect()
    b_rows = [r for r in out if r["key"] == "b"]
    assert all(r["z"] is None for r in b_rows)  # constant series
    a_flagged = [r for r in out if r["key"] == "a" and r["is_anomaly"]]
    assert a_flagged == []  # linear ramp never exceeds 3 sigma of its window


def test_rolling_quantile_matches_pandas(spark):
    """W8: trailing-window quantile equals pandas rolling().quantile
    with linear interpolation."""
    import numpy as np
    import pandas as pd

    from rhq_metrics_spark.operators.anomaly import rolling_quantile

    rng = np.random.RandomState(13)
    vals = rng.randint(0, 1000, 60).astype(float)
    rows = [("m", "u", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "metric string, user_id string, ts long, v double")
    for q in (0.5, 0.9):
        out = (
            rolling_quantile(df, on=["metric", "user_id"], order=["ts"],
                             value_col="v", q=q, window_n=10)
            .orderBy("ts").collect()
        )
        want = pd.Series(vals).rolling(10, min_periods=1).quantile(q, interpolation="linear")
        got = [r["rolling_q"] for r in out]
        assert got == pytest.approx(list(want), abs=1e-9), q


def test_rolling_quantile_min_n_and_robustness(spark):
    from rhq_metrics_spark.operators.anomaly import rolling_quantile

    rows = [("m", "u", i, 10.0 if i != 5 else 10_000.0) for i in range(12)]
    df = spark.createDataFrame(rows, "metric string, user_id string, ts long, v double")
    out = (
        rolling_quantile(df, on=["metric", "user_id"], order=["ts"],
                         value_col="v", q=0.5, window_n=5, min_n=3)
        .orderBy("ts").collect()
    )
    assert out[0]["rolling_q"] is None and out[1]["rolling_q"] is None
    # the single spike never moves the median (robust baseline)
    assert all(r["rolling_q"] == 10.0 for r in out[2:])


def test_rolling_quantile_validation(spark):
    from rhq_metrics_spark.operators.anomaly import rolling_quantile

    df = spark.createDataFrame([("m", "u", 0, 1.0)],
                               "metric string, user_id string, ts long, v double")
    with pytest.raises(ValueError):
        rolling_quantile(df, on=["metric"], order=["ts"], value_col="v", q=1.5)


def test_mean_shift_changepoint_flags_step_not_spike(spark):
    """W12+: a sustained level shift scores highest exactly at the step
    boundary; a lone spike and a constant series flag nothing."""
    from rhq_metrics_spark.operators.anomaly import mean_shift_changepoints

    # alternating ±0.1 texture keeps the pooled variance nonzero at the
    # boundary (two perfectly-constant levels hit the zero-variance
    # guard exactly there)
    step = [("s", t, 10.0 + (t % 2) * 0.2) for t in range(30)] + [
        ("s", 30 + t, 20.0 + (t % 2) * 0.2) for t in range(30)
    ]
    spike = [("p", t, 10.0 if t != 30 else 500.0) for t in range(60)]
    const = [("c", t, 7.0) for t in range(60)]
    df = spark.createDataFrame(
        step + spike + const, "key string, ts long, value double"
    )
    out = mean_shift_changepoints(
        df, on=["key"], order=["ts"], window_n=10, min_n=10, threshold=3.0
    )
    rows = {(r["key"], r["ts"]): r for r in out.collect()}
    # the step: max score at the last point of the old level
    s_scores = {
        t: rows[("s", t)]["score"]
        for t in range(60)
        if rows[("s", t)]["score"] is not None
    }
    assert max(s_scores, key=lambda t: abs(s_scores[t])) == 29
    assert rows[("s", 29)]["is_change"]
    assert rows[("s", 29)]["mean_prev"] == 10.1  # avg of 10.0/10.2
    assert rows[("s", 29)]["mean_next"] == 20.1
    # far from the boundary: no flags
    assert not rows[("s", 5)]["is_change"] and not rows[("s", 55)]["is_change"]
    # a lone spike inflates the pooled std instead of shifting the mean
    assert not any(rows[("p", t)]["is_change"] for t in range(60))
    # constant series: pooled std 0 -> null score, no flag
    assert all(rows[("c", t)]["score"] is None for t in range(60))
    assert not any(rows[("c", t)]["is_change"] for t in range(60))
    # min_n guard: head/tail rows have too few points on one side
    assert rows[("s", 3)]["score"] is None
    assert rows[("s", 58)]["score"] is None


def test_mean_shift_matches_python_twin(spark):
    """Exactness: every emitted double equals the same fixed op
    sequence over Python ints/floats, bit for bit."""
    import math

    from rhq_metrics_spark.operators.anomaly import mean_shift_changepoints

    vals = [3.17, 5.0, 4.42, 9.01, 2.76, 8.8, 7.3, 1.14, 6.6, 5.55,
            12.3, 11.7, 10.09, 13.4, 12.01]
    df = spark.createDataFrame(
        [("k", t, v) for t, v in enumerate(vals)],
        "key string, ts long, value double",
    )
    W, MINN = 4, 2
    out = {
        r["ts"]: r
        for r in mean_shift_changepoints(
            df, on=["key"], order=["ts"], window_n=W, min_n=MINN,
            value_scale=100,
        ).collect()
    }
    vq = [round(v * 100) for v in vals]
    for t in range(len(vals)):
        prev = vq[max(0, t - W + 1): t + 1]
        nxt = vq[t + 1: t + 1 + W]
        r = out[t]
        assert (r["n_prev"], r["n_next"]) == (len(prev), len(nxt))
        if len(prev) < MINN or len(nxt) < MINN:
            assert r["score"] is None
            continue
        mp = sum(prev) / len(prev)
        mn = sum(nxt) / len(nxt)
        vp = max(sum(x * x for x in prev) / len(prev) - mp * mp, 0.0)
        vn = max(sum(x * x for x in nxt) / len(nxt) - mn * mn, 0.0)
        pooled = math.sqrt((vp * len(prev) + vn * len(nxt)) / (len(prev) + len(nxt)))
        assert r["mean_prev"] == mp / 100 and r["mean_next"] == mn / 100
        if pooled > 0:
            assert r["score"] == (mn - mp) / pooled, t


def test_rank_anomalous_series_triage(spark):
    """W14: the fleet-triage view ranks the spiking series first, a
    mildly-noisy series later, and constant series (null z) last —
    deterministically — and raw points never reach the global rank."""
    from rhq_metrics_spark.operators.anomaly import rank_anomalous_series

    rows = (
        # light texture keeps the trailing std nonzero, so the spikes
        # score huge z instead of hitting the zero-variance guard
        [("spiky", t, 10.0 + (t % 3) * 0.1 if t % 25 else 90.0)
         for t in range(1, 75)]
        + [("noisy", t, 10.0 + (t % 5) * 0.3) for t in range(75)]
        + [("flat", t, 5.0) for t in range(75)]
    )
    df = spark.createDataFrame(rows, "key string, ts long, value double")
    out = rank_anomalous_series(
        df, on=["key"], order=["ts"], window_n=10, min_n=5,
        threshold=3.0, top_k=3,
    )
    got = [r.asDict() for r in out.orderBy("rank").collect()]
    assert [r["key"] for r in got] == ["spiky", "noisy", "flat"]
    assert got[0]["n_flagged"] > 0 and got[0]["max_abs_z"] > 3
    assert got[2]["max_abs_z"] is None  # constant series: null z, ranked last
    assert got[0]["n_points"] == 74
    # top_k truncates
    assert rank_anomalous_series(
        df, on=["key"], order=["ts"], top_k=1
    ).count() == 1


def test_service_top_anomalous_fleet_triage(spark, tmp_path):
    """W14 facade: one whole-tenant scan ranks the spiking metric first
    across the fleet; other tenants' series are pruned out."""
    from rhq_metrics_spark.service import MetricsService
    from rhq_metrics_spark.sources.store import MetricsStore

    svc = MetricsService(spark, MetricsStore(spark, str(tmp_path / "s")))
    rows = []
    for m, gen in (
        ("api_errors", lambda t: 1.0 + (t % 3) * 0.1 if t != 60 else 500.0),
        ("cpu", lambda t: 50.0 + (t % 7) * 0.5),
        ("steady", lambda t: 9.0),
    ):
        rows += [("t1", m, t * 60_000, float(gen(t)), None) for t in range(80)]
    rows += [("other", "api_errors", 0, 1.0, None)]  # another tenant
    svc.add_data_points("gauge", spark.createDataFrame(
        rows, "tenant_id string, metric string, ts long, value double, "
              "tags map<string,string>"))
    out = [r.asDict() for r in svc.top_anomalous(
        "t1", 0, 80 * 60_000, top_k=5
    ).orderBy("rank").collect()]
    assert [r["metric"] for r in out] == ["api_errors", "cpu", "steady"]
    assert out[0]["n_flagged"] >= 1 and out[0]["max_abs_z"] > 3
    assert out[2]["max_abs_z"] is None  # constant series ranks last
    assert out[0]["n_points"] == 80  # the other tenant's row is pruned
