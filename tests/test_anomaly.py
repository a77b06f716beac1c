from __future__ import annotations

import math

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
