"""Known-answer tests for operators/correlate.py (A10 pairwise Pearson,
W6 linear trend/forecast)."""

import math

import numpy as np
import pytest

from rhq_metrics_spark.operators.correlate import linear_trend, metric_correlation

HOUR = 3_600_000


def _points(spark, rows):
    return spark.createDataFrame(rows, "metric string, ts long, value double")


def test_perfectly_correlated_pair(spark):
    rows = []
    for t in range(6):
        rows.append(("a", t * HOUR + 1, float(t + 1)))
        rows.append(("b", t * HOUR + 2, float(2 * (t + 1) + 3)))
    out = metric_correlation(_points(spark, rows), HOUR).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["metric_a"], r["metric_b"], r["n_buckets"]) == ("a", "b", 6)
    # positive linear map -> r == 1 up to the floor quantization
    assert r["corr"] in (1.0, 0.999999)


def test_anti_correlated_pair(spark):
    rows = []
    for t in range(5):
        rows.append(("up", t * HOUR, float(t)))
        rows.append(("down", t * HOUR, float(10 - t)))
    out = metric_correlation(_points(spark, rows), HOUR).collect()
    assert len(out) == 1
    assert out[0]["corr"] in (-1.0, -1.000001)


def test_constant_series_dropped_and_min_overlap(spark):
    rows = []
    for t in range(4):
        rows.append(("flat", t * HOUR, 5.0))
        rows.append(("var", t * HOUR, float(t)))
    # flat has zero variance -> den == 0 -> pair dropped
    assert metric_correlation(_points(spark, rows), HOUR).count() == 0
    # overlap below min_overlap -> dropped
    short = [("a", 0, 1.0), ("b", 0, 2.0), ("a", HOUR, 2.0), ("b", HOUR, 1.0)]
    assert metric_correlation(_points(spark, short), HOUR, min_overlap=3).count() == 0


def test_correlation_matches_numpy(spark):
    rng = np.random.RandomState(7)
    xs = rng.randint(0, 10_000, 48) / 100.0
    ys = (xs * 3 + rng.randint(0, 5_000, 48) / 100.0).round(2)
    rows = []
    for t, (x, y) in enumerate(zip(xs, ys)):
        rows.append(("x", t * HOUR, float(x)))
        rows.append(("y", t * HOUR, float(y)))
    got = metric_correlation(_points(spark, rows), HOUR).collect()[0]["corr"]
    want = np.corrcoef(xs, ys)[0, 1]
    assert got == pytest.approx(want, abs=2e-6)


def test_bucket_alignment_only_shared_buckets_count(spark):
    rows = [
        ("a", 0, 1.0), ("a", HOUR, 2.0), ("a", 2 * HOUR, 3.0), ("a", 9 * HOUR, 9.0),
        ("b", 0, 2.0), ("b", HOUR, 4.0), ("b", 2 * HOUR, 6.0), ("b", 5 * HOUR, 1.0),
    ]
    out = metric_correlation(_points(spark, rows), HOUR).collect()
    assert out[0]["n_buckets"] == 3  # buckets 0,1,2 only


def test_linear_trend_exact_line(spark):
    # value = 2*t + 10 at one point per hourly bucket -> slope 2, intercept 10
    rows = [("m", t * HOUR, float(2 * t + 10)) for t in range(10)]
    out = linear_trend(_points(spark, rows), HOUR, horizon_buckets=5).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_buckets"] == 10
    assert r["slope_per_bucket"] == pytest.approx(2.0, abs=1e-4)
    assert r["intercept"] == pytest.approx(10.0, abs=1e-4)
    # forecast at t = 9 + 5 = 14 -> 2*14 + 10 = 38
    assert r["forecast"] == pytest.approx(38.0, abs=1e-4)


def test_linear_trend_relative_t_and_multiple_points_per_bucket(spark):
    # series starts late; t is relative to its own first bucket.  Two
    # points in one bucket sum (operator contract: trend of bucket sums).
    rows = [
        ("m", 100 * HOUR, 4.0), ("m", 100 * HOUR + 1, 6.0),  # t=0: sum 10
        ("m", 101 * HOUR, 20.0),                              # t=1: sum 20
        ("m", 102 * HOUR, 30.0),                              # t=2: sum 30
    ]
    r = linear_trend(_points(spark, rows), HOUR, horizon_buckets=1).collect()[0]
    assert r["slope_per_bucket"] == pytest.approx(10.0, abs=1e-4)
    assert r["intercept"] == pytest.approx(10.0, abs=1e-4)
    assert r["forecast"] == pytest.approx(40.0, abs=1e-4)


def test_linear_trend_single_bucket_dropped(spark):
    rows = [("m", 5, 1.0), ("m", 6, 2.0)]  # same bucket
    assert linear_trend(_points(spark, rows), HOUR).count() == 0


def test_trend_matches_numpy_polyfit(spark):
    rng = np.random.RandomState(11)
    vals = (rng.randint(0, 100_000, 30) / 100.0).astype(float)
    rows = [("m", t * HOUR, float(v)) for t, v in enumerate(vals)]
    r = linear_trend(_points(spark, rows), HOUR, horizon_buckets=0).collect()[0]
    slope, intercept = np.polyfit(np.arange(30), vals, 1)
    assert r["slope_per_bucket"] == pytest.approx(slope, abs=1e-3)
    assert r["intercept"] == pytest.approx(intercept, abs=1e-3)
    assert math.isfinite(r["forecast"])
