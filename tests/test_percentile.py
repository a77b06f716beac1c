from __future__ import annotations

import random

import pytest

from rhq_metrics_spark.operators.percentile import P2Estimator, p2_percentiles


def test_small_samples_are_exact():
    e = P2Estimator(0.5)
    for x in [3.0, 1.0, 2.0]:
        e.add(x)
    assert e.result() == 2.0  # exact median below 5 observations
    assert P2Estimator(0.9).result() is None


def test_tracks_known_distribution():
    rng = random.Random(42)
    for p, tol in [(0.5, 0.02), (0.9, 0.02), (0.99, 0.02)]:
        e = P2Estimator(p)
        for _ in range(20_000):
            e.add(rng.random())
        assert abs(e.result() - p) < tol, p


def test_deterministic_given_order():
    vals = [random.Random(7).random() for _ in range(500)]
    a, b = P2Estimator(0.95), P2Estimator(0.95)
    for x in vals:
        a.add(x)
        b.add(x)
    assert a.result() == b.result()


def test_jain_chlamtac_paper_example():
    """The worked example from Jain & Chlamtac (1985), Table I: 20
    observations, p=0.5 — markers after the run match the paper."""
    obs = [0.02, 0.15, 0.74, 3.39, 0.83, 22.37, 10.15, 15.43, 38.62,
           15.92, 34.60, 10.28, 1.47, 0.40, 0.05, 11.39, 0.27, 0.42,
           0.09, 11.37]
    e = P2Estimator(0.5)
    for x in obs:
        e.add(x)
    assert e.result() == pytest.approx(4.44, abs=0.005)


def test_spark_groups_match_python_twin(spark):
    rng = random.Random(1)
    rows = [
        (k, i, rng.gauss(100.0 if k == "a" else 10.0, 5.0))
        for k in ("a", "b")
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "key string, ts long, value double")
    got = {
        r["key"]: (r["samples"], r["p50"], r["p95"])
        for r in p2_percentiles(
            df, group_cols=["key"], order_cols=["ts"], percentiles=[50, 95]
        ).collect()
    }
    for k in ("a", "b"):
        e50, e95 = P2Estimator(0.5), P2Estimator(0.95)
        for kk, _, v in sorted((r for r in rows if r[0] == k), key=lambda r: r[1]):
            e50.add(v)
            e95.add(v)
        assert got[k] == (300, e50.result(), e95.result()), k
