"""W1 rate derivation — gauge and counter (reset) semantics.

Oracle: per adjacent pair 60000*(v2-v1)/(t2-t1) stamped at t2; counter
pairs with v2 < v1 dropped (MetricsServiceImpl.java:857-883).
"""

import pytest

from rhq_metrics_spark.model import Buckets
from rhq_metrics_spark.operators import rate, rate_stats

T0 = 1_700_000_000_000


def test_gauge_rate(gauge_points_factory):
    rows = [
        ("t1", "m", T0, 10.0),
        ("t1", "m", T0 + 30_000, 25.0),
        ("t1", "m", T0 + 90_000, 10.0),
    ]
    out = rate(gauge_points_factory(rows)).orderBy("ts").collect()
    assert len(out) == 2
    assert out[0]["ts"] == T0 + 30_000
    assert out[0]["rate"] == pytest.approx(60_000 * 15.0 / 30_000)  # 30/min
    assert out[1]["rate"] == pytest.approx(60_000 * -15.0 / 60_000)  # -15/min


def test_counter_reset_pairs_dropped(counter_points_factory):
    rows = [
        ("t1", "c", T0, 100),
        ("t1", "c", T0 + 60_000, 160),   # +60/min
        ("t1", "c", T0 + 120_000, 20),   # reset → pair dropped
        ("t1", "c", T0 + 180_000, 80),   # +60/min
    ]
    out = rate(counter_points_factory(rows), metric_type="counter").orderBy("ts").collect()
    assert [r["ts"] for r in out] == [T0 + 60_000, T0 + 180_000]
    for r in out:
        assert r["rate"] == pytest.approx(60.0)


def test_equal_values_not_a_reset(counter_points_factory):
    rows = [("t1", "c", T0, 5), ("t1", "c", T0 + 60_000, 5)]
    out = rate(counter_points_factory(rows), metric_type="counter").collect()
    assert len(out) == 1 and out[0]["rate"] == 0.0


def test_desc_order_same_values_limit_from_end(gauge_points_factory):
    rows = [("t1", "m", T0 + i * 60_000, float(i * i)) for i in range(5)]
    asc = rate(gauge_points_factory(rows)).orderBy("ts").collect()
    desc = rate(gauge_points_factory(rows), order="desc", limit=2).collect()
    # DESC pairs are normalized back to ascending before the rate is
    # computed — values identical, limit takes from the late end
    assert [r["rate"] for r in desc] == [asc[-1]["rate"], asc[-2]["rate"]]


def test_rate_is_per_series(gauge_points_factory):
    rows = [
        ("t1", "a", T0, 0.0),
        ("t1", "a", T0 + 60_000, 60.0),
        ("t1", "b", T0 + 30_000, 100.0),
        ("t1", "b", T0 + 90_000, 40.0),
    ]
    out = {
        (r["metric"]): r["rate"]
        for r in rate(gauge_points_factory(rows)).collect()
    }
    assert out["a"] == pytest.approx(60.0)
    assert out["b"] == pytest.approx(-60.0)


def test_rate_stats_composition(counter_points_factory):
    rows = [("t1", "c", T0 + i * 10_000, 100 * i) for i in range(12)]
    buckets = Buckets.from_step(T0, T0 + 120_000, 60_000)
    out = (
        rate_stats(counter_points_factory(rows), buckets, metric_type="counter")
        .orderBy("start")
        .collect()
    )
    # constant slope: 100 per 10s = 600/min everywhere
    assert len(out) == 2
    for r in out:
        assert r["avg"] == pytest.approx(600.0)
        assert r["min"] == pytest.approx(600.0)


def test_bucket_increase_counter_and_delta(spark):
    """W7: adjacent-pair increase per bucket — counter resets contribute
    the restarted value; delta mode keeps them negative."""
    from rhq_metrics_spark.operators.rate import bucket_increase

    HOUR = 3_600_000
    rows = [
        ("c", 0, 10.0), ("c", 1000, 15.0),        # +5 in bucket 0
        ("c", HOUR + 1, 3.0),                      # reset: contributes 3
        ("c", HOUR + 2000, 9.0),                   # +6
    ]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    out = {
        r["bucket_start"]: (r["n_pairs"], r["increase"])
        for r in bucket_increase(df, HOUR).collect()
    }
    assert out[0] == (1, 5.0)
    assert out[HOUR] == (2, 9.0)  # reset 3 + rise 6
    plain = {
        r["bucket_start"]: r["increase"]
        for r in bucket_increase(df, HOUR, counter=False).collect()
    }
    assert plain[HOUR] == pytest.approx(-6.0)  # reset -12, then +6


def test_bucket_increase_pair_straddles_bucket_boundary(spark):
    """A pair spanning two buckets lands in the LATER point's bucket
    (the rate stamping convention)."""
    from rhq_metrics_spark.operators.rate import bucket_increase

    HOUR = 3_600_000
    rows = [("m", HOUR - 1, 1.0), ("m", HOUR + 1, 4.0)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    out = bucket_increase(df, HOUR).collect()
    assert len(out) == 1
    assert out[0]["bucket_start"] == HOUR
    assert out[0]["increase"] == 3.0


def test_time_weighted_avg_known_answer(spark):
    """A12: value held for its duration — irregular bursts don't skew
    the mean; max_gap drops silent-period smears."""
    from rhq_metrics_spark.operators.rate import time_weighted_avg

    HOUR = 3_600_000
    # value 10 held 900s, then a burst of 3 points at 30 within 2s,
    # then back to 10 for the rest: plain avg of points = (10+30*3+10)/5
    # = 18; time-weighted is dominated by the held 10s
    rows = [
        ("m", 0, 10.0),
        ("m", 900_000, 30.0),     # 10 held 900s
        ("m", 901_000, 30.0),     # 30 held 1s
        ("m", 902_000, 30.0),     # 30 held 1s
        ("m", 1_800_000, 10.0),   # 30 held 898s
    ]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    out = time_weighted_avg(df, HOUR).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_pairs"] == 4 and r["held_ms"] == 1_800_000
    want = (10.0 * 900_000 + 30.0 * 1_000 + 30.0 * 1_000 + 30.0 * 898_000) / 1_800_000
    assert r["twa"] == pytest.approx(want)
    # with a max gap of 10s the long holds drop; only the burst remains
    g = time_weighted_avg(df, HOUR, max_gap_ms=10_000).collect()[0]
    assert g["n_pairs"] == 2 and g["held_ms"] == 2_000
    assert g["twa"] == pytest.approx(30.0)
