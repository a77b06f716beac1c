"""W2 condition periods — gaps-and-islands vs the reference loop.

Oracle: MetricsServiceImpl.getPeriods (java:1026-1056): maximal runs of
satisfying points → [first_ts, last_ts of the run].
"""

from rhq_metrics_spark.operators import periods, predicate

T0 = 1_700_000_000_000


def test_basic_runs(gauge_points_factory):
    vals = [1.0, 5.0, 6.0, 2.0, 7.0, 8.0, 9.0, 1.0]
    rows = [("t1", "m", T0 + i * 1000, v) for i, v in enumerate(vals)]
    out = (
        periods(gauge_points_factory(rows), predicate("gt", 4.0))
        .orderBy("period_start")
        .collect()
    )
    assert [(r["period_start"], r["period_end"]) for r in out] == [
        (T0 + 1000, T0 + 2000),
        (T0 + 4000, T0 + 6000),
    ]


def test_open_run_at_end(gauge_points_factory):
    rows = [("t1", "m", T0 + i * 1000, float(i)) for i in range(5)]
    out = periods(gauge_points_factory(rows), predicate("gte", 3.0)).collect()
    assert len(out) == 1
    assert (out[0]["period_start"], out[0]["period_end"]) == (T0 + 3000, T0 + 4000)


def test_single_point_period(gauge_points_factory):
    rows = [
        ("t1", "m", T0, 0.0),
        ("t1", "m", T0 + 1000, 9.0),
        ("t1", "m", T0 + 2000, 0.0),
    ]
    out = periods(gauge_points_factory(rows), predicate("eq", 9.0)).collect()
    assert [(r["period_start"], r["period_end"]) for r in out] == [
        (T0 + 1000, T0 + 1000)
    ]


def test_no_matches(gauge_points_factory):
    rows = [("t1", "m", T0, 1.0)]
    out = periods(gauge_points_factory(rows), predicate("lt", 0.0)).collect()
    assert out == []


def test_ops(gauge_points_factory):
    rows = [("t1", "m", T0, 5.0)]
    df = gauge_points_factory(rows)
    assert periods(df, predicate("lte", 5.0)).count() == 1
    assert periods(df, predicate("neq", 5.0)).count() == 0
    assert periods(df, predicate("neq", 4.0)).count() == 1
