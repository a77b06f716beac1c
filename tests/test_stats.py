"""A1 bucketed stats / A6 scalar aggs / A8 minmax — vs numpy oracles.

Mirrors the reference's GaugeITest / GaugeMetricStatisticsITest style:
insert points, query stats, compare against stats recomputed in-test
(exact percentiles, SURVEY.md §5).
"""

import numpy as np
import pytest

from rhq_metrics_spark.model import Buckets
from rhq_metrics_spark.operators import (
    minmax_ts,
    numeric_bucket_stats,
    scalar_aggs,
)

T0 = 1_700_000_000_000


@pytest.fixture(scope="module")
def gauge_df(gauge_points_factory):
    rows = []
    # metric m1: 60 points, 10s cadence, values = i * 1.5 - 20
    for i in range(60):
        rows.append(("t1", "m1", T0 + i * 10_000, i * 1.5 - 20.0))
    # metric m2 leaves bucket 2 empty (points only in [0, 2min) and [6, 10min))
    for i in range(12):
        rows.append(("t1", "m2", T0 + i * 10_000, float(i)))
    for i in range(36, 60):
        rows.append(("t1", "m2", T0 + i * 10_000, float(i)))
    return gauge_points_factory(rows)


def test_bucket_stats_values_match_numpy(gauge_df):
    buckets = Buckets.from_count(T0, T0 + 600_000, 5)
    out = (
        numeric_bucket_stats(
            gauge_df.filter("metric = 'm1'"),
            buckets,
            percentiles=[90, 99],
        )
        .orderBy("start")
        .collect()
    )
    assert len(out) == 5
    values = np.array([i * 1.5 - 20.0 for i in range(60)])
    ts = np.array([T0 + i * 10_000 for i in range(60)])
    for row in out:
        mask = (ts >= row["start"]) & (ts < row["end"])
        vals = values[mask]
        assert row["samples"] == mask.sum()
        assert row["min"] == pytest.approx(vals.min())
        assert row["avg"] == pytest.approx(vals.mean())
        assert row["max"] == pytest.approx(vals.max())
        assert row["sum"] == pytest.approx(vals.sum())
        assert row["median"] == pytest.approx(np.percentile(vals, 50))
        assert row["p90"] == pytest.approx(np.percentile(vals, 90))
        assert row["p99"] == pytest.approx(np.percentile(vals, 99))


def test_empty_buckets_present_with_null_stats(gauge_df):
    buckets = Buckets.from_count(T0, T0 + 600_000, 5)
    out = (
        numeric_bucket_stats(gauge_df.filter("metric = 'm2'"), buckets)
        .orderBy("start")
        .collect()
    )
    assert len(out) == 5  # all buckets present
    # buckets 1 and 2 have no m2 points ([2min,6min) empty)
    empties = [r for r in out if r["samples"] == 0]
    assert len(empties) == 2
    for r in empties:
        assert r["min"] is None and r["avg"] is None and r["max"] is None
        assert r["sum"] is None and r["median"] is None


def test_grid_boundaries_half_open(gauge_points_factory):
    # point exactly on a bucket boundary belongs to the later bucket;
    # point at grid end excluded
    step = 60_000
    rows = [
        ("t1", "m", T0, 1.0),
        ("t1", "m", T0 + step, 2.0),          # first instant of bucket 1
        ("t1", "m", T0 + 2 * step - 1, 3.0),  # last instant of bucket 1
        ("t1", "m", T0 + 2 * step, 4.0),      # == grid end → excluded
    ]
    buckets = Buckets.from_step(T0, T0 + 2 * step, step)
    out = (
        numeric_bucket_stats(gauge_points_factory(rows), buckets)
        .orderBy("start")
        .collect()
    )
    assert [r["samples"] for r in out] == [1, 2]
    assert out[1]["min"] == 2.0 and out[1]["max"] == 3.0


def test_grouped_stats_fill_per_group(gauge_df):
    buckets = Buckets.from_count(T0, T0 + 600_000, 5)
    out = numeric_bucket_stats(
        gauge_df, buckets, group_cols=["tenant_id", "metric"]
    ).collect()
    assert len(out) == 10  # 2 metrics × 5 buckets, empties filled per metric


def test_scalar_aggs(gauge_df):
    row = scalar_aggs(gauge_df.filter("metric = 'm1'")).collect()[0]
    values = [i * 1.5 - 20.0 for i in range(60)]
    assert row["min"] == pytest.approx(min(values))
    assert row["max"] == pytest.approx(max(values))
    assert row["avg"] == pytest.approx(sum(values) / len(values))
    assert row["sum"] == pytest.approx(sum(values))
    assert row["samples"] == 60


def test_minmax_ts(gauge_df):
    rows = {r["metric"]: r for r in minmax_ts(gauge_df).collect()}
    assert rows["m1"]["min_ts"] == T0
    assert rows["m1"]["max_ts"] == T0 + 59 * 10_000
    assert rows["m2"]["samples"] == 36


def test_trimmed_bucket_stats_drops_outliers(spark):
    from rhq_metrics_spark.operators.stats import trimmed_bucket_stats

    # one bucket: 10 values, one absurd outlier at each end; 10% trim
    # (k = 1) drops exactly those two
    vals = [-1000.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 1000.0]
    rows = [(T0 + i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "ts long, value double")
    buckets = Buckets(T0, 100, 1)
    r = trimmed_bucket_stats(df, buckets, trim_num=1, trim_den=10).collect()[0]
    kept = sorted(vals)[1:-1]
    assert r["samples"] == 10
    assert r["n_kept"] == 8
    assert r["trimmed_avg"] == pytest.approx(sum(kept) / len(kept))
    assert r["t_min"] == 2.0 and r["t_max"] == 9.0


def test_trimmed_bucket_stats_small_buckets_and_python_oracle(spark):
    from rhq_metrics_spark.operators.stats import trimmed_bucket_stats

    # n < trim_den -> k = 0 -> plain mean; larger bucket vs oracle
    rng = np.random.default_rng(7)
    step = 1_000
    rows = []
    per_bucket = {0: 3, 1: 47, 2: 20}
    for b, n in per_bucket.items():
        for i in range(n):
            rows.append((T0 + b * step + i, float(rng.integers(-500, 500)) / 4))
    df = spark.createDataFrame(rows, "ts long, value double")
    buckets = Buckets(T0, step, 3)
    out = {
        (r["start"] - T0) // step: r
        for r in trimmed_bucket_stats(
            df, buckets, trim_num=1, trim_den=10
        ).collect()
    }
    for b, n in per_bucket.items():
        vals = sorted(
            round(v * 100) for (ts, v) in rows if (ts - T0) // step == b
        )
        k = n // 10
        kept = vals[k : n - k]
        r = out[b]
        assert r["samples"] == n and r["n_kept"] == len(kept)
        assert r["trimmed_avg"] == pytest.approx(
            sum(kept) / len(kept) / 100, abs=1e-4
        )


def test_trimmed_bucket_stats_single_exchange_plan(spark):
    from rhq_metrics_spark.operators.stats import trimmed_bucket_stats

    df = spark.createDataFrame(
        [(T0 + i, float(i)) for i in range(50)], "ts long, value double"
    )
    out = trimmed_bucket_stats(df, Buckets(T0, 25, 2))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the rank window and the final agg share the bucket key: one shuffle
    assert plan.count("Exchange") == 1
