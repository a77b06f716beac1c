"""A3 stacked / A4 pooled multi-metric stats.

Oracle: SumNumericBucketPointCollector.java:32-89 — element-wise SUM of
per-metric bucket stats (including min/median/max/percentiles);
samples = contributing-metric count; empty per-metric buckets skipped.
"""

import numpy as np
import pytest

from rhq_metrics_spark.model import Buckets
from rhq_metrics_spark.operators import pooled_stats, stacked_stats

T0 = 1_700_000_000_000
STEP = 60_000


@pytest.fixture(scope="module")
def multi_df(gauge_points_factory):
    rows = []
    for i in range(12):  # m1 in both buckets
        rows.append(("t1", "m1", T0 + i * 10_000, float(i)))
    for i in range(6):  # m2 only in bucket 0
        rows.append(("t1", "m2", T0 + i * 10_000, 100.0 + i))
    return gauge_points_factory(rows)


def test_stacked_sum_of_stats(multi_df):
    buckets = Buckets.from_step(T0, T0 + 2 * STEP, STEP)
    out = (
        stacked_stats(multi_df, buckets, percentiles=[90], metric_cols=["metric"])
        .orderBy("start")
        .collect()
    )
    m1_b0 = np.arange(0, 6, dtype=float)
    m2_b0 = 100.0 + np.arange(0, 6, dtype=float)
    b0 = out[0]
    # sums of per-metric stats — including min/median/max (the odd contract)
    assert b0["min"] == pytest.approx(m1_b0.min() + m2_b0.min())
    assert b0["max"] == pytest.approx(m1_b0.max() + m2_b0.max())
    assert b0["avg"] == pytest.approx(m1_b0.mean() + m2_b0.mean())
    assert b0["median"] == pytest.approx(
        np.percentile(m1_b0, 50) + np.percentile(m2_b0, 50)
    )
    assert b0["p90"] == pytest.approx(
        np.percentile(m1_b0, 90) + np.percentile(m2_b0, 90)
    )
    assert b0["samples"] == 2  # contributing metrics, not points
    b1 = out[1]
    m1_b1 = np.arange(6, 12, dtype=float)
    assert b1["samples"] == 1  # m2 empty in bucket 1 — skipped, not zeroed
    assert b1["min"] == pytest.approx(m1_b1.min())


def test_pooled_stats(multi_df):
    buckets = Buckets.from_step(T0, T0 + 2 * STEP, STEP)
    out = pooled_stats(multi_df, buckets).orderBy("start").collect()
    pooled_b0 = np.concatenate([np.arange(0, 6.0), 100.0 + np.arange(0, 6.0)])
    assert out[0]["samples"] == 12
    assert out[0]["avg"] == pytest.approx(pooled_b0.mean())
    assert out[0]["median"] == pytest.approx(np.percentile(pooled_b0, 50))


def test_stacked_empty_bucket_filled(multi_df):
    buckets = Buckets.from_step(T0, T0 + 3 * STEP, STEP)
    out = stacked_stats(multi_df, buckets, metric_cols=["metric"]).orderBy("start").collect()
    assert len(out) == 3
    assert out[2]["samples"] == 0 and out[2]["min"] is None
