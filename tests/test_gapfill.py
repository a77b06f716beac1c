"""Gap filling (LOCF / linear) over bucket-stats frames."""

from __future__ import annotations

import pytest

from rhq_metrics_spark.operators.gapfill import fill_gaps


def _stats(spark):
    # (start, avg, samples): buckets 2,3 and 5 empty; leading bucket 0 empty
    rows = [
        (0, None, 0),
        (1000, 10.0, 3),
        (2000, None, 0),
        (3000, None, 0),
        (4000, 40.0, 2),
        (5000, None, 0),
    ]
    return spark.createDataFrame(rows, "start long, avg double, samples long")


def test_locf(spark):
    out = {r["start"]: r["avg"] for r in fill_gaps(_stats(spark), ["avg"], "locf").collect()}
    assert out[0] is None          # nothing to carry yet
    assert out[2000] == 10.0 and out[3000] == 10.0
    assert out[5000] == 40.0       # trailing carries last value
    assert out[1000] == 10.0 and out[4000] == 40.0  # observed untouched


def test_linear(spark):
    out = {r["start"]: r["avg"] for r in fill_gaps(_stats(spark), ["avg"], "linear").collect()}
    assert out[2000] == 20.0 and out[3000] == 30.0  # exact thirds of 10..40
    assert out[0] == 10.0          # leading edge -> nearest observed
    assert out[5000] == 40.0       # trailing edge -> nearest observed


def test_linear_rounding_is_half_away(spark):
    rows = [(0, 1.0, 1), (1000, None, 0), (2000, 1.0001, 1)]
    df = spark.createDataFrame(rows, "start long, avg double, samples long")
    out = {r["start"]: r["avg"] for r in fill_gaps(df, ["avg"], "linear").collect()}
    # midpoint of scaled ints 10000 and 10001 -> 10000.5 -> away from zero
    assert out[1000] == pytest.approx(1.0001)


def test_grouped_fill_does_not_leak_across_series(spark):
    rows = [
        ("a", 0, 1.0, 1),
        ("a", 1000, None, 0),
        ("b", 0, 9.0, 1),
        ("b", 1000, None, 0),
    ]
    df = spark.createDataFrame(rows, "metric string, start long, avg double, samples long")
    out = {
        (r["metric"], r["start"]): r["avg"]
        for r in fill_gaps(df, ["avg"], "locf", group_cols=["metric"]).collect()
    }
    assert out[("a", 1000)] == 1.0 and out[("b", 1000)] == 9.0


def test_rejects_unknown_method(spark):
    with pytest.raises(ValueError):
        fill_gaps(_stats(spark), ["avg"], "cubic")
