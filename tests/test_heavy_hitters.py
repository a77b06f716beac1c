"""Tests for pipelines/sketches.py heavy_hitters — MG candidate pass +
exact recount must equal brute force exactly."""

import random
from collections import Counter

import pytest

from rhq_metrics_spark.pipelines.sketches import heavy_hitters


def _df(spark, vals, partitions=8):
    return spark.createDataFrame(
        [(v,) for v in vals], "t string"
    ).repartition(partitions)


def _brute(vals, phi):
    n = len(vals)
    return {v: c for v, c in Counter(vals).items() if c > phi * n}


def test_exact_output_matches_brute_force(spark):
    rng = random.Random(5)
    # skewed: a few hot values + a long tail
    vals = (
        ["hot1"] * 500 + ["hot2"] * 300 + ["warm"] * 120
        + [f"tail{rng.randint(0, 2000)}" for _ in range(2000)]
    )
    rng.shuffle(vals)
    for phi in (0.05, 0.1, 0.02):
        got = {
            r["value"]: r["cnt"]
            for r in heavy_hitters(_df(spark, vals), "t", phi).collect()
        }
        assert got == _brute(vals, phi), f"phi={phi}"


def test_spread_evenly_across_partitions_still_complete(spark):
    # the adversarial case for per-partition summaries: the heavy item
    # is spread thinly over every partition
    vals = ["spread"] * 200 + [f"u{i}" for i in range(1800)]
    df = _df(spark, vals, partitions=16)
    got = {r["value"]: r["cnt"] for r in heavy_hitters(df, "t", 0.05).collect()}
    assert got == {"spread": 200}  # 200/2000 = 0.1 > 0.05


def test_no_qualifying_items(spark):
    vals = [f"u{i}" for i in range(500)]
    assert heavy_hitters(_df(spark, vals), "t", 0.01).count() == 0


def test_threshold_is_strict(spark):
    vals = ["a"] * 10 + ["b"] * 5 + ["c"] * 85
    got = {r["value"]: r["cnt"] for r in heavy_hitters(_df(spark, vals), "t", 0.1).collect()}
    # a is exactly 10% -> strict > excludes it
    assert got == {"c": 85}


def test_phi_validation(spark):
    df = _df(spark, ["x"])
    with pytest.raises(ValueError):
        heavy_hitters(df, "t", 0.0)
    with pytest.raises(ValueError):
        heavy_hitters(df, "t", 1.0)


def test_integer_column_works_and_float_rejected(spark):
    vals = [7] * 50 + list(range(100, 400))
    df = spark.createDataFrame([(v,) for v in vals], "t long").repartition(4)
    got = {r["value"]: r["cnt"] for r in heavy_hitters(df, "t", 0.1).collect()}
    assert got == {"7": 50}
    fdf = spark.createDataFrame([(1.5,)], "t double")
    import pytest as _pytest

    with _pytest.raises(TypeError, match="string/integral"):
        heavy_hitters(fdf, "t", 0.1)


def test_boolean_column(spark):
    # regression: Python str(True)='True' never matched Spark's 'true',
    # silently returning empty — the cast now happens JVM-side
    vals = [True] * 70 + [False] * 30
    df = spark.createDataFrame([(v,) for v in vals], "t boolean").repartition(4)
    got = {r["value"]: r["cnt"] for r in heavy_hitters(df, "t", 0.5).collect()}
    assert got == {"true": 70}


def test_nullable_int_column(spark):
    # regression: Arrow turns nullable int64 into float64 ('7.0' vs '7')
    vals = [7] * 60 + [None] * 20 + list(range(100, 140))
    df = spark.createDataFrame([(v,) for v in vals], "t long").repartition(4)
    got = {r["value"]: r["cnt"] for r in heavy_hitters(df, "t", 0.3).collect()}
    # nulls are excluded from both n and the counts: 60/100 non-null = 0.6
    assert got == {"7": 60}


def test_capacity_below_bound_rejected(spark):
    df = _df(spark, ["x"] * 10)
    with pytest.raises(ValueError, match="completeness"):
        heavy_hitters(df, "t", 0.1, capacity=5)
    # at the bound it is accepted
    assert heavy_hitters(df, "t", 0.1, capacity=10).count() == 1
