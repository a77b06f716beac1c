from __future__ import annotations

from rhq_metrics_spark.operators.rollup import DAY_MS, HOUR_MS, time_rollup


def test_grains_consistent(spark):
    # two hours within one day, plus a point the next day
    rows = [
        ("m1", 10 * HOUR_MS + 5, 1.0),
        ("m1", 10 * HOUR_MS + 9, 3.0),
        ("m1", 11 * HOUR_MS + 1, 5.0),
        ("m1", DAY_MS + 2, 7.0),
        ("m2", 30, 10.0),
    ]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    out = {
        (r["metric"], r["grain"], r["bucket_start"]): r
        for r in time_rollup(df).collect()
    }

    assert out[("m1", "hour", 10 * HOUR_MS)]["n"] == 2
    assert out[("m1", "hour", 10 * HOUR_MS)]["sum"] == 4.0
    assert out[("m1", "hour", 11 * HOUR_MS)]["avg"] == 5.0
    assert out[("m1", "day", 0)]["n"] == 3
    assert out[("m1", "day", DAY_MS)]["n"] == 1
    assert out[("m1", "total", None)]["n"] == 4
    assert out[("m1", "total", None)]["sum"] == 16.0
    assert out[("m2", "total", None)]["max"] == 10.0

    # grain invariants: hours of a day sum to the day; days to the total
    m1_hours = [r for k, r in out.items() if k[0] == "m1" and k[1] == "hour"]
    m1_days = [r for k, r in out.items() if k[0] == "m1" and k[1] == "day"]
    assert sum(r["n"] for r in m1_hours) == out[("m1", "total", None)]["n"]
    assert sum(r["sum"] for r in m1_days) == out[("m1", "total", None)]["sum"]


def test_single_shuffle_plan(spark):
    df = spark.createDataFrame(
        [("m", 1, 1.0)], "metric string, ts long, value double"
    )
    plan = time_rollup(df)._jdf.queryExecution().executedPlan().toString()
    # one Expand feeding one aggregation — not a union of three scans
    assert plan.count("Expand") == 1
    assert "Union" not in plan
