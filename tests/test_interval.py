from __future__ import annotations

import pyspark.sql.functions as F

from rhq_metrics_spark.operators.interval import interval_join


def _frames(spark):
    pts = spark.createDataFrame(
        [("a", 5, 1.0), ("a", 10, 2.0), ("a", 19, 3.0), ("a", 20, 4.0),
         ("b", 10, 5.0), ("a", 95, 6.0)],
        "key string, ts long, value double",
    )
    iv = spark.createDataFrame(
        # second interval spans many buckets; third belongs to key b
        [("a", 10, 20, "i1"), ("a", 90, 100, "i2"), ("b", 0, 50, "i3")],
        "key string, start long, end long, iv_id string",
    )
    return pts, iv


def test_half_open_and_exact_once(spark):
    pts, iv = _frames(spark)
    got = {
        (r["key"], r["ts"], r["iv_id"])
        for r in interval_join(pts, iv, on=["key"], bucket_ms=7).collect()
    }
    # ts=10 == start included, ts=20 == end excluded, ts=5 matches nothing
    assert got == {("a", 10, "i1"), ("a", 19, "i1"), ("a", 95, "i2"),
                   ("b", 10, "i3")}
    # exactly-once even when the interval covers several buckets
    rows = interval_join(pts, iv, on=["key"], bucket_ms=2).collect()
    assert len(rows) == 4


def test_matches_naive_join_any_bucket(spark):
    pts, iv = _frames(spark)
    naive = {
        (r["key"], r["ts"], r["iv_id"])
        for r in pts.join(iv, "key")
        .filter((F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end")))
        .collect()
    }
    for bucket_ms in (1, 3, 10, 1000):
        got = {
            (r["key"], r["ts"], r["iv_id"])
            for r in interval_join(pts, iv, on=["key"], bucket_ms=bucket_ms).collect()
        }
        assert got == naive, bucket_ms


def test_left_join_keeps_unmatched(spark):
    pts, iv = _frames(spark)
    rows = interval_join(pts, iv, on=["key"], bucket_ms=10, how="left").collect()
    assert len(rows) == 6  # 4 matched + 2 unmatched
    unmatched = [r for r in rows if r["iv_id"] is None]
    assert {(r["key"], r["ts"]) for r in unmatched} == {("a", 5), ("a", 20)}
    assert all(r["start"] is None and r["end"] is None for r in unmatched)


def test_no_cartesian_in_plan(spark):
    pts, iv = _frames(spark)
    plan = interval_join(pts, iv, on=["key"], bucket_ms=10)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_runaway_interval_fails_loudly(spark):
    import pytest
    from py4j.protocol import Py4JJavaError

    pts = spark.createDataFrame([("a", 5, 1.0)], "key string, ts long, value double")
    iv = spark.createDataFrame(
        [("a", 0, 10**15, "open-ended")],  # effectively infinite interval
        "key string, start long, end long, iv_id string",
    )
    with pytest.raises(Exception) as exc:
        interval_join(pts, iv, on=["key"], bucket_ms=1000).collect()
    assert "spans more than" in str(exc.value)
    # a coarser bucket keeps the same interval workable
    got = interval_join(pts, iv, on=["key"], bucket_ms=10**12).collect()
    assert len(got) == 1
