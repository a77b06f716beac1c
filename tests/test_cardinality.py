"""Tests for operators/cardinality.py: exact GROUPING SETS distinct
rollup and the mergeable HLL sketch path."""

import pyspark.sql.functions as F
import pytest

from rhq_metrics_spark.operators.cardinality import (
    distinct_from_sketches,
    distinct_rollup,
    hll_sketch_rollup,
)

HOUR = 3_600_000
DAY = 86_400_000


def _pts(spark, rows):
    return spark.createDataFrame(rows, "metric string, ts long, user_id string")


def test_exact_rollup_buckets_and_total(spark):
    rows = [
        ("m", 0, "u1"), ("m", 1, "u1"), ("m", 2, "u2"),          # day 0: {u1,u2}
        ("m", DAY, "u2"), ("m", DAY + 5, "u3"),                   # day 1: {u2,u3}
        ("n", 0, "u9"),
    ]
    out = {
        (r["metric"], r["grain"], r["bucket_start"]): r["n_distinct"]
        for r in distinct_rollup(_pts(spark, rows), DAY).collect()
    }
    assert out[("m", "bucket", 0)] == 2
    assert out[("m", "bucket", DAY)] == 2
    assert out[("m", "total", None)] == 3  # u1,u2,u3 across days
    assert out[("n", "total", None)] == 1
    assert len(out) == 5


def test_sketch_rollup_merges_to_exact_at_small_cardinality(spark):
    # 200 users spread over 2 days x 12 slices; lgk=12 HLL is exact-ish
    # (<1% error) at this cardinality
    rows = []
    for u in range(200):
        rows.append(("m", (u % 24) * HOUR * 2, f"user-{u}"))
    sk = hll_sketch_rollup(_pts(spark, rows), slice_ms=2 * HOUR)
    assert sk.count() == 24  # one sketch per 2h slice
    est = distinct_from_sketches(sk, DAY).collect()
    exact = {
        (r["metric"], r["bucket_start"]): r["n_distinct"]
        for r in distinct_rollup(_pts(spark, rows), DAY)
        .filter("grain = 'bucket'")
        .collect()
    }
    assert len(est) == 2
    for r in est:
        want = exact[(r["metric"], r["bucket_start"])]
        assert r["n_distinct_est"] == pytest.approx(want, rel=0.05)


def test_sketch_union_counts_overlap_once(spark):
    # same users appear in every slice: union must not double-count
    rows = [("m", s * 2 * HOUR, f"u{u}") for s in range(12) for u in range(50)]
    sk = hll_sketch_rollup(_pts(spark, rows), slice_ms=2 * HOUR)
    est = distinct_from_sketches(sk, DAY).collect()
    assert len(est) == 1
    assert est[0]["n_distinct_est"] == pytest.approx(50, rel=0.05)


def test_sketch_column_is_persistable_binary(spark, tmp_path):
    rows = [("m", u * HOUR, f"u{u}") for u in range(30)]
    sk = hll_sketch_rollup(_pts(spark, rows), slice_ms=2 * HOUR)
    assert dict(sk.dtypes)["sketch"] == "binary"
    p = str(tmp_path / "sketches")
    sk.write.parquet(p)
    back = spark.read.parquet(p)
    est = {r["bucket_start"]: r["n_distinct_est"] for r in
           distinct_from_sketches(back, DAY).collect()}
    # 30 hourly users span two days: 24 in day 0, 6 in day 1
    assert est[0] == pytest.approx(24, rel=0.05)
    assert est[DAY] == pytest.approx(6, rel=0.05)


def test_streaming_distinct_rollup_matches_batch(spark, tmp_path):
    """B12 streaming twin: finalized windows carry the exact batch
    distinct counts (dedup-within-watermark -> windowed count)."""
    import json
    import time

    from rhq_metrics_spark.streaming.cardinality import streaming_distinct_rollup

    src = tmp_path / "card_in"
    src.mkdir()
    base = 1_700_000_000  # seconds
    rows1 = [
        {"metric": "m", "sec": base + i, "user_id": f"u{i % 7}" } for i in range(30)
    ] + [
        {"metric": "n", "sec": base + i, "user_id": f"v{i % 3}"} for i in range(10)
    ]
    # SECOND micro-batch, same bucket, recurring users minutes later —
    # the watermark (seconds) has LONG passed their first events, so a
    # within-watermark dedup would evict state and double-count; the
    # window-keyed dedup must still drop them
    rows1b = [
        {"metric": "m", "sec": base + 900 + i, "user_id": f"u{i % 7}"}
        for i in range(14)
    ]
    # far-future row advances the watermark past the first hour window
    rows2 = [{"metric": "m", "sec": base + 7200, "user_id": "late"}]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows1))

    stream = (
        spark.readStream.schema("metric string, sec long, user_id string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
        .withColumn("event_time", F.timestamp_seconds("sec"))
    )
    out = streaming_distinct_rollup(
        stream, grain="1 hour", watermark_delay="5 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("card_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "card_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        time.sleep(3)
        (src / "b1b.json").write_text("\n".join(json.dumps(r) for r in rows1b))
        time.sleep(3)
        (src / "b2.json").write_text("\n".join(json.dumps(r) for r in rows2))
        while (
            spark.sql("select * from card_out").count() < 2
            and time.time() < deadline
        ):
            time.sleep(0.5)
    finally:
        q.stop()

    got = {
        (r["metric"], int(r["bucket_start"].timestamp())): r["n_distinct"]
        for r in spark.sql("select * from card_out").collect()
    }
    # batch reference over the same rows, same hourly grain
    batch = spark.createDataFrame(
        [(r["metric"], r["sec"] * 1000, r["user_id"]) for r in rows1 + rows1b],
        "metric string, ts long, user_id string",
    )
    want = {
        (r["metric"], r["bucket_start"] // 1000): r["n_distinct"]
        for r in distinct_rollup(batch, HOUR).filter("grain = 'bucket'").collect()
    }
    assert got == want  # every finalized window, exact counts
