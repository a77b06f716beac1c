from __future__ import annotations

import json
import time

import pyspark.sql.functions as F


def test_streaming_zscore_matches_batch(spark, tmp_path):
    """Streaming z-scores across micro-batches must equal the batch
    rolling_zscore over a replay of the same points — the trailing ring
    survives the batch boundary."""
    from rhq_metrics_spark.operators import rolling_zscore
    from rhq_metrics_spark.streaming.anomaly import streaming_zscore

    T = 1_700_000_000_000
    vals = [10.0, 12.0, 11.0, 13.0, 10.0, 12.0, 11.0, 60.0, 12.0, 11.0]
    pts = [
        {"tenant_id": "t", "metric": "m", "ts": T + i * 1000, "value": v}
        for i, v in enumerate(vals)
    ]
    src = tmp_path / "z_in"
    src.mkdir()
    out_dir = tmp_path / "z_out"
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in pts[:6]))

    schema = "tenant_id string, metric string, ts long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        streaming_zscore(stream, window_n=5, min_n=3, threshold=3.0)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "z_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90

        def rows():
            try:
                return spark.read.parquet(str(out_dir)).count()
            except Exception:
                return 0

        while rows() < 6 and time.time() < deadline:
            time.sleep(0.5)
        (src / "b2.json").write_text("\n".join(json.dumps(r) for r in pts[6:]))
        while rows() < len(pts) and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()

    got = {
        r["ts"]: (r["z"], r["is_anomaly"])
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    assert len(got) == len(pts)

    batch_df = spark.createDataFrame(
        [(p["tenant_id"], p["metric"], p["ts"], p["value"]) for p in pts],
        schema,
    )
    expected = {
        r["ts"]: (r["z"], r["is_anomaly"])
        for r in rolling_zscore(
            batch_df, on=["tenant_id", "metric"], order=["ts"],
            value_col="value", window_n=5, min_n=3, threshold=3.0,
        ).collect()
    }
    assert got == expected
    # the spike at index 7 crosses a micro-batch boundary and must flag
    assert got[T + 7000][1] is True


def test_streaming_segments_match_batch_lag_pairs(spark, tmp_path):
    """Segments emitted across micro-batches must equal the batch lag
    pairs over a replay — including the pair that straddles the batch
    boundary; uptime aggregated from the segments matches the
    duration-weighted math."""
    import json

    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from rhq_metrics_spark.streaming.availability import streaming_state_segments

    T = 1_700_000_000_000
    seq = ["up", "up", "down", "up", "down", "down", "up"]
    pts = [
        {"tenant_id": "t", "metric": "web", "ts": T + i * 10_000, "value": s}
        for i, s in enumerate(seq)
    ]
    src = tmp_path / "av_in"
    src.mkdir()
    out_dir = tmp_path / "av_out"
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in pts[:4]))

    schema = "tenant_id string, metric string, ts long, value string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        streaming_state_segments(stream)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "av_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.time() + 90

        def rows():
            try:
                return spark.read.parquet(str(out_dir)).count()
            except Exception:
                return 0

        while rows() < 3 and time.time() < deadline:
            time.sleep(0.5)
        (src / "b2.json").write_text("\n".join(json.dumps(r) for r in pts[4:]))
        while rows() < len(pts) - 1 and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()

    got = {
        (r["seg_start"], r["seg_end"], r["state"])
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    batch = spark.createDataFrame(
        [(p["tenant_id"], p["metric"], p["ts"], p["value"]) for p in pts], schema
    )
    w = Window.partitionBy("tenant_id", "metric").orderBy("ts")
    exp = {
        (r["seg_start"], r["seg_end"], r["state"])
        for r in batch.select(
            F.lag("ts").over(w).alias("seg_start"),
            F.col("ts").alias("seg_end"),
            F.lag("value").over(w).alias("state"),
        )
        .filter(F.col("seg_start").isNotNull())
        .collect()
    }
    assert got == exp and len(got) == len(pts) - 1

    # duration-weighted uptime from the segments (plain JVM aggregation)
    segs = spark.read.parquet(str(out_dir))
    up_ms = (
        segs.withColumn("dur", F.col("seg_end") - F.col("seg_start"))
        .groupBy("metric")
        .agg(
            (
                F.sum(F.when(F.col("state") == "up", F.col("dur")).otherwise(0))
                / F.sum("dur")
            ).alias("uptime_ratio")
        )
        .collect()[0]["uptime_ratio"]
    )
    # segment states (the earlier point's): up,up,down,up,down,down ->
    # 3 of 6 equal-length segments are up
    assert abs(up_ms - 0.5) < 1e-9


def test_streaming_ewma_matches_batch(spark, tmp_path):
    """Streaming EWMA across micro-batches must equal the batch
    ewma_smooth over a replay — including the warmup renormalization and
    the value that lands right after the batch boundary."""
    from rhq_metrics_spark.operators.anomaly import ewma_smooth
    from rhq_metrics_spark.streaming.anomaly import streaming_ewma

    T = 1_700_000_000_000
    vals = [1000, 1200, 1100, 1300, 1000, 1200, 1100, 6000, 1200, 1100, 900, 1050]
    pts = [
        {"tenant_id": "t", "metric": "m", "ts": T + i * 1000, "value": v}
        for i, v in enumerate(vals)
    ]
    src = tmp_path / "e_in"
    src.mkdir()
    out_dir = tmp_path / "e_out"
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in pts[:7]))

    schema = "tenant_id string, metric string, ts long, value long"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        streaming_ewma(stream, window_n=5, alpha_num=1, alpha_den=4)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "e_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90

        def rows():
            try:
                return spark.read.parquet(str(out_dir)).count()
            except Exception:
                return 0

        while rows() < 7 and time.time() < deadline:
            time.sleep(0.5)
        (src / "b2.json").write_text("\n".join(json.dumps(r) for r in pts[7:]))
        while rows() < len(pts) and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()

    got = {
        r["ts"]: r["ewma"] for r in spark.read.parquet(str(out_dir)).collect()
    }
    assert len(got) == len(pts)

    batch_df = spark.createDataFrame(
        [(p["tenant_id"], p["metric"], p["ts"], p["value"]) for p in pts],
        schema,
    )
    expected = {
        r["ts"]: r["ewma"]
        for r in ewma_smooth(
            batch_df, on=["tenant_id", "metric"], order=["ts", "value"],
            value_col="value", window_n=5, alpha_num=1, alpha_den=4,
        ).collect()
    }
    assert got == expected  # bit-identical, incl. across the boundary


def test_streaming_changepoints_match_batch(spark, tmp_path):
    """Streaming mean-shift rows must be BIT-IDENTICAL to the batch
    mean_shift_changepoints rows whose leading frame is complete
    (n_next == window_n) over a replay of the same points — including
    points whose two frames straddle the micro-batch boundary.  The
    trailing window_n points stay pending (their leading frame needs
    the future), which is the documented two-sided-detector latency."""
    from rhq_metrics_spark.operators.anomaly import mean_shift_changepoints
    from rhq_metrics_spark.streaming.anomaly import streaming_changepoints

    T = 1_700_000_000_000
    W = 5
    # level shift at index 12: 10-ish -> 30-ish, with jitter so the
    # pooled variance is nonzero; .25 steps exercise the HALF_UP
    # quantization at value_scale=100
    vals = [10.0, 10.25, 9.75, 10.5, 10.0, 9.5, 10.25, 10.0, 9.75, 10.5,
            10.0, 10.25, 30.0, 29.75, 30.25, 30.5, 29.5, 30.0, 30.25,
            29.75, 30.0, 30.5]
    pts = [
        {"tenant_id": "t", "metric": "m", "ts": T + i * 1000, "value": v}
        for i, v in enumerate(vals)
    ]
    src = tmp_path / "cp_in"
    src.mkdir()
    out_dir = tmp_path / "cp_out"
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in pts[:10]))

    schema = "tenant_id string, metric string, ts long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        streaming_changepoints(stream, window_n=W, min_n=3, threshold=3.0)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "cp_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90

        def rows():
            try:
                return spark.read.parquet(str(out_dir)).count()
            except Exception:
                return 0

        while rows() < 10 - W and time.time() < deadline:
            time.sleep(0.5)
        (src / "b2.json").write_text("\n".join(json.dumps(r) for r in pts[10:]))
        while rows() < len(pts) - W and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()

    key = lambda r: r["ts"]  # noqa: E731
    got = {
        key(r): (r["value"], r["n_prev"], r["n_next"], r["mean_prev"],
                 r["mean_next"], r["score"], r["is_change"])
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    assert len(got) == len(pts) - W  # trailing W pending, everything else out

    batch_df = spark.createDataFrame(
        [(p["tenant_id"], p["metric"], p["ts"], p["value"]) for p in pts],
        schema,
    )
    batch = mean_shift_changepoints(
        batch_df, on=["tenant_id", "metric"], order=["ts"],
        value_col="value", window_n=W, min_n=3, threshold=3.0,
        value_scale=100,
    ).collect()
    expected = {
        key(r): (r["value"], r["n_prev"], r["n_next"], r["mean_prev"],
                 r["mean_next"], r["score"], r["is_change"])
        for r in batch
        if r["n_next"] == W
    }
    assert got == expected  # bit-identical doubles, no tolerance
    # the last pre-shift point (trailing frame all-low, leading frame
    # all-high) flags, and its leading frame crossed the micro-batch
    # boundary
    shift_ts = T + 11_000
    assert got[shift_ts][6] is True
    assert sum(1 for v in got.values() if v[6]) == 1
