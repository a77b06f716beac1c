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
