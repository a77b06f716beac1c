from __future__ import annotations

import random

import pytest

from rhq_metrics_spark.operators.percentile import P2Estimator, p2_percentiles


def test_small_samples_are_exact():
    e = P2Estimator(0.5)
    for x in [3.0, 1.0, 2.0]:
        e.add(x)
    assert e.result() == 2.0  # exact median below 5 observations
    assert P2Estimator(0.9).result() is None


def test_tracks_known_distribution():
    rng = random.Random(42)
    for p, tol in [(0.5, 0.02), (0.9, 0.02), (0.99, 0.02)]:
        e = P2Estimator(p)
        for _ in range(20_000):
            e.add(rng.random())
        assert abs(e.result() - p) < tol, p


def test_deterministic_given_order():
    vals = [random.Random(7).random() for _ in range(500)]
    a, b = P2Estimator(0.95), P2Estimator(0.95)
    for x in vals:
        a.add(x)
        b.add(x)
    assert a.result() == b.result()


def test_jain_chlamtac_paper_example():
    """The worked example from Jain & Chlamtac (1985), Table I: 20
    observations, p=0.5 — markers after the run match the paper."""
    obs = [0.02, 0.15, 0.74, 3.39, 0.83, 22.37, 10.15, 15.43, 38.62,
           15.92, 34.60, 10.28, 1.47, 0.40, 0.05, 11.39, 0.27, 0.42,
           0.09, 11.37]
    e = P2Estimator(0.5)
    for x in obs:
        e.add(x)
    assert e.result() == pytest.approx(4.44, abs=0.005)


def test_spark_groups_match_python_twin(spark):
    rng = random.Random(1)
    rows = [
        (k, i, rng.gauss(100.0 if k == "a" else 10.0, 5.0))
        for k in ("a", "b")
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "key string, ts long, value double")
    got = {
        r["key"]: (r["samples"], r["p50"], r["p95"])
        for r in p2_percentiles(
            df, group_cols=["key"], order_cols=["ts"], percentiles=[50, 95]
        ).collect()
    }
    for k in ("a", "b"):
        e50, e95 = P2Estimator(0.5), P2Estimator(0.95)
        for kk, _, v in sorted((r for r in rows if r[0] == k), key=lambda r: r[1]):
            e50.add(v)
            e95.add(v)
        assert got[k] == (300, e50.result(), e95.result()), k


def test_service_p2_impl_end_to_end(spark, tmp_path):
    import random

    import pyspark.sql.functions as F

    from rhq_metrics_spark.model import GAUGE_SCHEMA, Buckets
    from rhq_metrics_spark.service import MetricsService
    from rhq_metrics_spark.sources import MetricsStore

    svc = MetricsService(spark, MetricsStore(spark, str(tmp_path / "s")))
    T = 1_700_000_000_000
    rng = random.Random(3)
    rows = [("t", "cpu", T + i * 1000, rng.random() * 100, None) for i in range(400)]
    svc.add_data_points("gauge", spark.createDataFrame(rows, GAUGE_SCHEMA))
    b = Buckets.from_count(T, T + 400_000, 2)

    p2 = {r["start"]: r for r in svc.gauge_stats(
        "t", "cpu", b, percentiles=[90], percentile_impl="p2").collect()}
    exact = {r["start"]: r for r in svc.gauge_stats(
        "t", "cpu", b, percentiles=[90]).collect()}
    assert set(p2) == set(exact) and len(p2) == 2
    for s in p2:
        # non-percentile stats identical; P2 estimate near the exact one
        for c in ("min", "max", "sum", "samples", "avg"):
            assert p2[s][c] == exact[s][c], (s, c)
        assert abs(p2[s]["p90"] - exact[s]["p90"]) < 10.0
        assert abs(p2[s]["median"] - exact[s]["median"]) < 10.0

    # the P2 path matches the pure-Python twin fed in the same order
    from rhq_metrics_spark.operators.percentile import P2Estimator

    per_bucket = {}
    for _, _, ts, v, _ in rows:
        per_bucket.setdefault(T + ((ts - T) // 200_000) * 200_000, []).append((ts, v))
    for s, tv in per_bucket.items():
        e = P2Estimator(0.9)
        for _, v in sorted(tv):
            e.add(v)
        assert p2[s]["p90"] == e.result(), s

    # requesting 50 explicitly must not collide with the implicit median
    # (ADVICE r3: duplicate p50 field broke the applyInPandas schema)
    p2_50 = {r["start"]: r for r in svc.gauge_stats(
        "t", "cpu", b, percentiles=[50, 90], percentile_impl="p2").collect()}
    for s in p2_50:
        assert p2_50[s]["median"] == p2[s]["median"]
        assert p2_50[s]["p50"] == p2_50[s]["median"]
        assert p2_50[s]["p90"] == p2[s]["p90"]


def test_streaming_p2_matches_batch_estimator(spark, tmp_path):
    """Running P² estimates across micro-batches must equal the batch
    estimator fed the same points in the same order — the marker state
    survives the batch boundary (including the pre-warm < 5 phase)."""
    import json
    import time

    from rhq_metrics_spark.streaming.percentile import streaming_p2

    T = 1_700_000_000_000
    rng = random.Random(11)
    vals = [round(rng.random() * 100, 3) for _ in range(30)]
    pts = [
        {"tenant_id": "t", "metric": "m", "ts": T + i * 1000, "value": v}
        for i, v in enumerate(vals)
    ]
    src = tmp_path / "p2_in"
    src.mkdir()
    out_dir = tmp_path / "p2_out"
    # first batch ends mid-warmup (3 points), second finishes the stream
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in pts[:3]))

    schema = "tenant_id string, metric string, ts long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        streaming_p2(stream, percentiles=[50, 95])
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "p2_ckpt"))
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

        while rows() < 3 and time.time() < deadline:
            time.sleep(0.5)
        (src / "b2.json").write_text("\n".join(json.dumps(r) for r in pts[3:]))
        while rows() < len(pts) and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()

    got = {
        r["ts"]: (r["p50"], r["p95"])
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    assert len(got) == len(pts)
    e50, e95 = P2Estimator(0.5), P2Estimator(0.95)
    for i, v in enumerate(vals):
        e50.add(v)
        e95.add(v)
        assert got[T + i * 1000] == (e50.result(), e95.result()), i
