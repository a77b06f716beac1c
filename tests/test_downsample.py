"""Tests for operators/downsample.py — min/max decimation, LTTB, value
histograms."""

import numpy as np
import pytest

from rhq_metrics_spark.operators.downsample import (
    lttb,
    lttb_select,
    minmax_downsample,
    value_histogram,
)

HOUR = 3_600_000


def _pts(spark, rows):
    return spark.createDataFrame(rows, "metric string, ts long, value double")


def test_minmax_keeps_extreme_points(spark):
    rows = [
        ("m", 0, 5.0), ("m", 10, 1.0), ("m", 20, 9.0), ("m", 30, 3.0),
        ("m", HOUR + 1, 7.0),
    ]
    out = {
        (r["kind"], r["bucket_start"]): (r["ts"], r["value"])
        for r in minmax_downsample(_pts(spark, rows), HOUR).collect()
    }
    assert out[("min", 0)] == (10, 1.0)
    assert out[("max", 0)] == (20, 9.0)
    # single-point bucket: both kinds at that point
    assert out[("min", HOUR)] == out[("max", HOUR)] == (HOUR + 1, 7.0)


def test_minmax_value_ties_take_earliest_ts(spark):
    rows = [("m", 5, 2.0), ("m", 1, 2.0), ("m", 3, 2.0)]
    out = {
        r["kind"]: r["ts"]
        for r in minmax_downsample(_pts(spark, rows), HOUR).collect()
    }
    assert out == {"min": 1, "max": 1}


def _lttb_reference(ts, vals, n_out):
    """Straight-from-the-thesis scalar implementation."""
    n = len(ts)
    if n_out >= n:
        return list(range(n))
    edges = np.linspace(1, n - 1, n_out - 1).astype(int)
    out = [0]
    a = 0
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        nlo, nhi = edges[i + 1], (edges[i + 2] if i + 2 < len(edges) else n)
        cx = sum(ts[nlo:nhi]) / (nhi - nlo)
        cy = sum(vals[nlo:nhi]) / (nhi - nlo)
        best, besta = -1.0, lo
        for j in range(lo, hi):
            area = abs(
                (ts[a] - cx) * (vals[j] - vals[a])
                - (ts[a] - ts[j]) * (cy - vals[a])
            )
            if area > best:
                best, besta = area, j
        a = besta
        out.append(a)
    out.append(n - 1)
    return out


def test_lttb_select_matches_reference():
    rng = np.random.RandomState(9)
    ts = np.arange(500, dtype=np.float64) * 7
    vals = np.cumsum(rng.randn(500))
    for n_out in (3, 10, 100, 499):
        got = lttb_select(ts, vals, n_out).tolist()
        want = _lttb_reference(ts.tolist(), vals.tolist(), n_out)
        assert got == want, n_out


def test_lttb_keeps_endpoints_and_spikes(spark):
    vals = [0.0] * 100
    vals[37] = 100.0  # a spike LTTB must keep
    rows = [("m", t * 1000, v) for t, v in enumerate(vals)]
    out = lttb(_pts(spark, rows), 10).collect()
    got_ts = sorted(r["ts"] for r in out)
    assert len(out) == 10
    assert got_ts[0] == 0 and got_ts[-1] == 99_000
    assert 37_000 in got_ts


def test_lttb_short_series_passthrough(spark):
    rows = [("m", i, float(i)) for i in range(5)]
    assert lttb(_pts(spark, rows), 10).count() == 5


def test_lttb_multiple_series_independent(spark):
    rows = [("a", i * 100, float(i % 7)) for i in range(200)]
    rows += [("b", i * 100, float(-i)) for i in range(50)]
    out = lttb(_pts(spark, rows), 20).collect()
    by = {}
    for r in out:
        by.setdefault(r["metric"], []).append(r)
    assert len(by["a"]) == 20 and len(by["b"]) == 20


def test_histogram_bins_and_clamping(spark):
    rows = [("m", 0, -5.0), ("m", 1, 0.0), ("m", 2, 31.9), ("m", 3, 32.0),
            ("m", 4, 999.0)]
    out = {
        r["bin"]: (r["bin_lo"], r["count"])
        for r in value_histogram(_pts(spark, rows), 0.0, 512.0, 16).collect()
    }
    assert out[0] == (0.0, 3)   # -5 clamps in; 0.0 and 31.9 inside
    assert out[1] == (32.0, 1)  # boundary value goes to its own bin
    assert out[15] == (480.0, 1)  # 999 clamps to the last bin


def test_histogram_validation(spark):
    df = _pts(spark, [("m", 0, 1.0)])
    with pytest.raises(ValueError):
        value_histogram(df, 0.0, 0.0, 4)
    with pytest.raises(ValueError):
        value_histogram(df, 0.0, 1.0, 0)


def test_histogram_quantile_within_bin_width_of_exact(spark):
    """The merged-histogram quantile is within one bin width of the true
    percentile, and merging slice partials equals one global histogram."""
    import numpy as np

    from rhq_metrics_spark.operators.downsample import (
        histogram_quantile,
        histogram_rollup,
    )

    rng = np.random.RandomState(21)
    vals = rng.uniform(0, 500, 4000)
    DAY = 86_400_000
    rows = [("m", int(i * (DAY / 4000)), float(v)) for i, v in enumerate(vals)]
    pts = _pts(spark, rows)
    hists = histogram_rollup(pts, slice_ms=2 * HOUR, lo=0.0, hi=512.0, n_bins=64)
    out = histogram_quantile(
        hists, grain_ms=DAY, q=0.95, lo=0.0, hi=512.0, n_bins=64
    ).collect()
    assert len(out) == 1
    got = out[0]
    assert got["total"] == 4000
    true_p95 = float(np.percentile(vals, 95))
    assert abs(got["qvalue"] - true_p95) <= 512.0 / 64  # one bin width


def test_histogram_quantile_merge_equals_global(spark):
    from rhq_metrics_spark.operators.downsample import (
        histogram_quantile,
        histogram_rollup,
    )

    rows = [("m", i * 60_000, float(i % 97)) for i in range(5000)]
    pts = _pts(spark, rows)
    DAY = 86_400_000
    fine = histogram_rollup(pts, slice_ms=HOUR, lo=0.0, hi=128.0, n_bins=32)
    coarse = histogram_rollup(pts, slice_ms=DAY, lo=0.0, hi=128.0, n_bins=32)
    q_fine = histogram_quantile(fine, DAY, 0.5, 0.0, 128.0, 32).collect()
    q_coarse = histogram_quantile(coarse, DAY, 0.5, 0.0, 128.0, 32).collect()
    kf = {(r["metric"], r["bucket_start"]): r["qvalue"] for r in q_fine}
    kc = {(r["metric"], r["bucket_start"]): r["qvalue"] for r in q_coarse}
    assert kf == kc  # merging partials == one global histogram


def test_histogram_quantile_validation(spark):
    from rhq_metrics_spark.operators.downsample import (
        histogram_quantile,
        histogram_rollup,
    )

    pts = _pts(spark, [("m", 0, 1.0)])
    h = histogram_rollup(pts, HOUR, 0.0, 10.0, 4)
    with pytest.raises(ValueError):
        histogram_quantile(h, HOUR, 0.0, 0.0, 10.0, 4)
    with pytest.raises(ValueError):
        histogram_rollup(pts, HOUR, 5.0, 5.0, 4)


def test_streaming_histogram_rollup_matches_batch(spark, tmp_path):
    """B13 streaming twin: finalized slices carry exactly the batch
    histogram partials (and feed histogram_quantile unchanged)."""
    import json
    import time

    import pyspark.sql.functions as F

    from rhq_metrics_spark.operators.downsample import histogram_rollup
    from rhq_metrics_spark.streaming.histogram import streaming_histogram_rollup

    src = tmp_path / "hist_in"
    src.mkdir()
    base = 1_700_000_000
    rows1 = [
        {"metric": "m", "sec": base + i * 60, "value": float((i * 37) % 500)}
        for i in range(40)
    ]
    rows2 = [{"metric": "m", "sec": base + 7200, "value": 1.0}]  # watermark push
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows1))

    stream = (
        spark.readStream.schema("metric string, sec long, value double")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
        .withColumn("event_time", F.timestamp_seconds("sec"))
    )
    batch = spark.createDataFrame(
        [(r["metric"], r["sec"] * 1000, r["value"]) for r in rows1],
        "metric string, ts long, value double",
    )
    want = {
        (r["metric"], r["slice_start"], r["bin"]): r["count"]
        for r in histogram_rollup(batch, 30 * 60_000, 0.0, 512.0, 16).collect()
    }

    out = streaming_histogram_rollup(
        stream, "30 minutes", 0.0, 512.0, 16, watermark_delay="5 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("hist_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "hist_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        time.sleep(3)
        (src / "b2.json").write_text("\n".join(json.dumps(r) for r in rows2))
        while (
            spark.sql("select * from hist_out").count() < len(want)
            and time.time() < deadline
        ):
            time.sleep(0.5)
    finally:
        q.stop()

    got = {
        (r["metric"], int(r["slice_start"].timestamp()) * 1000, r["bin"]): r["count"]
        for r in spark.sql("select * from hist_out").collect()
    }
    # every finalized slice (all of rows1's slices are finalized by the
    # watermark push) matches the batch partials exactly
    assert got == want


def test_streaming_histogram_sink_serves_percentiles(spark, tmp_path):
    """The full rank-statistics serving loop: points stream →
    start_histogram_rollup_stream parquet sink → attach_histogram_rollup
    → gauge_stats(percentile_impl='hist') — streaming-built partials
    serve percentiles within one bin width of exact, zero raw-point
    reads for the rank columns."""
    import json
    import time

    import pyspark.sql.functions as F

    from rhq_metrics_spark.model import Buckets
    from rhq_metrics_spark.service import MetricsService
    from rhq_metrics_spark.sources.store import MetricsStore
    from rhq_metrics_spark.streaming.histogram import (
        start_histogram_rollup_stream,
    )

    win_ms = 30 * 60_000
    base_s = 1_700_000_000
    base_ms = base_s * 1000
    rows = [
        {"tenant_id": "t", "metric": "m", "sec": base_s + i * 60,
         "value": float((i * 37) % 500)}
        for i in range(60)
    ]
    late = [{"tenant_id": "t", "metric": "m", "sec": base_s + 7200,
             "value": 1.0}]  # pushes the watermark past rows' slices

    src = tmp_path / "pts_in"
    src.mkdir()
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream
        .schema("tenant_id string, metric string, sec long, value double")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
        .withColumn("event_time", F.timestamp_seconds("sec"))
    )
    sink = str(tmp_path / "hist_sink")
    q = start_histogram_rollup_stream(
        stream, sink, str(tmp_path / "ckpt"), "30 minutes", 0.0, 512.0, 32,
        watermark_delay="5 seconds", trigger={"processingTime": "1 second"},
    )
    try:
        time.sleep(3)
        (src / "b2.json").write_text("\n".join(json.dumps(r) for r in late))
        deadline = time.time() + 90
        while time.time() < deadline:
            try:
                n = spark.read.parquet(sink).filter(
                    F.col("slice_start") < base_ms + 3_600_000).count()
            except Exception:  # noqa: BLE001 - sink not created yet
                n = 0
            if n > 0 and spark.read.parquet(sink).agg(
                    F.max("slice_start")).collect()[0][0] >= base_ms + win_ms:
                break
            time.sleep(0.5)
    finally:
        q.stop()

    store = MetricsStore(spark, str(tmp_path / "store"))
    store.add_data_points("gauge", spark.createDataFrame(
        [("t", "m", r["sec"] * 1000, r["value"], None) for r in rows],
        "tenant_id string, metric string, ts long, value double, "
        "tags map<string,string>"))
    svc = MetricsService(spark, store)
    svc.attach_histogram_rollup("gauge", sink, win_ms, 0.0, 512.0, 32)

    b = Buckets.from_step(base_ms, base_ms + 2 * win_ms, win_ms)
    hist = svc.gauge_stats("t", "m", b, percentiles=(90,),
                           percentile_impl="hist")
    exact = svc.gauge_stats("t", "m", b, percentiles=(90,))
    got = {r["start"]: r for r in hist.collect()}
    exp = {r["start"]: r for r in exact.collect()}
    assert set(got) == set(exp) and len(got) == 2
    bin_w = 512.0 / 32
    for k in exp:
        assert abs(got[k]["p90"] - exp[k]["p90"]) <= bin_w + 1e-9
        assert abs(got[k]["median"] - exp[k]["median"]) <= bin_w + 1e-9
