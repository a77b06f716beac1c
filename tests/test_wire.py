from __future__ import annotations

import json

import pyspark.sql.functions as F

from rhq_metrics_spark.sources.wire import (
    parse_wire,
    read_wire_jsonl,
    to_wire_json,
)


def _lines(spark, payloads):
    return spark.createDataFrame([(p,) for p in payloads], "value string")


GOOD = json.dumps(
    {
        "id": "cpu.load",
        "tenantId": "acme",
        "tags": {"dc": "us"},
        "data": [
            {"timestamp": 1000, "value": 1.5},
            {"timestamp": 2000, "value": 2.5, "tags": {"dc": "eu"}},
        ],
    }
)


def test_parse_points_and_tag_precedence(spark):
    good, bad = parse_wire(_lines(spark, [GOOD]), "gauge")
    rows = {r["ts"]: r for r in good.collect()}
    assert bad.count() == 0
    assert rows[1000]["tenant_id"] == "acme"
    assert rows[1000]["metric"] == "cpu.load"
    assert rows[1000]["value"] == 1.5
    # metric-level tags fill in when the point has none...
    assert rows[1000]["tags"] == {"dc": "us"}
    # ...but point-level tags win (DataPoint.java:59)
    assert rows[2000]["tags"] == {"dc": "eu"}


def test_rejects_routed_not_dropped(spark):
    payloads = [
        GOOD,
        "{not json at all",
        json.dumps({"tags": {}, "data": [{"timestamp": 1, "value": 2.0}]}),
        json.dumps({"id": "no.data"}),
    ]
    good, bad = parse_wire(_lines(spark, payloads), "gauge")
    assert good.count() == 2
    reasons = {r["reason"] for r in bad.collect()}
    assert reasons == {"malformed_json", "missing_id", "missing_data"}
    # raw payloads preserved for the dead-letter sink
    assert all(r["_raw"] for r in bad.collect())


def test_default_tenant_and_counter_type(spark):
    p = json.dumps({"id": "reqs", "data": [{"timestamp": 5, "value": 7}]})
    good, _ = parse_wire(_lines(spark, [p]), "counter", default_tenant="t0")
    row = good.collect()[0]
    assert row["tenant_id"] == "t0"
    assert row["value"] == 7 and isinstance(row["value"], int)


def test_availability_values_stay_strings(spark):
    p = json.dumps({"id": "web", "data": [{"timestamp": 5, "value": "up"}]})
    good, _ = parse_wire(_lines(spark, [p]), "availability")
    assert good.collect()[0]["value"] == "up"


def test_roundtrip_through_wire_json(spark):
    good, _ = parse_wire(_lines(spark, [GOOD]), "gauge")
    wire = to_wire_json(good, data_retention=7)
    line = json.loads(wire.collect()[0]["json"])
    assert line["id"] == "cpu.load"
    assert line["tenantId"] == "acme"
    assert line["dataRetention"] == 7
    # DESC time order like the reference's raw reads
    assert [d["timestamp"] for d in line["data"]] == [2000, 1000]
    good2, bad2 = parse_wire(
        wire.select(F.col("json").alias("value")), "gauge"
    )
    assert bad2.count() == 0
    a = {(r["ts"], r["value"]) for r in good.collect()}
    b = {(r["ts"], r["value"]) for r in good2.collect()}
    assert a == b


def test_read_jsonl_batch(spark, tmp_path):
    f = tmp_path / "in.jsonl"
    f.write_text(GOOD + "\n" + "{broken\n")
    good, bad = read_wire_jsonl(spark, str(f), "gauge")
    assert good.count() == 2
    assert bad.count() == 1


def test_parse_is_all_jvm(spark):
    good, _ = parse_wire(_lines(spark, [GOOD]), "gauge")
    plan = good._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_wire_stream_feeds_store_ingest(spark, tmp_path):
    """End-to-end REST-shaped continuous ingest: wire JSONL landing dir →
    parse_wire stream → start_ingest_stream → store hot layer →
    service query. The full reference write path, streaming."""
    import json as _json
    import time

    from rhq_metrics_spark.model import Buckets
    from rhq_metrics_spark.service import MetricsService
    from rhq_metrics_spark.sources import MetricsStore, read_wire_stream
    from rhq_metrics_spark.streaming.ingest import start_ingest_stream

    landing = tmp_path / "landing"
    landing.mkdir()
    T = 1_700_000_000_000
    payload = {
        "id": "cpu", "tenantId": "acme",
        "data": [{"timestamp": T + i * 1000, "value": float(i)} for i in range(40)],
    }
    (landing / "b1.jsonl").write_text(_json.dumps(payload))

    store = MetricsStore(spark, str(tmp_path / "store"))
    points, _rejects = read_wire_stream(spark, str(landing), "gauge")
    q = start_ingest_stream(
        points, store, "gauge", str(tmp_path / "ckpt"),
        trigger={"processingTime": "1 second"},
    )
    try:
        svc = MetricsService(spark, store)
        deadline = time.time() + 90
        count = 0
        while count < 40 and time.time() < deadline:
            try:
                count = svc.find_data_points("gauge", "acme", "cpu", 0, 2**62).count()
            except Exception:
                count = 0
            time.sleep(0.5)
    finally:
        q.stop()
    assert count == 40
    stats = svc.gauge_stats("acme", "cpu", Buckets.from_count(T, T + 40_000, 4))
    rows = stats.collect()
    assert len(rows) == 4 and all(r["samples"] == 10 for r in rows)
