"""Wire error contract, mirroring the reference's REST error tests
(rest-tests-jaxrs ErrorsITest.groovy + BucketConfig.java validation):
each pinned HTTP behavior maps to a typed exception with the right
status and the ApiError body shape."""

import pytest

from rhq_metrics_spark.errors import (
    ApiError,
    BadRequest,
    MethodNotAllowed,
    NotAcceptable,
    NotFound,
    UnsupportedMediaType,
    api_errors,
    check_type_match,
    metric_type_from_path,
)


def test_api_error_body_shape():
    # ApiError.java:32-41 — {"errorMsg": ...} with "No details" fallback
    assert BadRequest("boom").as_json() == {"errorMsg": "boom"}
    assert BadRequest("").as_json() == {"errorMsg": "No details"}
    assert BadRequest("   ").as_json() == {"errorMsg": "No details"}


def test_statuses():
    # ErrorsITest: 400/404/405/406/415
    assert BadRequest.status == 400
    assert NotFound.status == 404
    assert MethodNotAllowed.status == 405
    assert NotAcceptable.status == 406
    assert UnsupportedMediaType.status == 415
    for cls in (BadRequest, NotFound, MethodNotAllowed):
        assert issubclass(cls, ApiError)
    # builtin-compatible: pre-existing except ValueError handlers keep
    # catching facade validation failures
    assert issubclass(BadRequest, ValueError)
    assert issubclass(NotFound, LookupError)


def test_unknown_metric_type_path_is_404():
    # testNotFoundException: GET /gaugesssss/test/raw -> 404
    assert metric_type_from_path("gauges") == "gauge"
    assert metric_type_from_path("availability") == "availability"
    with pytest.raises(NotFound) as ei:
        metric_type_from_path("gaugesssss")
    assert ei.value.status == 404


def test_metric_type_mismatch_is_400():
    # GaugeHandler.java:124 — payload type vs URL type
    check_type_match("gauge", "gauge")
    check_type_match("gauge", None)
    with pytest.raises(BadRequest) as ei:
        check_type_match("gauge", "counter")
    assert "Metric type does not match gauge" in ei.value.error_msg


def test_api_errors_context_wraps_model_validation():
    with pytest.raises(BadRequest):
        with api_errors():
            raise ValueError("bad param")
    with pytest.raises(NotFound):
        with api_errors():
            raise KeyError("nope")
    # already-typed errors pass through untouched
    with pytest.raises(UnsupportedMediaType):
        with api_errors():
            raise UnsupportedMediaType("nope")


class TestStatsParams:
    """service.stats_params: the BucketConfig + TimeRange contract at
    the facade boundary (no Spark needed — pure validation)."""

    @pytest.fixture()
    def svc(self):
        from rhq_metrics_spark.service import MetricsService

        return MetricsService(spark=None, store=None)

    NOW = 1_700_000_000_000

    def test_valid_count(self, svc):
        b = svc.stats_params(0, 600_000, buckets=10)
        assert b.count == 10 and b.step == 60_000

    def test_valid_duration_with_defaults(self, svc):
        # no range -> now-8h .. now (TimeRange.java:32)
        b = svc.stats_params(bucket_duration="1h", now_ms=self.NOW)
        assert b.count == 8
        assert b.end == self.NOW

    def test_both_params_is_400(self, svc):
        # BucketConfig.java:48-50
        with pytest.raises(BadRequest):
            svc.stats_params(0, 600_000, buckets=10, bucket_duration="1mn")

    def test_neither_param_is_400(self, svc):
        with pytest.raises(BadRequest):
            svc.stats_params(0, 600_000)

    def test_unparseable_buckets_is_400(self, svc):
        # testNumberFormatException: buckets=999999999999999999999999
        with pytest.raises(BadRequest):
            svc.stats_params(0, 600_000, buckets="not-a-number")
        with pytest.raises(BadRequest):
            svc.stats_params(0, 600_000, buckets=999999999999999999999999)

    def test_inverted_range_is_400(self, svc):
        with pytest.raises(BadRequest):
            svc.stats_params(600_000, 0, buckets=10)

    def test_bad_duration_is_400(self, svc):
        with pytest.raises(BadRequest):
            svc.stats_params(0, 600_000, bucket_duration="7parsecs")


def test_oversized_string_write_is_400(spark, tmp_path):
    from rhq_metrics_spark.service import MetricsService
    from rhq_metrics_spark.sources.store import MetricsStore

    svc = MetricsService(spark, MetricsStore(spark, str(tmp_path / "s")))
    df = spark.createDataFrame(
        [("t", "m", 1, "x" * 100, None)],
        "tenant_id string, metric string, ts long, value string, tags map<string,string>",
    )
    with pytest.raises(BadRequest) as ei:
        svc.add_data_points("string", df, max_string_size=10)
    assert ei.value.status == 400


def test_gauge_stats_query_handler_shape(spark, tmp_path):
    """The handler-shaped call validates, then produces the same result
    as the Buckets-typed API."""
    from rhq_metrics_spark.model import Buckets
    from rhq_metrics_spark.service import MetricsService
    from rhq_metrics_spark.sources.store import MetricsStore

    svc = MetricsService(spark, MetricsStore(spark, str(tmp_path / "s")))
    df = spark.createDataFrame(
        [("t", "m", i * 60_000, float(i), None) for i in range(10)],
        "tenant_id string, metric string, ts long, value double, tags map<string,string>",
    )
    svc.add_data_points("gauge", df)
    via_query = svc.gauge_stats_query(
        "t", "m", start=0, end=600_000, buckets=5
    ).collect()
    direct = svc.gauge_stats(
        "t", "m", Buckets.from_count(0, 600_000, 5)
    ).collect()
    assert via_query == direct
    with pytest.raises(BadRequest):
        svc.gauge_stats_query("t", "m", start=0, end=600_000)
