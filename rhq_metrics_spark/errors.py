"""REST error contract as typed exceptions — the behaviors the
reference's REST tests pin (rest-tests-jaxrs ErrorsITest.groovy), so an
HTTP wrapper over :class:`~rhq_metrics_spark.service.MetricsService` is
a mechanical ``except ApiError as e: respond(e.status, e.as_json())``.

Mapping to the reference:

- response body shape ``{"errorMsg": ...}`` with the ``"No details"``
  fallback — model/ApiError.java:32-41
- 400 Bad Request — parameter validation: buckets XOR bucketDuration
  (param/BucketConfig.java:36-72), invalid/unparseable time ranges and
  bucket counts (ErrorsITest.testNumberFormatException), payload/URL
  metric-type mismatch (handler/GaugeHandler.java:124), oversized
  string values (MetricsServiceImpl.java:196,330-334)
- 404 Not Found — unknown metric-type path segment
  (ErrorsITest.testNotFoundException: ``gaugesssss``)
- 405/406/415 — method / content negotiation
  (testNotAllowedException, testNotAcceptableException,
  testNotSupportedException): these are transport-level; the types
  exist here with their statuses so a wrapper raises them, but the
  facade itself never does.

``BadRequest`` subclasses ``ValueError`` and ``NotFound`` subclasses
``LookupError`` so pre-existing callers catching the builtin types keep
working.
"""

from __future__ import annotations

import contextlib

from rhq_metrics_spark.model import MetricType


class ApiError(Exception):
    """Base of the wire-mappable errors; ``status`` is the HTTP code
    and :meth:`as_json` the response body."""

    status = 500

    @property
    def error_msg(self) -> str:
        msg = str(self)
        # ApiError.java:35 — blank messages become "No details"
        return msg if msg.strip() else "No details"

    def as_json(self) -> dict:
        return {"errorMsg": self.error_msg}


class BadRequest(ApiError, ValueError):
    status = 400


class NotFound(ApiError, LookupError):
    status = 404


class MethodNotAllowed(ApiError):
    status = 405


class NotAcceptable(ApiError):
    status = 406


class UnsupportedMediaType(ApiError):
    status = 415


#: URL path segment → metric type (the reference's @Path roots:
#: GaugeHandler "/gauges", CounterHandler "/counters", ...)
PATH_TYPES = {
    "gauges": MetricType.GAUGE,
    "counters": MetricType.COUNTER,
    "availability": MetricType.AVAILABILITY,
    "strings": MetricType.STRING,
}


def metric_type_from_path(segment: str) -> str:
    """Resolve a URL path segment to a metric type; unknown segments are
    404 (ErrorsITest.testNotFoundException: ``GET /gaugesssss/...``)."""
    try:
        return PATH_TYPES[segment]
    except KeyError:
        raise NotFound(f"unknown metric type path: {segment!r}") from None


def check_type_match(url_type: str, body_type: str | None) -> None:
    """Payload type must match the URL's handler type — the reference
    400s with "Metric type does not match <type>"
    (GaugeHandler.java:124)."""
    if body_type is not None and body_type != url_type:
        raise BadRequest(f"Metric type does not match {url_type}")


@contextlib.contextmanager
def api_errors():
    """Convert the model layer's plain ``ValueError``/``KeyError``
    validation failures into their wire-typed equivalents."""
    try:
        yield
    except ApiError:
        raise
    except (ValueError, TypeError) as e:
        raise BadRequest(str(e)) from e
    except (KeyError, LookupError) as e:
        raise NotFound(str(e)) from e
