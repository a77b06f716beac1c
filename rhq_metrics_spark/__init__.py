"""rhq_metrics_spark — a PySpark-native time-series analytics engine.

Re-provides the query and data-processing capabilities of
rhq-project/rhq-metrics (Hawkular Metrics) — multi-tenant typed metrics
with tags, time-range scans, rate derivation, bucketed statistical
downsampling, availability analysis, condition periods, a boolean
tag-query language, and a layered hot/cold storage lifecycle — as
idiomatic Spark DataFrame / SQL / Structured Streaming plans, plus the
large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal columns) such an engine needs at 100 TB.

Design blueprint: SURVEY.md (with file:line citations into the
reference at /root/reference).
"""

from rhq_metrics_spark.maintenance import MaintenanceRunner
from rhq_metrics_spark.model import (
    AvailabilityType,
    Buckets,
    MetricType,
    TimeRange,
)
from rhq_metrics_spark.session import get_spark

__all__ = [
    "AvailabilityType",
    "Buckets",
    "MaintenanceRunner",
    "MetricType",
    "TimeRange",
    "get_spark",
]

__version__ = "0.1.0"
