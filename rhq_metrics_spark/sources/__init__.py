from rhq_metrics_spark.sources.store import MetricsStore
from rhq_metrics_spark.sources.wire import (
    parse_wire,
    read_wire_jsonl,
    read_wire_stream,
    to_wire_json,
    wire_schema,
)

__all__ = [
    "MetricsStore",
    "parse_wire",
    "read_wire_jsonl",
    "read_wire_stream",
    "to_wire_json",
    "wire_schema",
]
