"""REST wire-format (de)serialization for metric payloads.

The reference ingests ``POST /{type}s/raw`` bodies shaped
``[{"id", "tags", "dataRetention", "data": [{"timestamp", "value",
"tags"}], "tenantId"}]`` (Metric.java:48-72, DataPoint.java:37-60) and
emits the same shape from ``GET .../raw``.  This module is the Spark
twin: JSON lines → canonical point rows and back, entirely with
``from_json`` / ``to_json`` + explode — no Python in the parse path, so
wire decode runs inside codegen and scales with the scan.

Malformed records are never silently dropped: parsing is PERMISSIVE
with a corrupt-record column, and :func:`parse_wire` splits good rows
from rejects so the caller can route rejects to a dead-letter sink
(the reference returns a 400 per bad request; a pipeline wants the bad
*rows* preserved instead).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from rhq_metrics_spark.model import MetricType

_VALUE_TYPES = {
    MetricType.GAUGE: T.DoubleType(),
    MetricType.COUNTER: T.LongType(),
    MetricType.AVAILABILITY: T.StringType(),
    MetricType.STRING: T.StringType(),
}

_TAGS = T.MapType(T.StringType(), T.StringType())


def wire_schema(metric_type: str) -> T.StructType:
    """Schema of ONE wire metric object (one JSON line = one metric)."""
    value_type = _VALUE_TYPES[metric_type]
    return T.StructType(
        [
            # PERMISSIVE from_json yields an all-null struct (not a null
            # struct) on bad input; the corrupt-record column is the only
            # reliable malformed-vs-missing-field signal
            T.StructField("_corrupt_record", T.StringType()),
            T.StructField("id", T.StringType()),
            T.StructField("tags", _TAGS),
            T.StructField("dataRetention", T.IntegerType()),
            T.StructField("tenantId", T.StringType()),
            T.StructField(
                "data",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("timestamp", T.LongType()),
                            T.StructField("value", value_type),
                            T.StructField("tags", _TAGS),
                        ]
                    )
                ),
            ),
        ]
    )


def parse_wire(
    lines: DataFrame,
    metric_type: str,
    default_tenant: str = "",
    json_col: str = "value",
) -> tuple[DataFrame, DataFrame]:
    """JSON-line frame → ``(points, rejects)``.

    ``points`` has the canonical ``(tenant_id, metric, ts, value, tags)``
    schema (point-level tags win over metric-level, DataPoint.java:59);
    ``rejects`` carries the raw line + a reason for every RECORD that
    failed to parse or lacked required fields (id, data) — ingest-side
    validation the reference does in ApiUtils.badRequest.  Individual
    data points with a null timestamp inside an otherwise-valid record
    are dropped (the reference 400s the whole request,
    DataPoint.java:52; a pipeline keeps the valid siblings).
    """
    parsed = lines.select(
        F.col(json_col).alias("_raw"),
        F.from_json(
            F.col(json_col), wire_schema(metric_type),
            {"mode": "PERMISSIVE",
             "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("m"),
    )
    ok = (
        F.col("m._corrupt_record").isNull()
        & F.col("m.id").isNotNull()
        & F.col("m.data").isNotNull()
    )
    bad = parsed.filter(~ok).select(
        "_raw",
        F.when(F.col("m._corrupt_record").isNotNull(), "malformed_json")
        .when(F.col("m.id").isNull(), "missing_id")
        .otherwise("missing_data")
        .alias("reason"),
    )
    good = (
        parsed.filter(ok)
        .select(
            F.coalesce(F.col("m.tenantId"), F.lit(default_tenant)).alias(
                "tenant_id"
            ),
            F.col("m.id").alias("metric"),
            F.col("m.tags").alias("_mtags"),
            F.explode("m.data").alias("p"),
        )
        .filter(F.col("p.timestamp").isNotNull())
        .select(
            "tenant_id",
            "metric",
            F.col("p.timestamp").alias("ts"),
            F.col("p.value").alias("value"),
            F.coalesce(F.col("p.tags"), F.col("_mtags")).alias("tags"),
        )
    )
    return good, bad


def read_wire_jsonl(
    spark: SparkSession,
    path: str,
    metric_type: str,
    default_tenant: str = "",
) -> tuple[DataFrame, DataFrame]:
    """Batch-read a JSON-lines file/directory of wire metrics."""
    return parse_wire(
        spark.read.text(path), metric_type, default_tenant, json_col="value"
    )


def read_wire_stream(
    spark: SparkSession,
    path: str,
    metric_type: str,
    default_tenant: str = "",
) -> tuple[DataFrame, DataFrame]:
    """Streaming twin (S9: continuous ingest from a landing directory).
    Returns streaming (points, rejects) frames; pair with
    ``streaming/ingest.py`` sinks."""
    lines = spark.readStream.format("text").load(path)
    return parse_wire(lines, metric_type, default_tenant, json_col="value")


def to_wire_json(points: DataFrame, data_retention: int | None = None) -> DataFrame:
    """Points → one JSON wire line per (tenant, metric): the GET
    .../raw response shape.  ``sort_array`` of (ts, ...) structs gives
    deterministic descending-time data arrays like the reference's
    DESC reads — done with array functions after ONE groupBy, not a
    window sort."""
    grouped = points.groupBy("tenant_id", "metric").agg(
        # array_sort with an explicit ts comparator: sort_array can't
        # order structs that contain maps (the tags field)
        F.array_sort(
            F.collect_list(F.struct("ts", "value", "tags")),
            lambda l, r: F.when(l["ts"] < r["ts"], 1)
            .when(l["ts"] > r["ts"], -1)
            .otherwise(0),
        ).alias("_pts")
    )
    data = F.transform(
        "_pts",
        lambda p: F.struct(
            p["ts"].alias("timestamp"),
            p["value"].alias("value"),
            p["tags"].alias("tags"),
        ),
    )
    wire = grouped.select(
        F.to_json(
            F.struct(
                F.col("metric").alias("id"),
                F.col("tenant_id").alias("tenantId"),
                F.lit(data_retention).cast("int").alias("dataRetention"),
                data.alias("data"),
            ),
            {"ignoreNullFields": "true"},
        ).alias("json")
    )
    return wire
