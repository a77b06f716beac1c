from __future__ import annotations

import pytest

from rhq_metrics_spark.model import (
    AVAILABILITY_SCHEMA,
    COUNTER_SCHEMA,
    GAUGE_SCHEMA,
    STRING_SCHEMA,
)
from rhq_metrics_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="rhq-metrics-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s


def _points(spark, schema, rows):
    """rows: (tenant, metric, ts, value[, tags])"""
    full = [tuple(r) + (None,) * (5 - len(r)) for r in rows]
    return spark.createDataFrame(full, schema)


@pytest.fixture(scope="session")
def gauge_points_factory(spark):
    return lambda rows: _points(spark, GAUGE_SCHEMA, rows)


@pytest.fixture(scope="session")
def counter_points_factory(spark):
    return lambda rows: _points(spark, COUNTER_SCHEMA, rows)


@pytest.fixture(scope="session")
def availability_points_factory(spark):
    return lambda rows: _points(spark, AVAILABILITY_SCHEMA, rows)


@pytest.fixture(scope="session")
def string_points_factory(spark):
    return lambda rows: _points(spark, STRING_SCHEMA, rows)
