"""Streaming W1: per-minute rate derivation over a live point stream.

The batch operator (``operators/rate.py``) pairs adjacent points with a
``lag`` window; a stream can't see the previous micro-batch's last
point, so this keeps per-series state — the last seen ``(ts, value)`` —
via ``applyInPandasWithState`` and emits one rate row per consecutive
pair as points arrive, with the same semantics as the batch path
(MetricsServiceImpl.java:857-883):

- ``rate = 60_000 * (v2 - v1) / (t2 - t1)``, stamped at ``t2``;
- counter pairs whose value decreased (reset) are dropped, but the
  reset point still becomes the new baseline — exactly what the batch
  ``filter`` over lag pairs produces;
- rows at-or-before the stored last-ts are ignored (late data: the
  batch path over the store owns history rewrites, B4).

State is one (long, double) per series — O(#series), independent of
throughput.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from rhq_metrics_spark.model import MetricType

RATE_OUTPUT_SCHEMA = StructType(
    [
        StructField("tenant_id", StringType(), False),
        StructField("metric", StringType(), False),
        StructField("ts", LongType(), False),
        StructField("rate", DoubleType(), True),
    ]
)

RATE_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType(), True),
        StructField("last_value", DoubleType(), True),
    ]
)


def _make_rate_fn(counter: bool):
    def _rate_group(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        tenant_id, metric = key
        if state.exists:
            last_ts, last_value = state.get
        else:
            last_ts, last_value = None, None

        out_ts: list[int] = []
        out_rate: list[float] = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for ts, value in zip(pdf["ts"], pdf["value"]):
                ts, value = int(ts), float(value)
                if last_ts is not None and ts <= last_ts:
                    # Late/replayed — batch path owns history.  Unlike the
                    # other streaming twins, EQUAL-ts points stay out of
                    # contract here by design: the rate delta/(ts-last_ts)
                    # is undefined at zero elapsed time (the batch lag
                    # path would divide by zero too).
                    continue
                if last_ts is not None:
                    if not (counter and value < last_value):
                        out_ts.append(ts)
                        out_rate.append(
                            60_000.0 * (value - last_value) / float(ts - last_ts)
                        )
                last_ts, last_value = ts, value

        state.update((last_ts, last_value))
        if out_ts:
            yield pd.DataFrame(
                {
                    "tenant_id": tenant_id,
                    "metric": metric,
                    "ts": out_ts,
                    "rate": out_rate,
                }
            )

    return _rate_group


def streaming_rate(
    stream_df: DataFrame, metric_type: str = MetricType.GAUGE
) -> DataFrame:
    """Input: streaming frame with ``(tenant_id, metric, ts, value)``.
    Output stream: ``(tenant_id, metric, ts, rate)`` — one row per
    consecutive pair, identical values to the batch ``rate()`` over the
    same points."""
    if metric_type not in (MetricType.GAUGE, MetricType.COUNTER):
        raise ValueError(f"unsupported metric type for rate: {metric_type}")
    return stream_df.groupBy("tenant_id", "metric").applyInPandasWithState(
        _make_rate_fn(metric_type == MetricType.COUNTER),
        outputStructType=RATE_OUTPUT_SCHEMA,
        stateStructType=RATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
